package graft.io

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxSpec extends SparkSpec {

  private val mainNs = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val pkgRelNs = "http://schemas.openxmlformats.org/package/2006/relationships"

  /** Write a minimal real .xlsx: a ZIP of SpreadsheetML parts shaped like
    * Excel's own output (default namespaces, r:id indirection, shared
    * strings). */
  private def writeXlsx(path: String, sheets: Seq[(String, String)],
                        sharedStrings: Seq[String]): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook xmlns="$mainNs" xmlns:r="$relNs">
         |<sheets>$sheetTags</sheets></workbook>""".stripMargin)
    val relTags = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="$relNs/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="$pkgRelNs">$relTags</Relationships>""")
    if (sharedStrings.nonEmpty)
      put("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst xmlns="$mainNs">${sharedStrings.mkString}</sst>""")
    sheets.zipWithIndex.foreach { case ((_, rowsXml), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="$mainNs"><sheetData>$rowsXml</sheetData></worksheet>""")
    }
    zos.close()
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("xlsx").resolve(name).toString

  test("single-sheet workbook: first column with Excel numeric quirks") {
    val p = tmp("preg_condition.xlsx")
    writeXlsx(p, Seq("Sheet1" ->
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>914</v></c><c r="B2" t="inlineStr"><is><t>note</t></is></c></row>
        |<row r="3"><c r="A3"><v>4.5211234E7</v></c></row>
        |<row r="4"><c r="A4"><v>77.0</v></c></row>""".stripMargin),
      // rich-text run in a shared string: "concept" + "_id"
      Seq("<si><r><t>concept</t></r><r><t>_id</t></r></si>", "<si><t>label</t></si>"))
    val sheet = Xlsx.read(p).head
    assert(sheet.header === Seq("concept_id", "label"))
    assert(Xlsx.firstColumn(p).map(Xlsx.toCode) === Seq(914L, 45211234L, 77L))
  }

  test("multi-sheet flatten: all sheets' columns, first sheet wins duplicates") {
    val p = tmp("code_lists.xlsx")
    writeXlsx(p, Seq(
      "dx" ->
        """<row r="1"><c r="A1" t="s"><v>0</v></c></row>
          |<row r="2"><c r="A2"><v>111</v></c></row>
          |<row r="3"><c r="A3"><v>222</v></c></row>""".stripMargin,
      "rx" ->
        """<row r="1"><c r="A1" t="s"><v>1</v></c><c r="B1" t="s"><v>0</v></c></row>
          |<row r="2"><c r="A2"><v>555</v></c><c r="B2"><v>999</v></c></row>""".stripMargin),
      Seq("<si><t>dx_code</t></si>", "<si><t>rx_code</t></si>"))
    val flat = Xlsx.flattenColumns(p)
    assert(flat("dx_code").map(Xlsx.toCode) === Seq(111L, 222L),
      "duplicate dx_code on the rx sheet must not shadow the first sheet's")
    assert(flat("rx_code").map(Xlsx.toCode) === Seq(555L))
  }

  test("sparse cells resolve true column positions via A1 refs") {
    val p = tmp("sparse.xlsx")
    writeXlsx(p, Seq("s" ->
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="C2"><v>42</v></c></row>
        |<row r="3"><c r="A3"><v>7</v></c><c r="C3"><v>43</v></c></row>""".stripMargin),
      Seq("<si><t>a</t></si>", "<si><t>c</t></si>"))
    val s = Xlsx.read(p).head
    assert(s.header === Seq("a", "c"))
    assert(s.column("c") === Seq("42", "43"))
    assert(s.column("a") === Seq("7"), "the row-2 gap must not shift column a")
  }

  test("cells and rows without r attributes fall back to sequential positions") {
    val p = tmp("no_refs.xlsx")
    writeXlsx(p, Seq("s" ->
      """<row><c t="s"><v>0</v></c><c t="s"><v>1</v></c></row>
        |<row><c><v>5</v></c><c><v>6</v></c></row>
        |<row><c><v>7</v></c><c><v>8</v></c></row>""".stripMargin),
      Seq("<si><t>a</t></si>", "<si><t>b</t></si>"))
    val s = Xlsx.read(p).head
    assert(s.header === Seq("a", "b"))
    assert(s.column("a") === Seq("5", "7"))
    assert(s.column("b") === Seq("6", "8"))
  }

  test("loadCodelists: xlsx beats csv per list; combined workbook feeds dx/rx") {
    val dir = java.nio.file.Files.createTempDirectory("codelists").toString
    val names = Seq("preg_condition", "preg_measurement", "preg_observation",
      "preg_procedure", "esrd_condition", "esrd_observation", "esrd_procedure",
      "palliative_observation", "palliative_procedure",
      "hospice_observation", "hospice_procedure", "htn_dx", "htn_rx")
    names.zipWithIndex.foreach { case (n, i) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/$n.csv"), s"concept_id\n${1000 + i}\n")
    }
    // xlsx overrides the csv for one list
    writeXlsx(s"$dir/esrd_condition.xlsx", Seq("Sheet1" ->
      """<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2"><v>31337</v></c></row>""".stripMargin),
      Seq("<si><t>concept_id</t></si>"))
    // the combined workbook overrides htn_dx/htn_rx csvs
    writeXlsx(s"$dir/code_lists.xlsx", Seq(
      "dx" ->
        """<row r="1"><c r="A1" t="s"><v>0</v></c></row>
          |<row r="2"><c r="A2"><v>4001</v></c></row>""".stripMargin,
      "rx" ->
        """<row r="1"><c r="A1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2"><v>5001</v></c></row>""".stripMargin),
      Seq("<si><t>dx_code</t></si>", "<si><t>rx_code</t></si>"))
    val codes = graft.htn.HtnMain.loadCodelists(spark, dir)
    assert(codes.esrdCondition === Seq(31337L))
    assert(codes.pregCondition === Seq(1000L)) // csv fallback intact
    assert(codes.htnDx === Seq(4001L))
    assert(codes.htnRx === Seq(5001L))
  }
}
