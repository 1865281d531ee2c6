package graft.io

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory

import org.w3c.dom.{Document, Element}

/** Minimal XLSX (OOXML SpreadsheetML) reader — JDK only (`java.util.zip` +
  * DOM): an .xlsx file is a ZIP of XML parts, so no spreadsheet library is
  * needed for the codelist shapes the reference ingests
  * (`2_data_importing_cleaning.R:208-268` reads one single-sheet workbook
  * per exclusion criterion and takes its first column;
  * `4_hypertension_phenotype_main.R:50-54` reads a multi-sheet workbook and
  * flattens all sheets' columns into one named list).
  *
  * Supported: shared strings (with rich-text runs), inline strings, numeric
  * cells, sparse rows/cells (A1 references resolve true column positions),
  * multiple sheets in workbook order. Not supported (not needed for
  * codelists): formulas, date styling, merged cells.
  */
object Xlsx {

  /** One worksheet: `header` is row 1 in column order; `rows` maps header
    * name → cell text for each subsequent row (missing cells absent). */
  final case class Sheet(name: String, header: Seq[String], rows: Seq[Map[String, String]]) {
    /** A column's non-empty values in row order. */
    def column(h: String): Seq[String] = rows.flatMap(_.get(h))
    /** First column's values — the reference's `import(...)[[1]]`. */
    def firstColumn: Seq[String] = header.headOption.map(column).getOrElse(Nil)
  }

  /** All sheets, in workbook order. */
  def read(path: String): Seq[Sheet] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml")).map { _ =>
        val doc = parse(zip, "xl/sharedStrings.xml")
        elems(doc.getDocumentElement, "si")
          .map(si => elems(si, "t").map(_.getTextContent).mkString).toIndexedSeq
      }.getOrElse(IndexedSeq.empty)

      // workbook.xml lists sheets (name + r:id) in order; the rels part
      // maps r:id -> worksheet XML path
      val wb = parse(zip, "xl/workbook.xml")
      val rels = parse(zip, "xl/_rels/workbook.xml.rels")
      val relTarget = elems(rels.getDocumentElement, "Relationship")
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap
      elems(wb.getDocumentElement, "sheet").map { s =>
        val name = s.getAttribute("name")
        val rid = {
          val ns = s.getAttributeNS(
            "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id")
          if (ns.nonEmpty) ns else s.getAttribute("r:id")
        }
        val target = relTarget.getOrElse(rid, throw new IllegalArgumentException(
            s"xlsx '$path': sheet '$name' references relationship '$rid' " +
              "missing from xl/_rels/workbook.xml.rels — workbook is malformed"))
          .stripPrefix("/xl/").stripPrefix("./")
        readSheet(name, parse(zip, s"xl/$target"), shared)
      }
    } finally zip.close()
  }

  /** `purrr::flatten(import_list(path))` semantics: every sheet's columns
    * in one name → values map; on duplicate column names the FIRST sheet's
    * column wins (R's `$` selects the first match). */
  def flattenColumns(path: String): Map[String, Seq[String]] =
    read(path).foldLeft(Map.empty[String, Seq[String]]) { (acc, sheet) =>
      sheet.header.foldLeft(acc)((m, h) =>
        if (m.contains(h)) m else m + (h -> sheet.column(h)))
    }

  /** `import(path)[[1]]` semantics: first sheet, first column. */
  def firstColumn(path: String): Seq[String] =
    read(path).headOption.map(_.firstColumn).getOrElse(Nil)

  /** Parse a cell text as a code id; tolerates Excel's numeric formatting
    * (e.g. "45211234", "4.5211234E7", "914.0"). */
  def toCode(s: String): Long = new java.math.BigDecimal(s.trim).longValueExact()

  private def readSheet(name: String, doc: Document, shared: IndexedSeq[String]): Sheet = {
    // cells as (row, col, text); A1-style refs give true sparse positions.
    // Both the row and cell "r" attributes are OPTIONAL per OOXML (some
    // writers omit them; position is then implied sequentially), so fall
    // back to running counters when absent.
    var rowCounter = 0
    val cells = elems(doc.getDocumentElement, "row").flatMap { row =>
      val rAttr = row.getAttribute("r")
      rowCounter = if (rAttr.nonEmpty) rAttr.toInt else rowCounter + 1
      val rowIdx = rowCounter
      var colCounter = -1
      elems(row, "c").flatMap { c =>
        val ref = c.getAttribute("r") // e.g. "BC12"
        val colLetters = ref.takeWhile(_.isLetter)
        colCounter =
          if (colLetters.nonEmpty)
            colLetters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
          else colCounter + 1
        val col = colCounter
        val text = c.getAttribute("t") match {
          case "s" => elems(c, "v").headOption.map(v => shared(v.getTextContent.trim.toInt))
          case "inlineStr" => Some(elems(c, "t").map(_.getTextContent).mkString)
          case _ => elems(c, "v").headOption.map(_.getTextContent)
        }
        text.filter(_.nonEmpty).map(t => (rowIdx, col, t))
      }
    }
    if (cells.isEmpty) Sheet(name, Nil, Nil)
    else {
      val headerRow = cells.map(_._1).min
      val header = cells.filter(_._1 == headerRow).sortBy(_._2).map(_._3)
      val byCol = cells.filter(_._1 == headerRow).sortBy(_._2)
        .map(_._2).zip(header).toMap
      val rows = cells.filter(_._1 > headerRow).groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, rc) =>
          rc.flatMap { case (_, col, t) => byCol.get(col).map(_ -> t) }.toMap
        }
      Sheet(name, header, rows)
    }
  }

  private def parse(zip: ZipFile, entry: String): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    val in = zip.getInputStream(zip.getEntry(entry))
    try f.newDocumentBuilder().parse(in) finally in.close()
  }

  private def elems(root: Element, local: String): Seq[Element] = {
    val nl = root.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }
}
