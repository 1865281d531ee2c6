package graft.io

/** The one JSON string-escape used by every artifact writer (Verify's
  * oracle dump, Bench's bench.json, IndexStore's meta files, DumpOne):
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL would otherwise make a consumer's json.load fail.
  * One implementation so an escaping fix can never land in one artifact
  * and miss another. */
object Jsons {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
