package graft.sources.erddap

/** Minimal RFC-4180 CSV line codec for the ERDDAP transport path.
  *
  * Real ERDDAP `csvp` responses quote string fields that contain commas
  * (station names, comments), so a naive `split(",")` misaligns cells.
  * Both the transport fake ([[LocalErddapServer]]) and the connector's
  * partition reader ([[ErddapPartitionReader]]) go through this codec.
  */
object Csv {

  /** Split one CSV line into cells, honoring double-quoted fields with
    * embedded commas and `""` escapes. Trailing empty cells are kept. */
  def split(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.setLength(0)
        case other => sb.append(other)
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  /** Split raw CSV text into LOGICAL records: a newline inside a quoted
    * cell is cell CONTENT (the classic line-based-reader bug — RFC 4180
    * §2.6 allows CR/LF in quoted fields), while `\n` or `\r\n` outside
    * quotes terminates a record. Record text is kept VERBATIM (quotes,
    * `""` escapes, embedded CR/LF untouched) so [[split]] parses each
    * record exactly as if the file had been consumed in one piece — no
    * buffer/line boundary can land inside a cell. A trailing terminator
    * does not produce a final empty record (file semantics: `"a\n"` is
    * one record); interior empty lines DO (an all-empty row). */
  def recordLines(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    var inQ = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        sb.append(c)
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            sb.append('"'); i += 1
          } else inQ = false
        }
      } else c match {
        case '"' => sb.append(c); inQ = true
        case '\r' if i + 1 < text.length && text.charAt(i + 1) == '\n' =>
          out += sb.toString; sb.setLength(0); i += 1
        case '\n' => out += sb.toString; sb.setLength(0)
        case other => sb.append(other)
      }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toSeq
  }

  /** Quote a cell iff it needs it (comma, quote, CR/LF), doubling quotes. */
  def quote(cell: String): String =
    if (cell.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + cell.replace("\"", "\"\"") + "\""
    else cell

  def join(cells: Seq[String]): String = cells.map(quote).mkString(",")
}
