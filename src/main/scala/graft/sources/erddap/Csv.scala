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

  /** Quote a cell iff it needs it (comma, quote, CR/LF), doubling quotes. */
  def quote(cell: String): String =
    if (cell.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + cell.replace("\"", "\"\"") + "\""
    else cell

  def join(cells: Seq[String]): String = cells.map(quote).mkString(",")
}
