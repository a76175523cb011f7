package graft.sources.erddap

import java.net.URLDecoder
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Transport fake standing in for an ERDDAP server (the live HTTP
  * surface is out of reach). It executes the SAME request-URL grammar
  * the reference compiles (`data_wrangler.py:360-387`): projection as a
  * `%2C` attribute list, time predicates `time>=startZ` / `time<=endZ`.
  *
  * Backing store: one headered CSV per dataset at
  * `<dataDir>/<datasetId>.csv`, time column in ISO-8601. The fake
  * applies projection + predicates server-side, exactly like ERDDAP —
  * which is what makes connector pushdown observable in tests: a scan
  * that fails to push down would fetch all columns/rows.
  */
class LocalErddapServer(dataDir: String) extends Serializable {

  /** Execute a compiled tabledap URL, returning CSV lines (header first). */
  def fetch(url: String): Seq[String] = {
    val q = url.indexOf('?')
    require(q > 0, s"malformed erddap url: $url")
    val pre = url.substring(0, q)
    val datasetId = pre.substring(pre.lastIndexOf('/') + 1, pre.lastIndexOf('.'))
    val query = URLDecoder.decode(url.substring(q + 1), "UTF-8")

    // query = "<attr1>,<attr2>...[&time>=..Z&time<=..Z]"
    val parts = query.split("&")
    val attrs = parts.head.split(",").toSeq
    var timeCol: Option[String] = None
    var lo: Option[String] = None
    var hi: Option[String] = None
    var loExcl = false
    var hiExcl = false
    parts.tail.foreach { p =>
      val geIdx = p.indexOf(">=")
      val leIdx = p.indexOf("<=")
      if (geIdx > 0) {
        timeCol = Some(p.substring(0, geIdx))
        lo = Some(p.substring(geIdx + 2).stripSuffix("Z"))
      } else if (leIdx > 0) {
        timeCol = Some(p.substring(0, leIdx))
        hi = Some(p.substring(leIdx + 2).stripSuffix("Z"))
      } else if (p.indexOf('>') > 0) { // strict bounds (ERDDAP grammar)
        val i = p.indexOf('>')
        timeCol = Some(p.substring(0, i))
        lo = Some(p.substring(i + 1).stripSuffix("Z")); loExcl = true
      } else if (p.indexOf('<') > 0) {
        val i = p.indexOf('<')
        timeCol = Some(p.substring(0, i))
        hi = Some(p.substring(i + 1).stripSuffix("Z")); hiExcl = true
      }
    }

    val lines = Files.readAllLines(Path.of(dataDir, s"$datasetId.csv")).asScala.toSeq
    val header = Csv.split(lines.head).toSeq
    val idx = attrs.map(a => header.indexOf(a))
    require(idx.forall(_ >= 0), s"unknown attribute in $attrs vs $header")
    val timeIdx = timeCol.map(header.indexOf).getOrElse(-1)

    val body = lines.tail.filter { line =>
      if (timeIdx < 0) true
      else {
        // ISO strings compare lexically once the Z suffix is normalized away
        val t = Csv.split(line)(timeIdx).stripSuffix("Z")
        lo.forall(b => if (loExcl) t > b else t >= b) &&
          hi.forall(b => if (hiExcl) t < b else t <= b)
      }
    }.map { line =>
      val cells = Csv.split(line)
      Csv.join(idx.map(cells(_)))
    }
    attrs.mkString(",") +: body
  }

  /** The reference's ncHeader size probe (`data_wrangler.py:238-266`):
    * row count without data transfer. */
  def rowCount(datasetId: String): Long =
    Files.lines(Path.of(dataDir, s"$datasetId.csv")).count() - 1

  def sizeInBytes(datasetId: String): Long =
    Files.size(Path.of(dataDir, s"$datasetId.csv"))
}
