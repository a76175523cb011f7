package graft.sources.erddap

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Transport seam for the ERDDAP connectors: everything above this
  * trait (URL grammar, chunk partitions, retries-as-rereads, pushdown)
  * is transport-agnostic. Two implementations:
  *
  *  - [[LocalErddapServer]] — fixture-directory fake executing the same
  *    request grammar server-side (zero-egress test/bench path);
  *  - [[HttpErddapTransport]] — real `java.net.http` client with the
  *    reference's timeout/retry policy (`data_wrangler.py:557-573`:
  *    connect 120 s, read 180 s, 3 tries).
  *
  * Selection is by endpoint scheme: `http://`/`https://` → HTTP,
  * anything else is a local fixture directory — so the same
  * `spark.read.format("erddap").option("dataDir", …)` call works
  * against either.
  */
trait ErddapTransport extends Serializable {
  /** Execute a compiled tabledap URL, returning CSV lines (header first). */
  def fetch(url: String): Seq[String]
  /** Execute a compiled griddap hyperslab URL, returning NetCDF bytes. */
  def fetchGriddap(url: String): Array[Byte]
  /** Griddap metadata probe: dims + variables + coordinates. */
  def griddapHeader(datasetId: String): graft.sources.griddap.GridNc.Grid
  /** ncHeader-style row-count probe — no data transfer. */
  def rowCount(datasetId: String): Long
  /** Size estimate for `SupportsReportStatistics`. */
  def sizeInBytes(datasetId: String): Long
}

object ErddapTransport {
  def apply(endpoint: String): ErddapTransport =
    if (endpoint.startsWith("http://") || endpoint.startsWith("https://"))
      new HttpErddapTransport(endpoint)
    else new LocalErddapServer(endpoint)
}

/** Live HTTP transport. `base` is the server root (e.g.
  * `https://host/erddap`); compiled request URLs are REBASED onto it
  * (`<base>/tabledap/<id>.csv?…`, `<base>/griddap/<id>.nc?…`) so the
  * connector's `server` option — which exists to make compiled URLs
  * readable in plans — never has to agree with the transport endpoint.
  *
  * Retry policy mirrors the reference (`data_wrangler.py:557-573`):
  * `retries` attempts per request, fixed delay between attempts,
  * connect/read timeouts of 120 s/180 s. Non-2xx responses count as
  * failures and are retried (ERDDAP returns 404 for empty chunk
  * windows — callers see the final exception after retries).
  *
  * The row-count probe requests `<id>.ncHeader` and parses the
  * `row = N ;` dimension from the CDL header, exactly the reference's
  * sizing probe (`data_wrangler.py:238-266`). The size estimate derives
  * from it (stats only steer join planning, they need order of
  * magnitude, not bytes).
  */
class HttpErddapTransport(
    base: String,
    connectTimeoutSec: Long = 120,
    readTimeoutSec: Long = 180,
    retries: Int = 3,
    retryDelayMs: Long = 2000) extends ErddapTransport {

  private val root = base.stripSuffix("/")

  // HttpClient is not serializable; rebuilt lazily per executor.
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(connectTimeoutSec))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def rebase(compiledUrl: String, kind: String): URI = {
    val tail = compiledUrl.substring(compiledUrl.lastIndexOf('/') + 1)
    URI.create(s"$root/$kind/$tail")
  }

  private def getBytes(uri: URI): Array[Byte] = {
    var attempt = 0
    var last: Exception = null
    while (attempt < retries) {
      try {
        val req = HttpRequest.newBuilder(uri)
          .timeout(Duration.ofSeconds(readTimeoutSec)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() / 100 == 2) return resp.body()
        last = new java.io.IOException(s"HTTP ${resp.statusCode()} for $uri")
      } catch { case e: Exception => last = e }
      attempt += 1
      if (attempt < retries) Thread.sleep(retryDelayMs)
    }
    throw last
  }

  private def getString(uri: URI): String =
    new String(getBytes(uri), java.nio.charset.StandardCharsets.UTF_8)

  override def fetch(url: String): Seq[String] = {
    // CSV responses may quote fields with embedded newlines; ERDDAP's
    // csvp format never does, so per-line split is sound (Csv.scala).
    getString(rebase(url, "tabledap")).split("\r?\n", -1).toSeq
      .filter(_.nonEmpty)
  }

  override def fetchGriddap(url: String): Array[Byte] =
    getBytes(rebase(url, "griddap"))

  override def griddapHeader(datasetId: String): graft.sources.griddap.GridNc.Grid =
    // The full-file fetch is the fixture-compatible metadata path; a
    // deployment against a large remote grid should serve a trimmed
    // header object at this route instead (the codec only reads what
    // the response contains).
    graft.sources.griddap.GridNc.read(
      getBytes(URI.create(s"$root/files/$datasetId.nc")))

  private val rowDimRe = "(?m)^\\s*(?:row|obs)\\s*=\\s*(\\d+)\\s*;".r

  override def rowCount(datasetId: String): Long = {
    val header = getString(URI.create(s"$root/tabledap/$datasetId.ncHeader"))
    rowDimRe.findFirstMatchIn(header)
      .map(_.group(1).toLong)
      .getOrElse(throw new java.io.IOException(
        s"no row dimension in ncHeader for $datasetId"))
  }

  override def sizeInBytes(datasetId: String): Long =
    rowCount(datasetId) * 64 // ~64 B/row: order-of-magnitude for planning
}
