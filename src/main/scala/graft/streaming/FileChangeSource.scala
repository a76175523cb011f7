package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S9 as a genuine Structured Streaming SOURCE: a micro-batch stream
  * whose offset is the reference's change-detection pair
  * `(lastModified, crc32)` (`OverwriteFS.py:2137-2231`, `:2346-2369`).
  *
  * `spark.readStream.format("filechange").option("path", fileOrUrl)`
  * emits ONE row per detected change of the watched resource —
  * downstream logic (re-download, re-publish) hangs off the stream; an
  * unchanged resource advances nothing and triggers no batch. The
  * two-tier cascade is preserved at the source: `latestOffset` only
  * pays the content read when the cheap tier-1 probe moved, exactly
  * the reference's skip-if-stale ordering.
  *
  * The probe is scheme-selected like the transports: a local path
  * stats the file and CRCs its bytes; an `http(s)://` URL does the
  * reference's actual tier-1 — a HEAD request's `Last-Modified`
  * header (`OverwriteFS.py:2137-2231` checks it against the service's
  * lastEditDate) — and tier-2 is a GET whose body is CRC'd.
  *
  * Row schema: (path, last_modified: long millis, crc: long, size: long).
  */
class FileChangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "filechange"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileChangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FileChangeTable(properties.get("path"))
}

object FileChangeSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("last_modified", LongType, nullable = false),
    StructField("crc", LongType, nullable = false),
    StructField("size", LongType, nullable = false)))
}

class FileChangeTable(path: String) extends Table with SupportsRead {
  require(path != null, "filechange source requires option: path")
  override def name(): String = s"filechange.$path"
  override def schema(): StructType = FileChangeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FileChangeScan(path)
}

/** Offset = the change-detection state pair, JSON-serialized for the
  * checkpoint log. `(-1, -1)` is the pre-first-probe state. */
case class FileChangeOffset(lastModified: Long, crc: Long) extends Offset {
  override def json(): String =
    s"""{"lastModified":$lastModified,"crc":$crc}"""
}

class FileChangeScan(path: String) extends Scan {
  override def readSchema(): StructType = FileChangeSource.schema
  override def description(): String = s"filechange path=$path (offset = lastModified+crc)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileChangeStream(path)
}

/** The two-tier change probe behind [[FileChangeStream]]. Tier-1
  * ([[stat]]) must be cheap and never read content; tier-2
  * ([[content]]) pays the full read. */
trait ChangeProbe {
  def id: String
  /** Tier-1: None = resource absent; Some(mtimeMillis) otherwise.
    * An unknown-but-present timestamp reports Some(-2) so the caller
    * always falls through to tier-2 (never silently skips). */
  def stat(): Option[Long]
  /** Tier-2: (crc32 of content, size in bytes). */
  def content(): (Long, Long)
}

object ChangeProbe {
  /** Scheme-selected like the transports. */
  def apply(path: String): ChangeProbe =
    if (path.startsWith("http://") || path.startsWith("https://"))
      new HttpChangeProbe(path)
    else new LocalFileProbe(path)
}

class LocalFileProbe(path: String) extends ChangeProbe {
  private val p = Path.of(path)
  override def id: String = path
  override def stat(): Option[Long] =
    if (Files.exists(p)) Some(Files.getLastModifiedTime(p).toMillis) else None
  override def content(): (Long, Long) = (FileChange.crc32(p), Files.size(p))
}

/** HTTP probe: tier-1 is a HEAD request's `Last-Modified` header (the
  * reference's header-vs-lastEditDate check, `OverwriteFS.py:2137-2231`);
  * tier-2 is a GET whose body is CRC32'd. A server that omits
  * Last-Modified degrades to CRC-every-poll instead of wrongly
  * skipping. */
class HttpChangeProbe(url: String, timeoutSec: Long = 30) extends ChangeProbe {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()
  private def req(method: String) = HttpRequest.newBuilder(java.net.URI.create(url))
    .timeout(java.time.Duration.ofSeconds(timeoutSec))
    .method(method, HttpRequest.BodyPublishers.noBody()).build()

  override def id: String = url

  override def stat(): Option[Long] = {
    import scala.jdk.OptionConverters._
    val resp = client.send(req("HEAD"), HttpResponse.BodyHandlers.discarding())
    if (resp.statusCode() >= 400) None
    else Some(resp.headers().firstValue("Last-Modified").toScala.map { v =>
      try java.time.ZonedDateTime.parse(v,
        java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        .toInstant.toEpochMilli
      catch { case _: Exception => -2L } // unparseable → always tier-2
    }.getOrElse(-2L)) // header absent → always tier-2
  }

  override def content(): (Long, Long) = {
    val resp = client.send(req("GET"), HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 400)
      throw new java.io.IOException(s"GET $url -> ${resp.statusCode()}")
    val bytes = resp.body()
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    (crc.getValue, bytes.length.toLong)
  }
}

class FileChangeStream(probe: ChangeProbe) extends MicroBatchStream {
  def this(path: String) = this(ChangeProbe(path))

  override def initialOffset(): Offset = FileChangeOffset(-1L, -1L)

  /** Two-tier probe: tier-1 first (cheap stat/HEAD), content read only
    * when tier-1 moved — the reference's ordering. An untouched
    * resource returns the PREVIOUS offset so no batch is planned. */
  override def latestOffset(): Offset = {
    val prev = lastSeen
    val mtime = probe.stat().getOrElse(return prev)
    if (mtime == prev.lastModified && mtime != -2L) return prev
    // offset carries the new (mtime, crc) either way; planInputPartitions
    // turns an equal-CRC advance into an empty batch (tier-2 no-op)
    val (crc, size) = probe.content()
    lastSize = size
    val next = FileChangeOffset(mtime, crc)
    lastSeen = next
    next
  }
  private var lastSeen: FileChangeOffset = FileChangeOffset(-1L, -1L)
  private var lastSize: Long = -1L

  override def deserializeOffset(json: String): Offset = {
    val m = "\"lastModified\":(-?\\d+)".r.findFirstMatchIn(json)
    val c = "\"crc\":(-?\\d+)".r.findFirstMatchIn(json)
    val off = FileChangeOffset(m.get.group(1).toLong, c.get.group(1).toLong)
    lastSeen = off
    off
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileChangeOffset]
    val e = end.asInstanceOf[FileChangeOffset]
    // only a CONTENT change emits a row: an mtime touch with equal CRC
    // advances the offset silently (the reference's tier-2 no-op)
    if (s.crc == e.crc) Array.empty
    else Array(FileChangePartition(probe.id, e.lastModified, e.crc,
      // size rides from the latestOffset() that built `end`; a restart
      // replanning an old range re-reads it from the probe
      if (lastSize >= 0) lastSize else probe.content()._2))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FileChangeReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class FileChangePartition(path: String, lastModified: Long, crc: Long,
    size: Long) extends InputPartition

class FileChangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[FileChangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(part.path), part.lastModified, part.crc, part.size)
      override def close(): Unit = ()
    }
  }
}
