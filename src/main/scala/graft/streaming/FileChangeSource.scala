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
  * `spark.readStream.format("filechange").option("path", file)` emits
  * ONE row per detected change of the watched file — downstream logic
  * (re-download, re-publish) hangs off the stream; an unchanged file
  * advances nothing and triggers no batch. The two-tier cascade is
  * preserved at the source: `latestOffset` only pays the CRC read when
  * the cheap lastModified probe moved, exactly the reference's
  * skip-if-stale ordering.
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

class FileChangeStream(path: String) extends MicroBatchStream {
  private val p = Path.of(path)

  override def initialOffset(): Offset = FileChangeOffset(-1L, -1L)

  /** Two-tier probe: mtime first (cheap stat), CRC only when mtime
    * moved — the reference's ordering. An untouched file returns the
    * PREVIOUS offset so no batch is planned. */
  override def latestOffset(): Offset = {
    val prev = lastSeen
    if (!Files.exists(p)) return prev
    val mtime = Files.getLastModifiedTime(p).toMillis
    if (mtime == prev.lastModified) return prev
    // offset carries the new (mtime, crc) either way; planInputPartitions
    // turns an equal-CRC advance into an empty batch (tier-2 no-op)
    val next = FileChangeOffset(mtime, FileChange.crc32(p))
    lastSeen = next
    next
  }
  private var lastSeen: FileChangeOffset = FileChangeOffset(-1L, -1L)

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
    else Array(FileChangePartition(path, e.lastModified, e.crc,
      if (Files.exists(p)) Files.size(p) else 0L))
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
