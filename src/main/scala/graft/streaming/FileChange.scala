package graft.streaming

import java.nio.file.{Files, Path}
import java.util.zip.CRC32

/** S9/T2 — byte-level change detection for downloaded artifacts, the
  * two lower tiers of the reference's skip-if-unchanged cascade
  * (`OverwriteFS.py:2137-2231`, `_getCRC` `:154-164`, compare
  * `:2346-2369`): (1) source Last-Modified vs the service's
  * lastEditDate; (2) block-wise CRC32 of the downloaded bytes.
  * Table-level fingerprints (the Spark-side tier) live in
  * [[Nrt.tableFingerprint]].
  */
object FileChange {

  /** Block-wise CRC32 (64 KiB blocks like the reference's chunked read). */
  def crc32(path: Path): Long = {
    val crc = new CRC32()
    val in = Files.newInputStream(path)
    try {
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { crc.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    crc.getValue
  }

  sealed trait Decision
  case object Unchanged extends Decision
  case object Changed extends Decision

  /** Tier-1: skip when the source is not newer than the target, unless
    * `ignoreAge` (the reference's flag). */
  def byLastModified(sourceMillis: Long, targetMillis: Long,
      ignoreAge: Boolean = false): Decision =
    if (!ignoreAge && sourceMillis <= targetMillis) Unchanged else Changed

  /** Tier-2: CRC equality of the downloaded bytes vs the stored CRC. */
  def byCrc(path: Path, storedCrc: Option[Long]): (Decision, Long) = {
    val c = crc32(path)
    (if (storedCrc.contains(c)) Unchanged else Changed, c)
  }
}
