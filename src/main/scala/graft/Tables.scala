package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. These stand in for the
  * reference's remote surfaces (SURVEY.md §"FIXTURES" mapping):
  * tabledap observation table → `lineitem`/`orders`; catalog →
  * `part`/`supplier` projections; NRT stream → `events`; control
  * tables → `customer` vs `orders`; training-data ops → `documents`,
  * `embeddings`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (Spark's
    * vectorized reader refuses it; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LongType
    * nanos) and as TIMESTAMP(MICROS) without the UTC-adjusted flag
    * (arrives as TIMESTAMP_NTZ — which watermarks reject). Both are
    * normalized here to a session-tz (UTC) µs TIMESTAMP, matching DuckDB
    * reading the same file. */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => // nanosAsLong: LongType nanos → µs timestamp
        df.withColumn(tsCol, timestamp_micros((col(tsCol) / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // under UTC session tz this preserves the wall-clock instant
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /** Session configs every entry point needs for the synthetic tables. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // bucketed-table writes (co-located joins) land outside the repo
    "spark.sql.warehouse.dir" -> "/tmp/graft-warehouse")

  /** Register every table as a temp view so spark.sql(...) works with the
    * same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Content fingerprint of a source table's parquet files (total
    * length + latest mtime, CRC'd) for fixture-directory naming:
    * tmpdir fixtures keyed only on the sfDir NAME go stale when
    * testdata at the same path is regenerated — the fingerprint in the
    * dir name forces a rebuild on mismatch. Filesystem metadata only;
    * no Spark job. */
  def contentTag(sfDir: String, name: String): String = {
    val root = java.nio.file.Path.of(s"$sfDir/$name.parquet")
    val crc = new java.util.zip.CRC32()
    def add(s: String): Unit = crc.update(s.getBytes("UTF-8"))
    if (java.nio.file.Files.exists(root)) {
      val stream = java.nio.file.Files.walk(root)
      try {
        stream.sorted().forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) {
            add(root.relativize(p).toString)
            add(java.nio.file.Files.size(p).toString)
            add(java.nio.file.Files.getLastModifiedTime(p).toMillis.toString)
          }
        }
      } finally stream.close()
    }
    java.lang.Long.toHexString(crc.getValue)
  }
}
