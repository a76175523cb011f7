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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader refuses. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[configure]]), the
    * column then arrives as LongType nanos and is converted to a µs
    * timestamp here — semantics match DuckDB reading the same file at
    * second/µs granularity. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else df
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
}
