package graft.sources

import java.nio.file.{Files, Path}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

class ErddapDataSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // Fixture dataset: 96 hourly observations 2024-06-01 → 2024-06-04.
  lazy val dir: Path = {
    val d = Files.createTempDirectory("erddap_src")
    val rows = (0 until 96).map { h =>
      val t = Instant.parse("2024-06-01T00:00:00Z").plusSeconds(h * 3600L)
      val iso = graft.erddap.ChunkPlanner.isoNoZone(t) + "Z"
      s"$iso,25.9,-89.7,${20.0 + h % 10},${h % 4}"
    }
    Files.writeString(d.resolve("buoy1.csv"),
      ("time,latitude,longitude,sea_surface_temperature_0,sea_surface_temperature_0_qc_agg" +:
        rows).mkString("\n"))
    Files.writeString(d.resolve("buoy1.das"),
      """Attributes {
        |  time {
        |    String ioos_category "Time";
        |    String units "seconds since 1970-01-01T00:00:00Z";
        |    Float64 actual_range 1717200000.0, 1717542000.0;
        |  }
        |  latitude {
        |    Float64 actual_range 25.9, 25.9;
        |  }
        |  longitude {
        |    Float64 actual_range -89.7, -89.7;
        |  }
        |  sea_surface_temperature_0 {
        |    Float64 actual_range 20.0, 29.0;
        |    String units "degree_C";
        |  }
        |  sea_surface_temperature_0_qc_agg {
        |    Byte actual_range 0, 3;
        |  }
        |  NC_GLOBAL {
        |    String title "Test buoy";
        |  }
        |}""".stripMargin)
    d
  }

  def read() = spark.read.format("erddap")
    .option("dataDir", dir.toString)
    .option("dataset", "buoy1")
    .option("das", dir.resolve("buoy1.das").toString)
    .option("chunkSize", "25")

  test("schema comes from DAS with QC pruning; time is timestamp") {
    val df = read().load()
    assert(df.columns.toSeq ==
      Seq("time", "latitude", "longitude", "sea_surface_temperature_0"))
    assert(df.schema("time").dataType.typeName == "timestamp")
  }

  test("returnAll mode keeps QC columns") {
    val df = read().option("returnAll", "true").load()
    assert(df.columns.contains("sea_surface_temperature_0_qc_agg"))
  }

  test("full scan returns all rows with correct values") {
    val df = read().load()
    assert(df.count() == 96)
    val first = df.orderBy("time").head()
    assert(first.getTimestamp(0).toInstant == Instant.parse("2024-06-01T00:00:00Z"))
    assert(first.getDouble(1) == 25.9)
    assert(first.getDouble(3) == 20.0)
  }

  test("chunk plan → one InputPartition per time chunk") {
    // 96 rows, chunkSize 25 → ceil(96/25) = 4 partitions
    val df = read().load()
    assert(df.rdd.getNumPartitions == 4)
  }

  test("time-range filter is pushed into the request URL") {
    val df = read().load()
      .filter(col("time") >= lit("2024-06-02 00:00:00").cast("timestamp") &&
        col("time") <= lit("2024-06-02 23:00:00").cast("timestamp"))
    assert(df.count() == 24)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("time=[") || plan.contains("PushedFilters"),
      s"expected pushdown evidence in plan:\n$plan")
    // pushed range narrows the partition count (24 rows / 25 chunk = 1)
    assert(df.rdd.getNumPartitions == 1)
  }

  test("column pruning reaches the scan (projection in URL)") {
    val df = read().load().select("time", "sea_surface_temperature_0")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=time,sea_surface_temperature_0"),
      s"expected pruned cols in scan description:\n$scanDesc")
    assert(df.count() == 96)
  }

  test("statistics report the ncHeader-style row count") {
    val df = read().load()
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.isEmpty || stats.rowCount.get == BigInt(96) ||
      stats.sizeInBytes > 0)
  }

  test("results match an equivalent plain-CSV read") {
    val direct = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir.resolve("buoy1.csv").toString)
      .filter(col("time") >= "2024-06-01T12:00:00Z" && col("time") <= "2024-06-02T12:00:00Z")
      .agg(round(sum("sea_surface_temperature_0"), 2)).head().getDouble(0)
    val viaSource = read().load()
      .filter(col("time") >= lit("2024-06-01 12:00:00").cast("timestamp") &&
        col("time") <= lit("2024-06-02 12:00:00").cast("timestamp"))
      .agg(round(sum("sea_surface_temperature_0"), 2)).head().getDouble(0)
    assert(viaSource == direct)
  }

  test("aggregate pushdown: COUNT/min/max answered from metadata only") {
    val df = read().load()
    val agg = df.agg(count(lit(1)).as("n"), min(col("time")).as("lo"),
      max(col("time")).as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("erddap-agg"), s"expected metadata-only agg scan:\n$plan")
    val r = agg.head()
    assert(r.getLong(0) == 96)
    assert(r.getTimestamp(1).toInstant == Instant.parse("2024-06-01T00:00:00Z"))
    assert(r.getTimestamp(2).toInstant == Instant.parse("2024-06-04T23:00:00Z"))
  }

  test("aggregate pushdown declines when a time filter is pushed") {
    val df = read().load()
      .filter(col("time") >= lit("2024-06-02 00:00:00").cast("timestamp"))
    val agg = df.agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("erddap-agg"))
    assert(agg.head().getLong(0) == 72)
  }
}
