package graft.sinks

import java.io.{BufferedWriter, FileWriter}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Geometry

/** K2/K3 — GeoJSON sink.
  *
  * The reference streams a single FeatureCollection document feature by
  * feature (`Json2GeoJSON.py:935-1140`, glider lines
  * `agol_wrangler.py:798-820`). At 100 TB a single JSON document is the
  * wrong shape, so the PRIMARY sink is newline-delimited GeoJSON
  * (one Feature per line, a.k.a. GeoJSONSeq): a plain distributed text
  * write, partition-parallel, no driver bottleneck. A FeatureCollection
  * wrapper is provided for small exports and streams through
  * `toLocalIterator` (bounded driver memory — one partition in flight).
  */
object GeoJson {

  /** Assemble one GeoJSON Feature JSON string per row: all columns
    * except the geometry columns become properties. */
  def featureLines(df: DataFrame, geometry: Column,
      propCols: Seq[String]): DataFrame =
    df.select(Geometry.featureJson(
      struct(propCols.map(col): _*), geometry).as("feature"))

  /** Distributed newline-delimited GeoJSON write. */
  def writeSeq(df: DataFrame, geometry: Column, propCols: Seq[String],
      path: String): Unit =
    featureLines(df, geometry, propCols).write.mode("overwrite").text(path)

  /** Single FeatureCollection document (small exports / parity with the
    * reference's output shape). Streams partitions; never collects —
    * but the write itself is single-threaded on the DRIVER, so this is
    * guarded by `maxRows` (default 1,000,000): a caller pointing it at
    * a big frame gets an immediate error naming [[writeSeq]] instead of
    * a silent hours-long driver write. Pass `maxRows = 0` to disable
    * (export tooling that knowingly accepts the driver funnel). */
  def writeFeatureCollection(df: DataFrame, geometry: Column,
      propCols: Seq[String], file: String, maxRows: Long = 1000000L): Long = {
    if (maxRows > 0) {
      val bound = df.limit((maxRows + 1).toInt).count()
      require(bound <= maxRows,
        s"writeFeatureCollection is a driver-side single-document export " +
          s"capped at $maxRows rows; use writeSeq (distributed ndjson) for " +
          s"large frames, or pass maxRows = 0 to override")
    }
    val lines = featureLines(df, geometry, propCols)
    val out = new BufferedWriter(new FileWriter(file))
    var n = 0L
    try {
      out.write("{\"type\": \"FeatureCollection\",\n\"features\": [\n")
      val it = lines.toLocalIterator()
      while (it.hasNext) {
        if (n > 0) out.write(",\n")
        out.write(it.next().getString(0))
        n += 1
      }
      out.write("\n]}\n")
    } finally out.close()
    n
  }
}
