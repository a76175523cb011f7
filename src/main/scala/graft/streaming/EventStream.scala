package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming face of the engine (SURVEY.md §2.10).
  *
  * The reference's "streaming" is poll-based full-replace, so the batch
  * [[Nrt]] module is the faithful mapping; this module provides the
  * genuinely streaming shapes a Spark-native deployment would add:
  * watermarked tumbling-window aggregation over an event stream and a
  * processing-time-trigger refresh (T1's `Trigger.ProcessingTime`
  * analog). Tested against file sources with the memory sink.
  */
object EventStream {

  /** Open an events directory as a stream (file source — each parquet
    * file arriving in `dir` is a micro-batch). Handles the synthetic
    * table's TIMESTAMP(NANOS) column the same way Tables.load does:
    * the nanosAsLong session flag surfaces it as LongType and we
    * convert to a µs timestamp. */
  /** Generic file-source stream over one parquet table. The file
    * source streams a DIRECTORY of arriving files; a single parquet
    * FILE (the synthetic tables' layout) is staged into a temp dir as
    * its one initial micro-batch. */
  def readParquetStream(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Path.of(dir)
    val streamDir =
      if (java.nio.file.Files.isRegularFile(path)) {
        val d = java.nio.file.Files.createTempDirectory("table_stream")
        java.nio.file.Files.copy(path, d.resolve(path.getFileName))
        d.toString
      } else dir
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).format("parquet").load(streamDir)
  }

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.normalizeTs(readParquetStream(spark, dir), "ts")

  /** Watermarked tumbling-window aggregation (the streaming version of
    * the w3_hourly_window batch query): late events beyond
    * `watermarkDelay` are dropped; output appends closed windows. */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sv"))

  /** Streaming KMV: hourly windowed distinct-`valueCol` ESTIMATES per
    * event type, through the same bounded bottom-k aggregate as the
    * batch path ([[graft.functions.KmvSketchAgg]]) — O(k) state per
    * open window in the state store, exact below k, deterministic
    * above it, so the streaming result equals the batch result over
    * the same events (the parity property the gate checks). */
  def hourlyKmvDistinct(events: DataFrame, valueCol: String, k: Int = 64,
      tsCol: String = "ts", watermarkDelay: String = "1 hour"): DataFrame = {
    val sk = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.KmvSketchAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(
          graft.operators.Sketches.kmvHash(col(valueCol))), k)
        .toAggregateExpression())
    events.filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(sk.as("_sk"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("_sk.est").as("est"), col("_sk.kept").as("kept"))
  }

  /** Streaming DUPLICATION MONITOR — the NRT twin of
    * [[graft.operators.Dedup.dedupReport]]: per closed (hour, group),
    * row count + KMV-estimated distinct payload FINGERPRINTS
    * (normalized-text md5, the batch dedup key) → estimated duplicate
    * rate. State per open window is O(k) bottom-k hashes plus one
    * counter — payload-cardinality-INDEPENDENT, which is what makes a
    * dup-rate monitor viable on an unbounded stream (exact distinct
    * state would grow with every novel payload until the watermark
    * closes). KMV is deterministic (md5), so streaming = batch =
    * oracle, and the estimate is exact whenever a window holds < k
    * distinct payloads. */
  def hourlyDupRate(events: DataFrame, valueCol: String, k: Int = 64,
      tsCol: String = "ts", watermarkDelay: String = "1 hour",
      groupCol: String = "event_type"): DataFrame = {
    val fp = graft.operators.TextAnalysis.fingerprint(col(valueCol))
    val sk = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.KmvSketchAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(
          graft.operators.Sketches.kmvHash(fp)), k)
        .toAggregateExpression())
    events.filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour"), col(groupCol))
      .agg(count(lit(1)).as("n"), sk.as("_sk"))
      .select(col("window.start").as("win_start"), col(groupCol),
        col("n"), col("_sk.est").as("est_distinct"),
        round(greatest(lit(0.0),
          lit(1.0) - col("_sk.est") / col("n")), 6).as("dup_rate_est"))
  }

  /** Hourly Count-Min sketch as a STREAMING aggregation: because the
    * sketch is a relation ([[graft.operators.Sketches.cmsSketch]]),
    * its streaming twin is just a watermarked windowed count over
    * (window, d, bucket) — at most depth × width rows of state per
    * open window, append-emitted when the watermark closes it, and
    * deterministic, so streaming = batch = oracle. Per-window sketches
    * merge across hours by adding counts ([[graft.operators.Sketches
    * .cmsMerge]]) — the classic pre-aggregated time-series sketch
    * layout. */
  def hourlyCms(events: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256,
      tsCol: String = "ts", watermarkDelay: String = "1 hour"): DataFrame =
    events.filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        graft.operators.Sketches.cmsKeys(valueCol, depth, width).as("db"))
      .groupBy(window(col(tsCol), "1 hour"), col("db.d"), col("db.bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("d"),
        col("bucket"), col("cnt"))

  /** STREAM-STREAM interval join: purchases matched to the clicks that
    * preceded them within `windowSeconds` on the same user — the
    * attribution join, running as a genuine stream-stream inner join.
    * Both sides carry watermarks and the join condition bounds the
    * event-time distance, which is exactly what lets Spark EXPIRE
    * per-key state (an unbounded-condition stream-stream join would
    * buffer both streams forever — the 100 TB streaming killer).
    * Inner-join semantics make the complete-data result identical to
    * the batch join, so a batch SQL oracle checks it exactly. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, windowSeconds: Long,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    // the payload structs must NOT capture the watermarked ts column —
    // a stream whose output carries two event-time columns (top-level
    // + struct field) fails analysis; times ride `_lts`/`_rts`, one
    // event-time column per input stream
    val lPayload = left.columns.filterNot(_ == tsCol).map(col)
    val rPayload = right.columns.filterNot(_ == tsCol).map(col)
    val l = left.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("_k"), col(tsCol).as("_lts"),
        struct(lPayload.toSeq: _*).as("_l"))
    val r = right.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("_rk"), col(tsCol).as("_rts"),
        struct(rPayload.toSeq: _*).as("_r"))
    l.join(r, col("_k") === col("_rk") &&
      col("_rts") <= col("_lts") &&
      col("_rts") >= col("_lts") - expr(s"INTERVAL $windowSeconds SECONDS"))
  }

  /** Streaming exact dedup: drop rows whose key was already seen within
    * the watermark horizon (`dropDuplicatesWithinWatermark` bounds the
    * dedup state — the streaming face of Dedup.exact for continuous
    * ingestion). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", delay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** NRT processing-time trigger: periodically recompute a full-replace
    * aggregate (complete output mode = the reference's overwrite
    * semantics, T3 — no merge, each trigger replaces the result). */
  /** STREAMING anomaly scoring: closed hourly windows ([[hourlyCounts]]
    * semantics — 1 h tumbling + 1 h watermark) z-scored against a
    * BATCH-computed per-type stats table via a stream-static broadcast
    * join. `stats` must carry (event_type, _h, _s, _s2) — hour count
    * and exact Σn/Σn² over the SAME window set the stream will emit
    * (the caller aligns the watermark cutoff) — so streaming output
    * equals the batch z-scores row for row. State is the windowed
    * count's; the join adds none (the static side broadcasts). */
  def hourlyAnomalyScores(events: DataFrame, stats: DataFrame,
      threshold: Double = 2.0, tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val hourly = hourlyCounts(events, tsCol, watermarkDelay)
      .select(col("win_start").as("hour"), col("event_type"), col("n"))
    val mean = col("_s").cast("double") / col("_h")
    val variance = col("_s2").cast("double") / col("_h") - mean * mean
    val z = when(variance <= 0.0, lit(0.0))
      .otherwise((col("n") - mean) / sqrt(variance))
    hourly.join(broadcast(stats), "event_type")
      .select(col("hour"), col("event_type"), col("n"),
        round(z, 6).as("z"), (abs(z) >= threshold).as("is_anomaly"))
  }

  def nrtRefresh(events: DataFrame, intervalMs: Long): DataStreamWriter[_] =
    events
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("latest"), count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.ProcessingTime(intervalMs))
      .format("memory")
}
