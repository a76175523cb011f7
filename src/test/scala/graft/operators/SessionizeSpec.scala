package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val events = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (1L, ts("2024-01-01 00:05:00")),   // gap 5m → same session (gap 600s)
    (1L, ts("2024-01-01 01:00:00")),   // gap 55m → new session
    (1L, ts("2024-01-01 01:02:00")),
    (2L, ts("2024-01-01 00:00:00"))    // other user: own session
  ).toDF("user_id", "ts")

  test("batch: gap rule splits sessions per key") {
    val out = Sessionize.sessionSummary(events, "user_id", "ts", gapSeconds = 600)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(4) == 2) // user1 session1: 2 events
    assert(out(1).getLong(4) == 2) // user1 session2: 2 events
    assert(out(2).getLong(4) == 1) // user2
    assert(out(1).getTimestamp(2) == ts("2024-01-01 01:00:00"))
  }

  test("streaming flatMapGroupsWithState matches the batch summary") {
    val dir = java.nio.file.Files.createTempDirectory("sess")
    events.withColumn("ts_long", col("ts").cast("long"))
      .select("user_id", "ts_long")
      .coalesce(1).write.parquet(dir.toString + "/in")
    val schema = spark.read.parquet(dir.toString + "/in").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString + "/in")
      .select(col("user_id").as("userId"),
        col("ts_long").cast("timestamp").as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.streamingSessions(stream, gapSeconds = 600)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      // first batch closes only sessions whose gap timeout passed the
      // watermark; emitted ones must match the batch computation
      val got = spark.table("sessions_out")
        .select("userId", "sessionStart", "sessionEnd", "nEvents")
      val want = Sessionize.sessionSummary(events, "user_id", "ts", 600)
        .select(col("user_id").as("userId"),
          col("session_start").as("sessionStart"),
          col("session_end").as("sessionEnd"),
          col("n_events").as("nEvents"))
      val mismatched = got.join(want,
        Seq("userId", "sessionStart", "sessionEnd", "nEvents"), "left_anti")
      assert(mismatched.count() == 0)
      assert(got.count() > 0)
    } finally q.stop()
  }

  test("sessionization over the synthetic events table is stable") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val sessions = Sessionize.sessionSummary(ev, "user_id", "ts",
      gapSeconds = 3600, tieBreak = Seq("event_id"))
    val total = sessions.agg(sum("n_events")).head().getLong(0)
    assert(total == ev.count()) // every event lands in exactly one session
  }
}
