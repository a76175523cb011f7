package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val steps = Seq("view", "click", "purchase")
  val week = 7 * 86400L

  test("funnel: ordered completion, skipped users, out-of-order events") {
    val ev = Seq(
      // u1 completes the whole funnel in order
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2 purchases WITHOUT a click → stops at step 1
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 01:00:00"), "purchase"),
      // u3 clicks BEFORE the first view → the click cannot count
      (3L, ts("2024-01-01 00:00:00"), "click"),
      (3L, ts("2024-01-01 01:00:00"), "view"),
      // u4 never views → absent entirely
      (4L, ts("2024-01-01 00:00:00"), "click"),
      (4L, ts("2024-01-01 01:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val depth = EventAnalytics.funnelUsers(ev, "user_id", "ts",
        "event_type", steps, week)
      .as[(Long, Long)].collect().toMap
    assert(depth == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    val summary = EventAnalytics.funnelSummary(ev, "user_id", "ts",
        "event_type", steps, week)
      .select("step", "users").as[(Long, Long)].collect().toMap
    assert(summary == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("funnel: conversion window anchors at step 1, not the last step") {
    val ev = Seq(
      // click at day 6 is inside the 7-day window; purchase at day 8
      // is past it even though it is < 7 days after the click
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-07 00:00:00"), "click"),
      (1L, ts("2024-01-09 00:00:00"), "purchase"),
      // boundary: exactly +7 days is still inside (<=)
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-04 00:00:00"), "click"),
      (2L, ts("2024-01-08 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val depth = EventAnalytics.funnelUsers(ev, "user_id", "ts",
        "event_type", steps, week)
      .as[(Long, Long)].collect().toMap
    assert(depth == Map(1L -> 2L, 2L -> 3L))
  }

  test("funnel: each step uses the EARLIEST qualifying event") {
    // first view anchors; the user's later second view must not re-anchor
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-10 00:00:00"), "view"),
      (1L, ts("2024-01-10 01:00:00"), "click") // only after the 2nd view
    ).toDF("user_id", "ts", "event_type")
    val depth = EventAnalytics.funnelUsers(ev, "user_id", "ts",
        "event_type", steps, week)
      .as[(Long, Long)].collect().toMap
    assert(depth == Map(1L -> 1L), "second view must not restart the window")
    val times = EventAnalytics.funnelStepTimes(ev, "user_id", "ts",
        "event_type", steps, week)
      .select("step", "step_ts").as[(Long, Timestamp)].collect().toMap
    assert(times(1L) == ts("2024-01-01 00:00:00"))
  }

  test("cohort retention: known cohorts, offsets, and ratios") {
    // weeks: 2024-01-01 and 2024-01-08 are both Mondays
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort W1
      (1L, ts("2024-01-09 10:00:00")), // active W1+1
      (2L, ts("2024-01-03 10:00:00")), // cohort W1, never returns
      (3L, ts("2024-01-08 10:00:00")), // cohort W2
      (3L, ts("2024-01-10 10:00:00"))  // same week → offset 0 only
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("active_users"), col("cohort_size"), col("retention"))
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-08", 0L, 1L, 1L, 1.0)))
  }
}
