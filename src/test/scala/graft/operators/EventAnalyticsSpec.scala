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

  test("transitions: lead pairs per user, row-normalized") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-01 00:01:00"), "b", 2L),
      (1L, ts("2024-01-01 00:02:00"), "a", 3L),
      (1L, ts("2024-01-01 00:03:00"), "c", 4L),
      (2L, ts("2024-01-01 00:00:00"), "a", 5L),
      (2L, ts("2024-01-01 00:01:00"), "b", 6L),
      // user boundary: u2's last event must NOT chain into u3
      (3L, ts("2024-01-01 00:00:00"), "c", 7L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.eventTransitions(ev, "user_id", "ts",
        "event_type", tieBreak = Seq("event_id"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 0.666667)), ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("anomalies: constant series z=0; a spike flags; variance guard") {
    val base = (0 until 10).map(h =>
      (ts(f"2024-01-01 $h%02d:30:00"), "steady"))
    // spiky type: nine quiet hours of 1 event, one hour of 20
    val quiet = (0 until 9).map(h => Seq((ts(f"2024-01-02 $h%02d:00:00"), "spiky")))
      .flatten
    val spike = (0 until 20).map(m => (ts(f"2024-01-02 09:$m%02d:00"), "spiky"))
    val ev = (base ++ quiet ++ spike).toDF("ts", "event_type")
    val out = EventAnalytics.hourlyAnomalies(ev, "ts", "event_type")
      .select("event_type", "n", "z", "is_anomaly")
      .as[(String, Long, Double, Boolean)].collect()
    val steady = out.filter(_._1 == "steady")
    assert(steady.forall(r => r._3 == 0.0 && !r._4),
      "zero-variance series must not flag")
    val spikeRow = out.filter(r => r._1 == "spiky" && r._2 == 20L).head
    assert(spikeRow._4 && spikeRow._3 > 2.0)
    assert(out.filter(r => r._1 == "spiky" && r._2 == 1L).forall(!_._4))
  }

  test("behavior entropy: hand-computed H; scripted loop scores zero") {
    val ev = Seq(
      // u1 transitions: a→b, b→a, a→b, b→c → counts {a→b:2, b→a:1, b→c:1}
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-01 00:01:00"), "b", 2L),
      (1L, ts("2024-01-01 00:02:00"), "a", 3L),
      (1L, ts("2024-01-01 00:03:00"), "b", 4L),
      (1L, ts("2024-01-01 00:04:00"), "c", 5L),
      // u2: pure a→a loop → entropy 0
      (2L, ts("2024-01-01 00:00:00"), "a", 6L),
      (2L, ts("2024-01-01 00:01:00"), "a", 7L),
      (2L, ts("2024-01-01 00:02:00"), "a", 8L),
      // u3: single event → absent
      (3L, ts("2024-01-01 00:00:00"), "a", 9L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.behaviorEntropy(ev, "user_id", "ts",
        "event_type", Seq("event_id"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h1 = math.log(4.0) - (2 * math.log(2.0)) / 4
    assert(out(1L) == ((4L, 3L, rnd(h1))))
    assert(out(2L) == ((2L, 1L, 0.0)))
    assert(!out.contains(3L))
  }

  test("survival: KM steps from hand counts; final step hits zero") {
    // lifetimes in days: 0, 0, 1, 2 → S(0)=0.5, S(1)=0.25, S(2)=0
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-05 00:00:00")),
      (3L, ts("2024-01-01 00:00:00")), (3L, ts("2024-01-02 06:00:00")),
      (4L, ts("2024-01-01 00:00:00")), (4L, ts("2024-01-03 01:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.survivalCurve(ev, "user_id", "ts")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == ((2L, 4L, 0.5)))
    assert(out(1L) == ((1L, 2L, 0.25)))
    assert(out(2L) == ((1L, 1L, 0.0)))
  }

  test("rolling drift: sustained shift flags where single hours do not") {
    // 12 quiet hours at n=2, then 6 hours at n=4: each drifted hour is
    // only ~2σ alone but the 6-hour rolling mean exceeds 3σ/√6
    val ev = ((0 until 12).flatMap(h =>
        Seq.fill(2)((ts(f"2024-01-01 $h%02d:00:00"), "e"))) ++
      (12 until 18).flatMap(h =>
        Seq.fill(4)((ts(f"2024-01-01 $h%02d:00:00"), "e"))))
      .toDF("ts", "event_type")
    val out = EventAnalytics.rollingDrift(ev, "ts", "event_type",
        windowHours = 6, threshold = 3.0)
      .select(col("hour").cast("string"), col("roll_mean"), col("is_drift"))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("2024-01-01 05:00:00") == ((2.0, false)))
    // last window: six hours of 4 → rolling mean 4
    assert(out("2024-01-01 17:00:00")._1 == 4.0)
    assert(out("2024-01-01 17:00:00")._2, "sustained shift must flag")
    // head partial frame: n_window < 6 uses the actual row count
    assert(out("2024-01-01 00:00:00")._1 == 2.0)
  }

  test("ohlc: open/close by time order, high/low by value, tie by id") {
    val ev = Seq(
      ("m", ts("2024-01-01 01:00:00"), 5.0, 1L),
      ("m", ts("2024-01-01 02:00:00"), 9.0, 2L), // high
      ("m", ts("2024-01-01 03:00:00"), 2.0, 3L), // low
      ("m", ts("2024-01-01 04:00:00"), 7.0, 4L),
      ("m", ts("2024-01-02 01:00:00"), 1.0, 5L), // next day
      // same-instant open tie → smaller event_id wins
      ("x", ts("2024-01-01 00:00:00"), 3.0, 7L),
      ("x", ts("2024-01-01 00:00:00"), 4.0, 6L)
    ).toDF("event_type", "ts", "value", "event_id")
    val out = EventAnalytics.ohlcBars(ev, "event_type", "ts", "value",
        "day", Seq("event_id"))
      .select(col("event_type"), col("bucket").cast("string"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(("m", "2024-01-01 00:00:00")) == ((5.0, 9.0, 2.0, 7.0, 4L)))
    assert(out(("m", "2024-01-02 00:00:00")) == ((1.0, 1.0, 1.0, 1.0, 1L)))
    assert(out(("x", "2024-01-01 00:00:00")) == ((4.0, 4.0, 3.0, 3.0, 2L)))
  }

  test("twa: step function weighting; single-event keys drop") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0, 1L), // holds 10 s
      (1L, ts("2024-01-01 00:00:10"), 3.0, 2L), // holds 30 s
      (1L, ts("2024-01-01 00:00:40"), 99.0, 3L), // last: no weight
      (2L, ts("2024-01-01 00:00:00"), 5.0, 4L)  // single event → dropped
    ).toDF("user_id", "ts", "value", "event_id")
    val out = EventAnalytics.timeWeightedAvg(ev, "user_id", "ts",
        "value", Seq("event_id"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // (1·10 + 3·30) / 40 = 2.5 over a 40 s span
    assert(out == Map(1L -> ((2.5, 40.0))))
  }

  test("histogram: bin edges, max-inclusive last bin, degenerate group") {
    val ev = (Seq(0.0, 1.0, 4.9, 5.0, 10.0).map(("a", _)) ++
      Seq(("b", 7.0), ("b", 7.0))).toDF("event_type", "value")
    val out = EventAnalytics.histogram(ev, "event_type", "value", bins = 10)
      .select("event_type", "bin", "n")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // a: range [0,10], width 1 → 0.0→bin0, 1.0→bin1, 4.9→bin4,
    // 5.0→bin5, 10.0→bin9 (max-inclusive clamps into the last bin)
    assert(out == Map(("a", 0L) -> 1L, ("a", 1L) -> 1L, ("a", 4L) -> 1L,
      ("a", 5L) -> 1L, ("a", 9L) -> 1L, ("b", 0L) -> 2L))
  }

  test("skew report: hand-computed gini; uniform keys score zero") {
    val skewed = (Seq.fill(3)(7L) :+ 9L).toDF("user_id")
    val r = EventAnalytics.keySkewReport(skewed, "user_id").collect().head
    // sorted counts [1, 3]: num = (2·1−3)·1 + (2·2−3)·3 = 2 → 2/(2·4)
    assert(r.getAs[Long]("n_keys") == 2L && r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("max_count") == 3L)
    assert(r.getAs[Double]("max_share") == 0.75)
    assert(r.getAs[Double]("gini") == 0.25)
    val uniform = Seq(1L, 1L, 2L, 2L).toDF("user_id")
    assert(EventAnalytics.keySkewReport(uniform, "user_id")
      .collect().head.getAs[Double]("gini") == 0.0)
  }

  test("attribution: latest click at/before each purchase; null when none") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 10L),
      (1L, ts("2024-01-01 00:05:00"), "click", 11L),
      (1L, ts("2024-01-01 00:07:00"), "purchase", 12L), // → click 11
      (1L, ts("2024-01-01 00:09:00"), "click", 13L),    // after: ignored
      (2L, ts("2024-01-01 00:00:00"), "purchase", 20L), // no click → null
      // same-instant click: backward-INCLUSIVE (<=)
      (3L, ts("2024-01-01 00:00:00"), "click", 30L),
      (3L, ts("2024-01-01 00:00:00"), "purchase", 31L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", "click")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(12L) == ((Some(11L), Some(120000000L))))
    assert(out(20L) == ((None, None)))
    assert(out(31L) == ((Some(30L), Some(0L))))
  }

  test("ab test: hand-computed pooled z on known counts") {
    // variant 0: 4 users, 3 convert; variant 1: 4 users, 1 converts
    val ev = (
      (0 until 4).flatMap { i => // even ids → variant 0
        val u = i * 2L
        Seq((u, ts("2024-01-01 00:00:00"), "view")) ++
          (if (i < 3) Seq((u, ts("2024-01-01 01:00:00"), "purchase")) else Nil)
      } ++
      (0 until 4).flatMap { i => // odd ids → variant 1
        val u = i * 2L + 1
        Seq((u, ts("2024-01-01 00:00:00"), "view")) ++
          (if (i < 1) Seq((u, ts("2024-01-01 01:00:00"), "purchase")) else Nil)
      }
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.abTest(
        ev.withColumn("variant", pmod(col("user_id"), lit(2))),
        "user_id", "variant", "event_type", "purchase")
      .collect().head
    assert(out.getAs[Long]("n0") == 4L && out.getAs[Long]("x0") == 3L)
    assert(out.getAs[Long]("n1") == 4L && out.getAs[Long]("x1") == 1L)
    val pp = 4.0 / 8
    val zExp = (0.75 - 0.25) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    val z = out.getAs[Double]("z")
    assert(math.abs(z - zExp) < 1e-6)
    assert(!out.getAs[Boolean]("significant") == (math.abs(zExp) < 1.96))
    assert(out.getAs[String]("variant0") == "0" &&
      out.getAs[String]("variant1") == "1")
  }

  test("ab test: variants are DERIVED from the data, any encoding") {
    // same counts as above but encoded "A"/"B" — side 0 must be the
    // lexicographically smaller variant, identical z
    val ev = (
      (0 until 4).flatMap { i =>
        Seq((i * 2L, ts("2024-01-01 00:00:00"), "view", "A")) ++
          (if (i < 3) Seq((i * 2L, ts("2024-01-01 01:00:00"), "purchase", "A")) else Nil)
      } ++
      (0 until 4).flatMap { i =>
        Seq((i * 2L + 1, ts("2024-01-01 00:00:00"), "view", "B")) ++
          (if (i < 1) Seq((i * 2L + 1, ts("2024-01-01 01:00:00"), "purchase", "B")) else Nil)
      }
    ).toDF("user_id", "ts", "event_type", "variant")
    val out = EventAnalytics.abTest(ev, "user_id", "variant",
      "event_type", "purchase").collect().head
    assert(out.getAs[String]("variant0") == "A" &&
      out.getAs[String]("variant1") == "B")
    assert(out.getAs[Long]("n0") == 4L && out.getAs[Long]("x0") == 3L)
    assert(out.getAs[Long]("n1") == 4L && out.getAs[Long]("x1") == 1L)
  }

  test("ab test: ≠2 distinct variants fails loudly, not a null readout") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", "A"),
      (2L, ts("2024-01-01 00:00:00"), "view", "B"),
      (3L, ts("2024-01-01 00:00:00"), "view", "C")
    ).toDF("user_id", "ts", "event_type", "variant")
    val e = intercept[Exception] {
      EventAnalytics.abTest(ev, "user_id", "variant",
        "event_type", "purchase").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("expected exactly 2 non-null variant values")))
  }

  test("ab test: NULL variant group fails loudly, not silently dropped") {
    // {null, A, B} has count_distinct = 2, so a naive guard passes and
    // quietly excludes null-assigned users from both sides — the guard
    // must count the null group too
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", "A"),
      (2L, ts("2024-01-01 00:00:00"), "view", "B"),
      (3L, ts("2024-01-01 00:00:00"), "view", null)
    ).toDF("user_id", "ts", "event_type", "variant")
    val e = intercept[Exception] {
      EventAnalytics.abTest(ev, "user_id", "variant",
        "event_type", "purchase").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL variant group")))
  }

  test("funnel latency: mean seconds from step 1 per completed step") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:00"), "click"),    // +60 s
      (1L, ts("2024-01-01 00:03:00"), "purchase"), // +180 s
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:03:00"), "click")     // +180 s
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnelLatency(ev, "user_id", "ts",
        "event_type", steps, week)
      .select("step", "users", "avg_seconds")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(2L -> ((2L, 120.0)), 3L -> ((1L, 180.0))))
  }

  test("session paths: gap split, in-session order, step cap, top-k") {
    val ev = Seq(
      // u1 session 1: a>b ; session 2 (gap > 600): a>b
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-01 00:05:00"), "b", 2L),
      (1L, ts("2024-01-01 01:00:00"), "a", 3L),
      (1L, ts("2024-01-01 01:01:00"), "b", 4L),
      // u2: one session a>b
      (2L, ts("2024-01-01 00:00:00"), "a", 5L),
      (2L, ts("2024-01-01 00:01:00"), "b", 6L),
      // u3: 7 events — path truncates to the first 5
      (3L, ts("2024-01-01 00:00:00"), "c", 7L),
      (3L, ts("2024-01-01 00:01:00"), "c", 8L),
      (3L, ts("2024-01-01 00:02:00"), "c", 9L),
      (3L, ts("2024-01-01 00:03:00"), "c", 10L),
      (3L, ts("2024-01-01 00:04:00"), "c", 11L),
      (3L, ts("2024-01-01 00:05:00"), "d", 12L),
      (3L, ts("2024-01-01 00:06:00"), "d", 13L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.sessionPaths(ev, "user_id", "ts",
        "event_type", gapSeconds = 600, maxSteps = 5, k = 20,
        tieBreak = Seq("event_id"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a>b" -> 3L, "c>c>c>c>c" -> 1L))
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
