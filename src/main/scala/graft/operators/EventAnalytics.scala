package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event analytics over a (user, timestamp, type) event log —
  * the two classic product-analytics shapes the reference's event
  * tooling answers with serial pandas passes (`agol_wrangler.py`'s
  * per-dataset event tallies), re-expressed as bounded sequences of
  * shuffles so they hold at log scale.
  *
  * Funnel semantics (strict ordered funnel with a conversion window):
  * step 1 fires at the user's EARLIEST occurrence of the first step
  * type; step k fires at the earliest occurrence of the k-th type
  * STRICTLY AFTER step k−1's time and within `windowSeconds` of step
  * 1. This is the standard "first touch, ordered, windowed" funnel —
  * deterministic (no per-run sampling), so an external SQL engine can
  * replay it exactly.
  *
  * Scale shape: the event log is first pruned to the step types (the
  * big win — funnels touch a handful of types out of hundreds), then
  * each step is one conditional min-aggregate joined against the
  * (per-user, so strictly shrinking) survivor set of the previous
  * step. Funnel depth is a small constant, so this is k co-partitioned
  * shuffles on the user key — never a per-user sort, never a
  * collect_list of a user's history (heavy users would OOM a grouped
  * list; a min-aggregate cannot).
  */
object EventAnalytics {

  /** One row per (user, completed step): `step` is 1-based, `step_ts`
    * the time the step fired under the strict ordered-window rule. */
  def funnelStepTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowSeconds > 0, "windowSeconds must be positive")
    val winMicros = windowSeconds * 1000000L
    val ev = events.select(col(userCol).as("_u"),
        unix_micros(col(tsCol)).as("_t"), col(typeCol).as("_y"))
      .filter(col("_y").isin(steps: _*))
    // step 1: earliest first-step event per user; _first anchors the window
    var cur = ev.filter(col("_y") === steps.head)
      .groupBy("_u").agg(min(col("_t")).as("_cur"))
      .withColumn("_first", col("_cur"))
    var acc = cur.select(col("_u"), lit(1L).as("step"), col("_cur").as("_ts"))
    for (k <- 2 to steps.length) {
      // survivors of step k−1 join their candidate step-k events; the
      // min over qualifying times is step k. _first/_cur are unique per
      // user, so min() carries them through the aggregate unchanged.
      cur = ev.filter(col("_y") === steps(k - 1))
        .join(cur.select("_u", "_first", "_cur"), "_u")
        .filter(col("_t") > col("_cur") &&
          col("_t") <= col("_first") + lit(winMicros))
        .groupBy("_u").agg(min(col("_t")).as("_next"),
          min(col("_first")).as("_first"))
        .withColumnRenamed("_next", "_cur")
      acc = acc.unionByName(
        cur.select(col("_u"), lit(k.toLong).as("step"), col("_cur").as("_ts")))
    }
    acc.select(col("_u").as(userCol), col("step"),
      timestamp_micros(col("_ts")).as("step_ts"))
  }

  /** Funnel summary: users reaching each step (a user reaching step k
    * counts at every step ≤ k by construction). */
  def funnelSummary(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame =
    funnelStepTimes(events, userCol, tsCol, typeCol, steps, windowSeconds)
      .groupBy(col("step")).agg(count(lit(1)).as("users"))
      .withColumn("step_name",
        element_at(array(steps.map(lit): _*), col("step").cast("int")))
      .select(col("step"), col("step_name"), col("users"))

  /** Per-user funnel depth: the furthest step reached (≥ 1; users who
    * never fired step 1 are absent). */
  def funnelUsers(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame =
    funnelStepTimes(events, userCol, tsCol, typeCol, steps, windowSeconds)
      .groupBy(col(userCol)).agg(max(col("step")).as("steps_completed"))

  /** Funnel latency: for each step ≥ 2, how many users got there and
    * the mean seconds from step 1 (exact integer µs sums; the division
    * order sum/users/1e6 is pinned so engines agree at 6 dp). */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    val ft = funnelStepTimes(events, userCol, tsCol, typeCol, steps,
      windowSeconds)
    val t1 = ft.filter(col("step") === 1)
      .select(col(userCol).as("_u1"), unix_micros(col("step_ts")).as("_t1"))
    ft.filter(col("step") >= 2)
      .select(col(userCol).as("_u1"), col("step"),
        unix_micros(col("step_ts")).as("_tk"))
      .join(t1, "_u1")
      .groupBy(col("step")).agg(count(lit(1)).as("users"),
        sum(col("_tk") - col("_t1")).as("_sumUs"))
      .select(col("step"),
        element_at(array(steps.map(lit): _*), col("step").cast("int"))
          .as("step_name"),
        col("users"),
        round(col("_sumUs").cast("double") / col("users") / lit(1000000.0), 6)
          .as("avg_seconds"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of
    * the user's first event; a user is retained at offset w if they
    * have ANY event in cohort week + w. Returns one row per
    * (cohort_week, week_offset) with the active-user count, the cohort
    * size, and the retention ratio (6 dp).
    *
    * Scale shape: one aggregate on the user key for first-seen, one
    * co-partitioned join back (AQE reuses the user-key exchange), one
    * aggregate on (cohort, offset) — the classic triangle. Cohort sizes
    * are a per-week table (tiny — one row per calendar week), joined by
    * broadcast so the final agg never reshuffles. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("_u"))
      .agg(min(col(tsCol)).as("_firstTs"))
      .withColumn("_cw", date_trunc("week", col("_firstTs")).cast("date"))
      .select("_u", "_cw")
    val sizes = firsts.groupBy(col("_cw"))
      .agg(count(lit(1)).as("cohort_size"))
    val offsets = events.select(col(userCol).as("_u"), col(tsCol).as("_t"))
      .join(firsts, "_u")
      .withColumn("_ew", date_trunc("week", col("_t")).cast("date"))
      // both sides are week-truncated dates, so the day delta is an
      // exact multiple of 7 and the double division is exact
      .withColumn("week_offset",
        (datediff(col("_ew"), col("_cw")) / 7).cast("long"))
    offsets.groupBy(col("_cw"), col("week_offset"))
      .agg(countDistinct(col("_u")).as("active_users"))
      .join(broadcast(sizes), "_cw")
      .select(col("_cw").as("cohort_week"), col("week_offset"),
        col("active_users"), col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** First-order Markov transition matrix over event types: for every
    * observed (from, to) pair of consecutive events per user (ordered
    * by `tsCol` then `tieBreak`), the count and the row-normalized
    * probability P(to | from), 6 dp.
    *
    * Scale shape: one per-user window (lead) — partitioned by the user
    * key, never a global sort — then a (from, to) count aggregate. The
    * per-from totals are a |type|² -bounded table, joined by broadcast. */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val cnt = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("_tot"))
    cnt.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_tot"), 6).as("p"))
  }

  /** Hourly anomaly detection per event type: bucket counts by hour,
    * then a population z-score against that type's own hourly
    * distribution; |z| ≥ `threshold` flags the hour. Mean/variance are
    * derived from exact integer sums (Σn, Σn², hour count) so any
    * engine replaying the same formula lands on the identical doubles.
    *
    * Scale shape: one (hour, type) count aggregate over the log, then a
    * per-type stats table (|types| rows — broadcast back). A constant
    * hourly-count table per type never needs a window. */
  def hourlyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
      threshold: Double = 2.0): DataFrame = {
    val hourly = events.groupBy(
        date_trunc("hour", col(tsCol)).as("hour"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).as("_h"), sum(col("n")).as("_s"),
      sum(col("n") * col("n")).as("_s2"))
    val mean = col("_s").cast("double") / col("_h")
    val variance = col("_s2").cast("double") / col("_h") - mean * mean
    val z = when(variance <= 0.0, lit(0.0))
      .otherwise((col("n") - mean) / sqrt(variance))
    hourly.join(broadcast(stats), "event_type")
      .select(col("hour"), col("event_type"), col("n"),
        round(z, 6).as("z"), (abs(z) >= threshold).as("is_anomaly"))
  }

  /** BEHAVIORAL ENTROPY per user: Shannon entropy (nats) of the user's
    * first-order transition distribution — bots and scripted traffic
    * collapse toward 0 (one dominant loop), organic browsing runs
    * high. H = ln(total) − Σ c·ln(c) / total, computed from exact
    * integer transition counts in that single pinned form (one log per
    * DISTINCT transition, never one per event), so engines agree at
    * 6 dp. Users with fewer than 2 events have no transitions and are
    * absent. One per-user lead window + two keyed aggregates. */
  def behaviorEntropy(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val counts = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(userCol).as("_u"), col(typeCol).as("_f"),
        col("_next").as("_t"))
      .agg(count(lit(1)).as("_c"))
    counts.groupBy(col("_u"))
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("n_transitions"),
        sum(col("_c") * log(col("_c").cast("double"))).as("_clogc"))
      .select(col("_u").as(userCol),
        col("_n").as("n_moves"), col("n_transitions"),
        round(log(col("_n").cast("double")) - col("_clogc") / col("_n"), 6)
          .as("entropy"))
  }

  /** KAPLAN–MEIER RETENTION CURVE (Kaplan & Meier 1958 — public):
    * subject lifetime = observed activity span per key, bucketed to
    * `bucketSeconds`; survival S(t) = Π_{tⱼ≤t} (1 − dⱼ/nⱼ) with dⱼ the
    * lifetimes ending at tⱼ and nⱼ the at-risk count. Every lifetime
    * here is an observed event (no censoring column in an activity
    * log), so S is the exact empirical tail — the VALUE of KM form is
    * that the factorization extends to censored inputs and that nⱼ/dⱼ
    * are reported per step. The cumulative product runs as
    * exp(Σ ln(1−d/n)) over the BUCKETED duration table (|durations|
    * rows — aggregated, so the ordered window is metadata-sized, the
    * same justification as the skew report). Returns one row per
    * distinct duration bucket: (duration, n_events, n_risk, survival). */
  def survivalCurve(events: DataFrame, userCol: String, tsCol: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // exact integral division (`div`) — a double division + cast could
    // land one bucket off at exact multiples
    val spans = events.groupBy(col(userCol).as("_u"))
      .agg((max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
        .as("_span"))
      .select(col("_u"),
        expr(s"_span div ${bucketSeconds * 1000000L}").as("_t"))
    val n = spans.count()
    val durs = spans.groupBy(col("_t")).agg(count(lit(1)).as("_d"))
    val wPrev = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = durs.withColumn("_nRisk",
      lit(n) - coalesce(sum(col("_d")).over(wPrev), lit(0L)))
    risk
      .withColumn("_ln", when(col("_d") < col("_nRisk"),
        log(lit(1.0) - col("_d").cast("double") / col("_nRisk"))))
      .withColumn("_dead",
        max(when(col("_d") >= col("_nRisk"), 1).otherwise(0)).over(wCum))
      .select(col("_t").as("duration"), col("_d").as("n_events"),
        col("_nRisk").as("n_risk"),
        round(when(col("_dead") === 1, 0.0)
          .otherwise(exp(sum(col("_ln")).over(wCum))), 6).as("survival"))
  }

  /** ROLLING DRIFT DETECTION: per (type, hour), the trailing
    * `windowHours`-bucket mean count tested against the type's own
    * global distribution — z = (rolling mean − μ) / √(σ²/n_window),
    * |z| ≥ threshold flags sustained drift a single-hour z-score
    * ([[hourlyAnomalies]]) misses. The rolling sums are sums of ≤ w
    * INTEGER counts (exact on any engine) and μ/σ² come from exact
    * Σn/Σn², so the whole readout is reproducible at 6 dp.
    *
    * Scale shape: one (hour, type) count, one per-type ROWS window
    * (keyed on the type — constant hourly rows per partition), one
    * broadcast stats join. */
  def rollingDrift(events: DataFrame, tsCol: String, typeCol: String,
      windowHours: Int = 6, threshold: Double = 3.0): DataFrame = {
    require(windowHours >= 1, "windowHours must be >= 1")
    val hourly = events.groupBy(
        date_trunc("hour", col(tsCol)).as("hour"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).as("_h"), sum(col("n")).as("_s"),
      sum(col("n") * col("n")).as("_s2"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-(windowHours - 1).toLong, Window.currentRow)
    val rolled = hourly
      .withColumn("_rsum", sum(col("n")).over(w))
      .withColumn("_rn", count(lit(1)).over(w))
    val mean = col("_s").cast("double") / col("_h")
    val variance = col("_s2").cast("double") / col("_h") - mean * mean
    val rollMean = col("_rsum").cast("double") / col("_rn")
    val z = when(variance <= 0.0, lit(0.0))
      .otherwise((rollMean - mean) / sqrt(variance / col("_rn")))
    rolled.join(broadcast(stats), "event_type")
      .select(col("hour"), col("event_type"), col("n"),
        round(rollMean, 6).as("roll_mean"), round(z, 6).as("z"),
        (abs(z) >= threshold).as("is_drift"))
  }

  /** LAST-TOUCH ATTRIBUTION: each conversion event credits the same
    * user's most recent touch event at or before it ([[Relational
    * .asofJoin]] — one keyed shuffle + carry-forward window, never a
    * range join). Same-µs touch ties pre-aggregate to the max touch id
    * (the as-of contract needs a unique right side). Returns
    * (conversion id, touch id, gap µs) — touch columns null when the
    * user never touched before converting. */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      convType: String, touchType: String): DataFrame = {
    val conversions = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol), col(tsCol))
    val touches = events.filter(col(typeCol) === touchType)
      .groupBy(col(userCol), col(tsCol))
      .agg(max(col(idCol)).as("touch_id"))
    Relational.asofJoin(conversions, touches, userCol, tsCol,
        Seq("touch_id"))
      .select(col(idCol), col("touch_id"),
        (unix_micros(col(tsCol)) - unix_micros(col(tsCol + "_right")))
          .as("gap_us"))
  }

  /** A/B TEST readout: two-proportion pooled z-test of user-level
    * conversion between two variants (standard large-sample test —
    * public statistics). A user converts if they have ANY `convType`
    * event. The two variant values are DERIVED from the data (any
    * type — 0/1, "A"/"B", ...): side 0 is the lexicographically
    * smaller string rendering, and a distinct variant count ≠ 2 fails
    * the job loudly instead of emitting a null readout. All counts are
    * exact integers; the z expression's operation order is pinned so
    * engines agree at 6 dp. Returns ONE row: the two variant values,
    * per-variant exposures/conversions/rates, z, and the
    * |z| ≥ `zCrit` verdict.
    *
    * Scale shape: one user-keyed aggregate (map-side combinable), one
    * #variants-row aggregate, a broadcast of the 1-row variant
    * min/max, one scalar projection. */
  def abTest(events: DataFrame, userCol: String, variantCol: String,
      typeCol: String, convType: String,
      zCrit: Double = 1.96): DataFrame = {
    val users = events
      .groupBy(col(variantCol).cast("string").as("_v"), col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L))
        .as("_conv"))
    val byv = users.groupBy(col("_v"))
      .agg(count(lit(1)).as("_n"), sum(col("_conv")).as("_x"))
    // variant identities come from the (#variants)-row aggregate; the
    // assert_true rides in a filter so the optimizer cannot prune it
    // count_distinct skips NULLs, so a NULL variant group must be
    // counted separately or {null,'A','B'} would pass the ≠2 guard and
    // silently drop the null-assigned users from both sides
    val mm = byv.agg(count_distinct(col("_v")).as("_nv"),
      max(col("_v").isNull.cast("int")).as("_hasnull"),
      min(col("_v")).as("_v0"), max(col("_v")).as("_v1"))
    val flat = byv.crossJoin(broadcast(mm))
      .filter(assert_true(col("_nv") === 2 && col("_hasnull") === 0,
        concat(lit("abTest: expected exactly 2 non-null variant values, found "),
          col("_nv"), when(col("_hasnull") === 1,
            lit(" plus a NULL variant group")).otherwise(lit("")))).isNull)
      .groupBy(col("_v0").as("variant0"), col("_v1").as("variant1"))
      .agg(
        sum(when(col("_v") === col("_v0"), col("_n"))).as("n0"),
        sum(when(col("_v") === col("_v0"), col("_x"))).as("x0"),
        sum(when(col("_v") === col("_v1"), col("_n"))).as("n1"),
        sum(when(col("_v") === col("_v1"), col("_x"))).as("x1"))
    val p0 = col("x0").cast("double") / col("n0")
    val p1 = col("x1").cast("double") / col("n1")
    val pp = (col("x0") + col("x1")).cast("double") / (col("n0") + col("n1"))
    // pooled p of 0 or 1 (nobody / everybody converts) has zero
    // variance — the test is undefined; report z = 0, not significant
    val denom = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val z = when(denom === 0.0, lit(0.0)).otherwise((p0 - p1) / denom)
    flat.select(col("variant0"), col("variant1"),
      col("n0"), col("x0"), col("n1"), col("x1"),
      round(p0, 6).as("rate0"), round(p1, 6).as("rate1"),
      round(z, 6).as("z"), (abs(z) >= zCrit).as("significant"))
  }

  /** OHLC BARS: per (group, calendar bucket) open/high/low/close of a
    * value series — the classic downsampling for any numeric telemetry
    * (the reference renders per-dataset time series the same way, one
    * pandas resample at a time). Open/close are the values at the
    * (ts, tieBreak)-first/last rows, picked via min/max over an
    * ordering struct — ONE hash aggregate, no per-bucket sort, no
    * window. */
  def ohlcBars(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, bucket: String = "day",
      tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (unix_micros(col(tsCol)) +: tieBreak.map(col)) :+
      col(valueCol)
    val base = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(col(groupCol).as("_g"),
        date_trunc(bucket, col(tsCol)).as("bucket"),
        struct(ord.head.as("_t") +: ord.tail.zipWithIndex.map {
          case (c, i) => c.as(s"_o$i") }: _*).as("_s"),
        col(valueCol).as("_v"))
    base.groupBy(col("_g"), col("bucket"))
      .agg(min(col("_s")).getField(s"_o${ord.size - 2}").as("open"),
        max(col("_v")).as("high"), min(col("_v")).as("low"),
        max(col("_s")).getField(s"_o${ord.size - 2}").as("close"),
        count(lit(1)).as("n"))
      .select(col("_g").as(groupCol), col("bucket"), col("open"),
        col("high"), col("low"), col("close"), col("n"))
  }

  /** TIME-WEIGHTED AVERAGE per key: each value holds from its event
    * until the next one (a right-open step function); TWA = Σ vᵢ·Δtᵢ
    * over the observed span. The standard irregular-sampling mean —
    * plain AVG over-weights bursts. Keys with a single event (zero
    * span) are dropped. One per-key window (lead) + one aggregate. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col("_k"))
      .orderBy((col("_t") +: tieBreak.map(col)): _*)
    val baseCols = Seq(col(keyCol).as("_k"),
      unix_micros(col(tsCol)).as("_t"), col(valueCol).as("_v")) ++
      tieBreak.map(col)
    val base = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(baseCols: _*)
    base.withColumn("_dt", lead(col("_t"), 1).over(w) - col("_t"))
      .groupBy(col("_k"))
      .agg(sum(col("_v") * col("_dt")).as("_wsum"),
        (max(col("_t")) - min(col("_t"))).as("_span"))
      .filter(col("_span") > 0)
      .select(col("_k").as(keyCol),
        round(col("_wsum") / col("_span"), 6).as("twa"),
        (col("_span") / lit(1000000L)).as("span_s"))
  }

  /** Equi-width histogram per group: `bins` buckets spanning the
    * group's own [min, max] (the last bin is max-inclusive). Bounds
    * come from one aggregate and broadcast back; bucketing is a pure
    * projection, so the whole op is two keyed aggregates. Returns
    * (group, bin, lo, hi, n) — empty bins are absent (sparse form). */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val vals = df.select(col(groupCol).as("_g"),
        col(valueCol).cast("double").as("_x"))
      .filter(col("_x").isNotNull && !isnan(col("_x")))
    val bounds = vals.groupBy(col("_g"))
      .agg(min(col("_x")).as("_lo"), max(col("_x")).as("_hi"))
    val width = (col("_hi") - col("_lo")) / bins
    val bin = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(floor((col("_x") - col("_lo")) / width),
        lit(bins - 1L)).cast("long"))
    vals.join(broadcast(bounds), "_g")
      .withColumn("_bin", bin)
      .groupBy(col("_g"), col("_bin"), col("_lo"), col("_hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("_g").as(groupCol), col("_bin").as("bin"),
        round(col("_lo") + col("_bin") * ((col("_hi") - col("_lo")) / bins), 6)
          .as("lo"),
        round(col("_lo") + (col("_bin") + 1) * ((col("_hi") - col("_lo")) / bins), 6)
          .as("hi"),
        col("n"))
  }

  /** KEY-SKEW REPORT: the partitioning diagnostic — per key column of
    * interest, how concentrated the distribution is. Emits one row per
    * group with the exact key count, total rows, the heaviest key's
    * share, and the Gini coefficient from the sorted exact counts
    * (G = Σ(2i − n − 1)·x_i / (n·Σx), i ascending by (count, key)) —
    * all integer math until two final divisions, so engines agree at
    * 6 dp. The rank window partitions by nothing here ONLY because the
    * key-count table is |keys| rows (already aggregated); the raw data
    * never sorts. */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("_k"))
      .agg(count(lit(1)).as("_c"))
    val ranked = counts.select(col("_k"), col("_c"),
      row_number().over(Window.orderBy(col("_c"), col("_k")))
        .cast("long").as("_i"),
      count(lit(1)).over(Window.partitionBy()).as("_n"),
      sum(col("_c")).over(Window.partitionBy()).as("_tot"))
    ranked.agg(
        min(col("_n")).as("n_keys"), min(col("_tot")).as("n_rows"),
        max(col("_c")).as("max_count"),
        sum((lit(2L) * col("_i") - col("_n") - 1L) * col("_c")).as("_gnum"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        round(col("max_count").cast("double") / col("n_rows"), 6)
          .as("max_share"),
        round(col("_gnum").cast("double") / (col("n_keys") * col("n_rows")), 6)
          .as("gini"))
  }

  /** Top-k session paths: gap-sessionize ([[Sessionize.assignSessions]]
    * semantics), take each session's first `maxSteps` event types in
    * (ts, tieBreak) order as a ">"-joined path string, and count
    * sessions per path. The classic "how do users move" journey report.
    *
    * Scale shape: sessionization is the per-user window; the path
    * builds from a per-session sorted list BOUNDED at `maxSteps` + the
    * session's own size (sessions are gap-bounded — a key whose list
    * could be unbounded should be pre-capped upstream); top-k rides
    * TakeOrdered, never a global sort. */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gapSeconds: Long, maxSteps: Int = 5,
      k: Int = 20, tieBreak: Seq[String] = Nil): DataFrame = {
    require(maxSteps > 0 && k > 0, "bad caps")
    val sess = Sessionize.assignSessions(events, userCol, tsCol,
      gapSeconds, tieBreak)
    // deterministic in-session order: sort the collected (ts, tie...,
    // type) structs lexicographically, then project the type sequence
    val orderCols = (col(tsCol) +: tieBreak.map(col)) :+ col(typeCol)
    val path = sess.groupBy(col(userCol), col("session_id"))
      .agg(sort_array(collect_list(struct(orderCols: _*))).as("_evs"))
      .select(concat_ws(">", slice(
        col("_evs").getField(typeCol), 1, maxSteps)).as("path"))
    path.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }
}
