package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** KMV sketch: exact below k, estimate quality past it, partition
  * invariance (the mergeability proof), null handling. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], k: Int, parts: Int = 4) =
    Sketches.kmvDistinct(
      rows.toDF("g", "v").repartition(parts), "g", "v", k)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getInt(2))).toMap

  test("below k distinct values the sketch is EXACT") {
    val rows = (1L to 40L).map(v => ("a", v)) ++
      (1L to 40L).map(v => ("a", v)) ++ // duplicates don't count
      (1L to 7L).map(v => ("b", v))
    val got = run(rows, k = 64)
    assert(got("a") == ((40.0, 40)))
    assert(got("b") == ((7.0, 7)))
  }

  test("past k the estimate lands within 3 standard errors") {
    val n = 5000
    val rows = (1L to n.toLong).map(v => ("g", v))
    for (k <- Seq(64, 256)) {
      val (est, kept) = run(rows, k)("g")
      assert(kept == k)
      val se = n / math.sqrt(k - 2.0) // KMV relative error ~ 1/sqrt(k-2)
      assert(math.abs(est - n) < 3 * se, s"k=$k est=$est")
    }
  }

  test("partition-invariant: 1, 4, 32 partitions give the identical answer") {
    val rows = (1L to 3000L).map(v => ("g", v * 17 % 997)) // dups + spread
    val answers = Seq(1, 4, 32).map(p => run(rows, k = 32, parts = p)("g"))
    assert(answers.distinct.size == 1, s"answers: $answers")
  }

  test("resemblance: disjoint ~0, identical = 1, half-overlap tracks truth") {
    val rows =
      (1L to 800L).map(v => ("a", v)) ++
      (1L to 800L).map(v => ("b", v)) ++            // b == a → J = 1
      (401L to 1200L).map(v => ("c", v)) ++          // |a∩c|/|a∪c| = 400/1200
      (5001L to 5800L).map(v => ("d", v))            // disjoint from a
    val j = Sketches.kmvResemblance(rows.toDF("g", "v"), "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(j(("a", "b")) == 1.0)
    assert(math.abs(j(("a", "c")) - 400.0 / 1200.0) < 0.1, j(("a", "c")))
    assert(j(("a", "d")) < 0.05)
    // symmetric emission: only g1 < g2 pairs, all 6 of them
    assert(j.size == 6 && j.keys.forall { case (x, y) => x < y })
  }

  test("resemblance is partition-invariant (sketch mergeability)") {
    val rows = (1L to 1000L).map(v => ("a", v)) ++
      (500L to 1500L).map(v => ("b", v))
    val answers = Seq(1, 8, 32).map { p =>
      Sketches.kmvResemblance(rows.toDF("g", "v").repartition(p),
        "g", "v", k = 64).collect().map(_.getDouble(2)).toSeq
    }
    assert(answers.distinct.size == 1)
  }

  test("nulls don't count; empty groups don't appear") {
    val df = Seq(("a", java.lang.Long.valueOf(1L)), ("a", null),
      ("b", null)).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, "g", "v", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.0)) // b had only nulls → filtered out
  }

  test("containment: subset ≈ 1 one way, |A|/|B| the other; disjoint ≈ 0") {
    val rows = (1L to 200L).map(v => ("a", v)) ++ // A ⊂ B, |A|/|B| = 0.1
      (1L to 2000L).map(v => ("b", v)) ++
      (100001L to 100400L).map(v => ("d", v)) // disjoint from both
    val c = Sketches.kmvContainment(rows.toDF("g", "v"), "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(c(("a", "b")) > 0.85, c(("a", "b"))) // A fully inside B
    assert(math.abs(c(("b", "a")) - 0.1) < 0.08, c(("b", "a")))
    assert(c(("a", "d")) < 0.05 && c(("d", "a")) < 0.05)
    assert(c.size == 6) // ordered pairs, g1 != g2
  }

  // ---- Count-Min ----

  private def cmsEst(sk: org.apache.spark.sql.DataFrame,
      probes: Seq[Long], depth: Int, width: Int): Map[Long, Long] = {
    import spark.implicits._
    Sketches.cmsEstimate(sk, probes.toDF("v"), "v", depth, width)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("count-min never underestimates; wide sketch is mostly exact, absent values 0") {
    val rows = (1 to 100).flatMap(v => Seq.fill(v % 7 + 1)(v.toLong))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = Sketches.cmsSketch(rows.toDF("v"), "v", depth = 4, width = 4096)
    val est = cmsEst(sk, (1L to 120L).toSeq, 4, 4096)
    (1L to 120L).foreach { v =>
      assert(est(v) >= truth.getOrElse(v, 0L), s"underestimate at $v")
    }
    // 4 independent rows over 4096 buckets for 100 values: collisions
    // in ALL rows at once are vanishingly rare
    assert((1L to 100L).count(v => est(v) == truth(v)) >= 97)
    assert((101L to 120L).count(v => est(v) == 0L) >= 17)
  }

  test("count-min narrow sketch still bounds: estimates only ever exceed truth") {
    val rows = (1L to 2000L).map(v => v % 50)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = Sketches.cmsSketch(rows.toDF("v"), "v", depth = 3, width = 16)
    val est = cmsEst(sk, (0L to 49L).toSeq, 3, 16)
    (0L to 49L).foreach(v => assert(est(v) >= truth(v)))
  }

  test("count-min merge equals a single-pass sketch over the union") {
    val a = (1L to 50L).toDF("v")
    val b = (25L to 80L).toDF("v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(a, "v", 3, 256), Sketches.cmsSketch(b, "v", 3, 256))
    val whole = Sketches.cmsSketch(a.unionByName(b), "v", 3, 256)
    assert(rows(merged) == rows(whole))
  }

  test("count-min build is partition-invariant and bounded at depth×width rows") {
    val rows = (1L to 5000L).map(_ % 300)
    val sketches = Seq(1, 4, 32).map { p =>
      Sketches.cmsSketch(rows.toDF("v").repartition(p), "v", 4, 128)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(sketches.distinct.size == 1)
    assert(sketches.head.size <= 4 * 128)
  }
}
