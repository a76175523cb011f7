package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def rnd(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pmi: hand-computed collocation; df band and pair floor filter") {
    // "strong coffee" co-occur in 3 of 6 docs; "tea" appears in 2 but
    // never alongside "strong"; hapax "x9" must drop (minDf 2)
    val docs = Seq(
      (1L, "strong coffee now"), (2L, "strong coffee later"),
      (3L, "strong coffee x9"), (4L, "tea now"),
      (5L, "tea later"), (6L, "strong alone")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(docs, "text", "doc_id",
        minDf = 2L, maxDf = 10L, maxTokensPerDoc = 32, minPair = 2L, k = 50)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // df: strong=4, coffee=3, now=2, later=2, tea=2; x9 df=1 dropped
    assert(out(("coffee", "strong")) ==
      ((3L, rnd(math.log(6.0 * 3 / (3 * 4))))))
    assert(!out.keySet.exists(p => p._1 == "x9" || p._2 == "x9"))
    assert(!out.contains(("strong", "tea")))
    // (coffee, now) co-occur once only → below minPair
    assert(!out.contains(("coffee", "now")))
  }

  test("pmi: per-doc token cap bounds the pair generator") {
    val wide = (1 to 3).map(i =>
      (i.toLong, (0 until 40).map(j => f"tok$j%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(wide, "text", "doc_id",
      minDf = 2L, maxDf = 10L, maxTokensPerDoc = 10, minPair = 2L, k = 1000)
    // 10 capped tokens → exactly C(10,2) = 45 pairs, not C(40,2)
    assert(out.count() == 45)
  }

  test("rank normalize: mid-rank quantiles per group, ties by id") {
    val docs = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L),
      ("a", 4L, 30L), ("b", 5L, 7L)).toDF("source", "doc_id", "score")
    val out = TextAnalysis.rankNormalize(docs, "source", "doc_id", "score")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(out == Map(1L -> 0.125, 3L -> 0.375, 2L -> 0.625,
      4L -> 0.875, 5L -> 0.5))
  }

  test("distinct ngrams: repeated text collapses the ratio") {
    val docs = Seq(
      ("fresh", "alpha beta gamma delta"),       // 3 distinct bigrams
      ("loop", "spam spam spam spam spam")       // 4 bigrams, 1 distinct
    ).toDF("source", "text")
    val out = TextAnalysis.distinctNgrams(docs, "source", "text", n = 2,
        exact = true)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("fresh") == ((3L, 3L, 1.0)))
    assert(out("loop") == ((4L, 1L, 0.25)))
  }

  test("distinct ngrams: default KMV sketch is exact below k and " +
      "within 3/sqrt(k) relative error above it") {
    // below k distinct grams the bottom-k set IS the distinct set —
    // the sketch answer must equal the exact one
    val small = Seq(
      ("fresh", "alpha beta gamma delta"),
      ("loop", "spam spam spam spam spam")
    ).toDF("source", "text")
    val sk = TextAnalysis.distinctNgrams(small, "source", "text", n = 2)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(sk("fresh") == ((3L, 3.0, 1.0)))
    assert(sk("loop") == ((4L, 1.0, 0.25)))
    // above k: ~2000 distinct bigrams against k=64 — the estimate must
    // land within 3/sqrt(k-2) ≈ 38% (Bar-Yossef et al. give
    // 1/sqrt(k-2) standard error; 3 sigma bounds a deterministic hash)
    val big = (0 until 2000).map(i => ("big", s"tok$i tok${i + 1}"))
      .toDF("source", "text")
    val est = TextAnalysis.distinctNgrams(big, "source", "text", n = 2,
        k = 64)
      .as[(String, Long, Double, Double)].collect().head
    val exact = TextAnalysis.distinctNgrams(big, "source", "text", n = 2,
        exact = true)
      .as[(String, Long, Long, Double)].collect().head._3
    assert(math.abs(est._3 - exact) / exact <= 3.0 / math.sqrt(62.0),
      s"est ${est._3} vs exact $exact")
  }

  test("lexical richness: TTR and hapax share from exact counts") {
    val docs = Seq(("a", "x x x y z"), ("b", "q q")).toDF("source", "text")
    val out = TextAnalysis.lexicalRichness(docs, "source", "text")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("a") == ((5L, 3L, 2L, 0.6, rnd(2.0 / 3))))
    assert(out("b") == ((2L, 1L, 0L, 0.5, 0.0)))
  }

  test("embedding quality: zero norms, NaNs, and mixed dims surface") {
    val vecs = Seq(
      (0, Seq(3.0f, 4.0f)),
      (0, Seq(0.0f, 0.0f)),                 // zero norm
      (0, Seq(Float.NaN, 1.0f)),            // NaN carrier
      (1, Seq(1.0f, 0.0f, 0.0f))            // different dim
    ).toDF("label", "embedding")
    val out = Similarity.embeddingQuality(vecs, "embedding", "label")
      .collect().map(r => r.getInt(0) -> r).toMap
    val g0 = out(0)
    assert(g0.getAs[Long]("n_vectors") == 3L)
    assert(g0.getAs[Long]("dim_min") == 2L && g0.getAs[Long]("dim_max") == 2L)
    assert(g0.getAs[Long]("n_zero") == 1L && g0.getAs[Long]("n_nan") == 1L)
    assert(out(1).getAs[Double]("mean_norm") == 1.0)
  }

  test("zipf: exact power law recovers its exponent") {
    // counts c(r) = round(1000 * r^-1) for r = 1..8 over one group:
    // tokens t1..t8 with those frequencies
    val rows = (1 to 8).flatMap { r =>
      val c = math.max(1, math.round(1000.0 * math.pow(r, -1.0)).toInt)
      Seq.fill(c)(("g1", f"t$r%02d"))
    }
    // token names ordered so rank order == construction order
    val docs = rows.groupBy(identity).toSeq.map { case ((g, t), xs) =>
      (g, Seq.fill(xs.size)(t).mkString(" ")) }.toDF("source", "text")
    val out = TextAnalysis.zipfSlope(docs, "source", "text", topN = 50)
      .as[(String, Long, Double, Double)].collect().head
    assert(out._2 == 8L)
    assert(math.abs(out._3 - (-1.0)) < 0.01, s"slope ${out._3}")
    assert(math.abs(out._4 - math.log(1000.0)) < 0.05)
  }
}
