package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class RetrievalMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def log2(x: Double): Double = math.log(x) / math.log(2.0)
  def rnd(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("metrics match hand computation; no-hit and no-qrel queries") {
    val run = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), // q1: rel, miss, rel
      (2L, 10L, 1L), (2L, 20L, 2L),                // q2: zero hits
      (3L, 10L, 1L)                                // q3: not in qrels
    ).toDF("qid", "vec_id", "rank")
    val qrels = Seq(
      (1L, 10L), (1L, 30L), (1L, 40L),             // q1: 3 relevant
      (2L, 40L)                                    // q2: 1 relevant
    ).toDF("qid", "vec_id")
    val out = Similarity.retrievalMetrics(run, qrels, k = 3)
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

    val dcg1 = 1.0 / log2(2) + 1.0 / log2(4)
    val idcg3 = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    assert(out(1L) == ((rnd(dcg1 / idcg3), 1.0, rnd(2.0 / 3), rnd(2.0 / 3))))
    assert(out(2L) == ((0.0, 0.0, 0.0, 0.0)))
    assert(!out.contains(3L), "queries without qrels are dropped")
  }

  test("mmr: the diverse candidate beats a redundant higher-scored one") {
    // d1 and d2 point the same way; d3 is orthogonal with a lower
    // score — pure ranking gives d1,d2,d3 but MMR must pick d3 second
    val cands = Seq(
      (1L, 1L, 0.90, Seq(1.0, 0.0)),
      (1L, 2L, 0.89, Seq(1.0, 0.001)),
      (1L, 3L, 0.50, Seq(0.0, 1.0))
    ).toDF("qid", "vec_id", "score", "embedding")
    val out = Similarity.mmrRerank(cands, "qid", "vec_id", "score",
        "embedding", k = 3, lambda = 0.7)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._3)
    def rnd5(x: Double): Double = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(out(0)._4 == rnd5(0.7 * 0.90))
    assert(out(1)._4 == rnd5(0.7 * 0.50)) // orthogonal → zero penalty
  }

  test("mmr: k caps at the candidate count; ties break to smaller id") {
    val cands = Seq(
      (7L, 5L, 0.5, Seq(1.0, 0.0)),
      (7L, 4L, 0.5, Seq(0.0, 1.0))
    ).toDF("qid", "vec_id", "score", "embedding")
    val out = Similarity.mmrRerank(cands, "qid", "vec_id", "score",
        "embedding", k = 10, lambda = 0.7)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._3)
    assert(out.length == 2)
    assert(out(0)._2 == 4L, "equal scores: smaller id first")
  }

  test("rank rows beyond k are ignored; idcg caps at min(nrel, k)") {
    val run = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), (1L, 40L, 4L)
    ).toDF("qid", "vec_id", "rank")
    // only ONE relevant doc → idcg = 1/log2(2) = 1; a hit at rank 1
    // makes ndcg exactly 1 even with k=2
    val qrels = Seq((1L, 10L)).toDF("qid", "vec_id")
    val out = Similarity.retrievalMetrics(run, qrels, k = 2)
      .as[(Long, Double, Double, Double, Double)].collect().head
    assert(out == ((1L, 1.0, 1.0, 0.5, 1.0)))
  }
}
