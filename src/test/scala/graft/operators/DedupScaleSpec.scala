package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Skew-guard behavior of the dedup band joins: a duplicate-heavy corpus
  * (thousands of identical docs sharing every band) must NOT produce a
  * B² pair explosion on one reduce task. */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def identicalDocs(n: Int) =
    (1L to n.toLong).map(i => (i, "the same boilerplate page body repeated verbatim across the crawl"))
      .toDF("doc_id", "text")

  test("minhash band join caps hot buckets: 10k identical docs stay bounded") {
    // Uncapped this is C(10000,2) ≈ 50M pairs; capped at 20 members per
    // bucket it is C(20,2) = 190, from the 20 lowest ids (deterministic).
    val pairs = Dedup.minhashLshPairs(identicalDocs(10000), "text", "doc_id",
      maxBucket = 20)
    assert(pairs.count() == 190)
    val maxId = pairs.agg(max(col("id2"))).head().getLong(0)
    assert(maxId == 20L)
  }

  test("simhash band join caps hot buckets") {
    val pairs = Dedup.simhashPairs(identicalDocs(5000), "text", "doc_id",
      maxBucket = 15)
    assert(pairs.count() == 105) // C(15,2)
  }

  test("default cap (1000) leaves modest buckets untouched") {
    // 200 identical docs < cap → the full C(200,2) pair set survives.
    val pairs = Dedup.minhashLshPairs(identicalDocs(200), "text", "doc_id")
    assert(pairs.count() == 19900)
  }

  test("drop accounting is lazy: observation metric reports drops, no extra job") {
    @volatile var observed: Option[Long] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("minhash_cap_"))
            observed = Some(row.getAs[Long]("dropped_members"))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Dedup.minhashLshPairs(identicalDocs(100), "text", "doc_id", maxBucket = 10).count()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      // 100 members per bucket × 16 bands, 10 kept each → 90×16 dropped
      // per evaluation; the self-join may evaluate the subtree once (reused
      // exchange) or twice, so assert the per-evaluation multiple.
      assert(observed.exists(d => d > 0 && d % (90L * 16) == 0),
        s"observed=$observed")
    } finally spark.listenerManager.unregister(listener)
  }

  test("documented pipeline: exact dedup first keeps the cap from biting real structure") {
    // 1000 copies of doc A + one genuine near-dup pair (B, B'): exact
    // dedup collapses the copies, then LSH finds the near-dup untouched.
    val docs = identicalDocs(1000).union(Seq(
      (100001L, "a genuinely distinct document about spark shuffle internals and skew"),
      (100002L, "a genuinely distinct document about spark shuffle internals and skew joins")
    ).toDF("doc_id", "text"))
    val exact = Dedup.exact(docs, "text", "doc_id")
    assert(exact.count() == 3) // A(1), B, B'
    val pairs = Dedup.minhashLshPairs(exact, "text", "doc_id")
    assert(pairs.filter(col("id1") === 100001L && col("id2") === 100002L).count() == 1)
  }
}
