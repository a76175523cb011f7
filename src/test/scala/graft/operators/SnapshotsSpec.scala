package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.RDDBlockId

/** Pins (`localCheckpoint`) are NOT freed by `Dataset.unpersist` —
  * that call only clears CacheManager entries, so iterative operators
  * that relied on it were silently accumulating every superseded
  * round's blocks. [[Snapshots.release]] is the working replacement;
  * this spec is the regression guard for that distinction (deltas only
  * on frames this spec creates — other suites share the session).
  * `Snapshots.sweep` has no isolated unit test on purpose: it releases
  * EVERY persisted RDD in the shared context, which would race
  * concurrently-running suites; the Bench/Verify harness runs exercise
  * it end-to-end. */
class SnapshotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def blockCount(rddId: Int): Int = {
    val bm = org.apache.spark.SparkEnv.get.blockManager
    bm.master.getMatchingBlockIds({
      case RDDBlockId(id, _) => id == rddId
      case _ => false
    }, askStorageEndpoints = true).size
  }

  private def pinnedRddId(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      case p => fail(s"expected a pinned LogicalRDD plan, got $p")
    }

  test("unpersist is a no-op on a pin; release frees its blocks") {
    import spark.implicits._
    val df = (1 to 50000).toDF("x").localCheckpoint(true)
    val id = pinnedRddId(df)
    assert(blockCount(id) > 0, "pin should have materialized blocks")
    df.unpersist(true)
    assert(blockCount(id) > 0,
      "Dataset.unpersist must not free pin blocks (if this starts " +
        "failing, Spark fixed it upstream and Snapshots can simplify)")
    Snapshots.release(df)
    // release is async (blocking = false): poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while (blockCount(id) > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(blockCount(id) == 0, "release must free the pin's blocks")
  }

  test("release is a safe no-op on derived and un-pinned plans") {
    import spark.implicits._
    val pin = (1 to 1000).toDF("y").localCheckpoint(true)
    val id = pinnedRddId(pin)
    val derived = pin.select(col("y") + 1 as "z")
    Snapshots.release(derived) // Project over LogicalRDD: must not touch blocks
    Thread.sleep(200)
    assert(blockCount(id) > 0, "releasing a derived frame must not free its source pin")
    Snapshots.release((1 to 10).toDF("w")) // never pinned: no-op, no throw
    assert(derived.count() == 1000)
    Snapshots.release(pin)
  }

  test("drainViolation: the harness hygiene invariant trips on a leaked pin") {
    // a leaked pin from a gate NOT on the lazy-pin allowlist → violation
    assert(Snapshots.drainViolation(1, 0, "some_gate", Set.empty, "bench")
      .exists(_.contains("leaked 1 pinned snapshot")))
    // the same residual from a DOCUMENTED lazy-pin gate → clean
    assert(Snapshots.drainViolation(2, 0, "pagerank_links",
      Set("pagerank_links"), "verify").isEmpty)
    // nothing leaked → clean
    assert(Snapshots.drainViolation(0, 0, "q1_agg", Set.empty, "bench").isEmpty)
    // blocks surviving a BLOCKING sweep → always a violation, allowlist
    // or not (the sweep itself failed to drain the session)
    assert(Snapshots.drainViolation(0, 3, "pagerank_links",
      Set("pagerank_links"), "verify")
      .exists(_.contains("still holds 3")))
  }

  test("assertDrained end-to-end: sweeps a leaked pin and throws for an" +
      " un-allowlisted gate") {
    import spark.implicits._
    // This test intentionally sweeps the shared session, so it must not
    // run while another suite holds a live pin — everything here is
    // self-contained and synchronous, and other suites release pins
    // before returning; residual>0 from a concurrent suite would only
    // make the expected exception MORE likely, never flip it to pass.
    val leak = (1 to 10000).toDF("x").localCheckpoint(true)
    val id = pinnedRddId(leak)
    assert(blockCount(id) > 0)
    intercept[IllegalStateException] {
      Snapshots.assertDrained(spark, "leaky_gate", Set.empty, "spec")
    }
    assert(blockCount(id) == 0, "assertDrained must still have swept the pin")
    // and a documented lazy-pin gate passes with the same leak shape
    (1 to 100).toDF("x").localCheckpoint(true)
    Snapshots.assertDrained(spark, "leaky_gate", Set("leaky_gate"), "spec")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
