package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for PINNED SNAPSHOTS (`localCheckpoint(true)`).
  *
  * `Dataset.unpersist` only clears CacheManager entries (`.persist`/
  * `.cache`); a checkpointed frame's blocks are owned by the underlying
  * `LogicalRDD` and survive it, living in the block manager until the
  * session dies. Iterative operators that pin one state per round
  * (PageRank, coreness, label propagation, union-find, BPE training)
  * would otherwise accumulate every superseded round's blocks —
  * harmless on a short-lived job, but on a long-lived session (or a
  * 1000-executor cluster where storage memory competes with execution
  * memory) stale round states steal exactly the memory the next round's
  * shuffle wants, and at small heaps they surface as GC/spill noise.
  *
  * [[release]] frees the blocks behind a pinned frame. Callers must
  * only release states that are DEAD: the next round's pin is eager, so
  * once round i+1 is materialized, round i's snapshot has no remaining
  * consumer. Releasing a frame that something still references is a
  * job-killing bug (lineage was truncated — the blocks cannot be
  * recomputed), which is why this is an explicit opt-in helper, not a
  * blanket finalizer.
  *
  * RELIABILITY TRADE (guide §5): `localCheckpoint` blocks are
  * NON-RELIABLE storage — on a real cluster an executor loss destroys
  * them, and because lineage was truncated the job FAILS instead of
  * recomputing. The operators here accept that deliberately: every pin
  * is a narrow intermediate (feature/term/edge index, orders of
  * magnitude smaller than the text it derives from), created and
  * released inside one operator call, so the exposure window is one
  * call and the retry is the call itself. Where recompute-on-loss must
  * survive executor churn (very long iterative jobs on preemptible
  * nodes), swap the pin for `persist(MEMORY_AND_DISK)` + an explicit
  * unpersist — same hygiene contract, lineage kept — or a reliable
  * `checkpoint()` to the cluster FS. */
object Snapshots {
  /** Free the block-manager storage behind a `localCheckpoint`ed frame.
    * No-op for plans that are not pinned snapshots. */
  def release(df: Dataset[_]): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Release EVERY persisted RDD in the session — the gate-harness
    * hygiene call between INDEPENDENT queries. Operators whose returned
    * frame lazily references a pin (the triangle orientation, the
    * PPJoin candidate set) cannot release it themselves: only the
    * consumer knows when the result is drained.
    * A harness that runs hundreds of such queries in one session
    * (Bench: ~260 gates × 5+ iterations) otherwise accumulates every
    * abandoned pin for the session's lifetime — storage blocks stealing
    * the unified memory the NEXT query's shuffle wants, surfacing as
    * heap-size-dependent drift on iterative gates. Only call this when
    * nothing cached/pinned is intentionally shared across queries.
    *
    * Returns the number of persisted RDDs it had to remove — the
    * RESIDUAL a well-behaved gate leaves at zero. Harnesses assert on
    * it ([[graft.Verify]]/[[graft.Bench]]): a nonzero residual from a
    * gate outside the documented lazy-pin allowlist is the
    * unpersist-no-op bug class resurfacing, and fails loudly instead
    * of being silently cleaned. Pass `blocking = true` in timed
    * harness paths so asynchronous block removal cannot bleed into the
    * next iteration's timed window. */
  def sweep(spark: org.apache.spark.sql.SparkSession,
      blocking: Boolean = false): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs.values.toSeq
    rdds.foreach(_.unpersist(blocking))
    rdds.size
  }

  /** The harness STORAGE-HYGIENE INVARIANT (Verify/Bench, after each
    * drained gate): blocking-sweep the session and FAIL LOUDLY if the
    * gate left pins behind without being on the documented lazy-pin
    * allowlist — the unpersist-no-op bug class (rounds 10-12) cost two
    * rounds of bench drift precisely because leaks were silently
    * cleaned here. `warnOnly` is the allowlist-rediscovery mode
    * (print-and-continue). */
  def assertDrained(spark: org.apache.spark.sql.SparkSession, gate: String,
      allowlist: Set[String], harness: String,
      warnOnly: Boolean = false): Unit = {
    val residual = sweep(spark, blocking = true)
    val left = spark.sparkContext.getPersistentRDDs.size
    drainViolation(residual, left, gate, allowlist, harness).foreach { msg =>
      if (warnOnly && left == 0) System.err.println(msg)
      else throw new IllegalStateException(msg)
    }
  }

  /** The [[assertDrained]] decision, pure so it can be unit-tested
    * without sweeping the (suite-shared) session: `residual` = pins the
    * sweep removed, `stillHeld` = persisted RDDs remaining AFTER the
    * blocking sweep (always a violation — something re-pinned or the
    * sweep lost a race). Returns the violation message, or None. */
  private[graft] def drainViolation(residual: Int, stillHeld: Int,
      gate: String, allowlist: Set[String], harness: String): Option[String] =
    if (stillHeld > 0) Some(
      s"[$harness] $gate: block manager still holds $stillHeld RDD(s) " +
      "after a blocking sweep")
    else if (residual > 0 && !allowlist.contains(gate)) Some(
      s"[$harness] $gate leaked $residual pinned snapshot(s) — release " +
      "them in the operator or add the gate to SparkEntry.lazyPinGates " +
      "with a reason")
    else None
}
