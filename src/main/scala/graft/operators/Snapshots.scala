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
  * blanket finalizer. */
object Snapshots {
  /** Free the block-manager storage behind a `localCheckpoint`ed frame.
    * No-op for plans that are not pinned snapshots. */
  def release(df: Dataset[_]): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Release EVERY persisted RDD in the session — the gate-harness
    * hygiene call between INDEPENDENT queries. Operators whose returned
    * frame lazily references a pin (the two-pass prefix scaffold, the
    * triangle orientation, the PPJoin candidate set) cannot release it
    * themselves: only the consumer knows when the result is drained.
    * A harness that runs hundreds of such queries in one session
    * (Bench: ~260 gates × 5+ iterations) otherwise accumulates every
    * abandoned pin for the session's lifetime — storage blocks stealing
    * the unified memory the NEXT query's shuffle wants, surfacing as
    * heap-size-dependent drift on iterative gates. Only call this when
    * nothing cached/pinned is intentionally shared across queries. */
  def sweep(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
