package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, SortExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Executed-plan audit of the deterministic-bin scaffold
  * (`Relational.withGlobalPrefix` / `withStratumPrefix`): runs the
  * frame and checks, on the FINAL adaptive plan, that every scaffold
  * `_pk` exchange keeps its intended two-consumer shape —
  *
  *  - both branches (window + totals) read ONE materialized exchange:
  *    at least one consumer arrives via `ReusedExchange` (AQE stage
  *    reuse). Losing reuse is silent — the totals branch re-plans as a
  *    second scan + shuffle and nothing fails, the gate just pays the
  *    corpus read twice — so it must be asserted, not assumed.
  *  - exactly ONE consumer sorts (the window's corpus sort); a second
  *    sort consumer is the r13 double-sort regression.
  *  - the totals consumer is a HashAggregate — a SortAggregate here is
  *    the guard-buffer regression (a `first()`-style string buffer
  *    demotes the hash aggregate and the second corpus sort returns).
  *
  * The checks walk the plan TREE per exchange instance (not substring
  * matches over the whole plan), so a legitimate SortAggregate
  * elsewhere in the gate, or a second scaffold instance, audits
  * independently instead of false-failing a global assertion.
  *
  * `expectReuse = false` is the explicit opt-out for call sites where
  * the totals branch is INTENDED to rescan (a frame whose retained
  * payload makes the narrow rescan cheaper than a wide shuffle): the
  * consumer-shape checks still run per exchange, only the
  * shared-materialization requirement is waived. */
object ScaffoldPlanAudit {

  /** Violations found on the executed final plan; empty = clean.
    * Executes the frame (a count job) to force AQE's final plan. */
  def audit(df: DataFrame, expectReuse: Boolean = true): Seq[String] = {
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => { p.execute().count(); p }
    }
    auditFinalPlan(fin, expectReuse)
  }

  /** One consumer of a scaffold exchange: the nearest sort/aggregate
    * ancestor above the exchange's stage node, and whether the read
    * went through a `ReusedExchange`. */
  private case class Consumer(nearest: Option[SparkPlan], viaReuse: Boolean)

  private[graft] def auditFinalPlan(fin: SparkPlan,
      expectReuse: Boolean): Seq[String] = {
    // consumers grouped by the UNDERLYING exchange object (identity):
    // AQE wraps the original in a ShuffleQueryStageExec and reuse in a
    // fresh stage around ReusedExchangeExec, but both unwrap to the
    // same ShuffleExchangeExec instance
    val consumers = new java.util.IdentityHashMap[
      ShuffleExchangeExec, List[Consumer]]()
    val visited = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())

    def isPkExchange(e: ShuffleExchangeExec): Boolean =
      e.outputPartitioning.toString.contains("_pk")

    // unwrap a child to the scaffold exchange it reads, if any; Boolean
    // = crossed a ReusedExchange on the way
    def unwrap(p: SparkPlan, reused: Boolean): Option[(ShuffleExchangeExec, Boolean)] =
      p match {
        case q: QueryStageExec => unwrap(q.plan, reused)
        case r: ReusedExchangeExec => unwrap(r.child, reused = true)
        case a: AQEShuffleReadExec => unwrap(a.child, reused)
        case e: ShuffleExchangeExec if isPkExchange(e) => Some((e, reused))
        case _ => None
      }

    def nearestOrderOp(path: List[SparkPlan]): Option[SparkPlan] =
      path.find {
        case _: SortExec | _: HashAggregateExec | _: ObjectHashAggregateExec |
             _: SortAggregateExec => true
        case _ => false
      }

    def walk(p: SparkPlan, path: List[SparkPlan]): Unit = {
      if (!visited.add(p)) return
      val kids = p match {
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      kids.foreach { c =>
        unwrap(c, reused = false) match {
          case Some((e, viaReuse)) =>
            val prev = Option(consumers.get(e)).getOrElse(Nil)
            consumers.put(e,
              Consumer(nearestOrderOp(p :: path), viaReuse) :: prev)
          // don't descend into the exchange's subtree through a reuse
          // edge — its sorts/aggregates belong to the producing side
          // and would double-count; the original stage's subtree is
          // still walked below the recorded boundary
          case None => walk(c, p :: path)
        }
      }
    }
    walk(fin, Nil)

    val out = scala.collection.mutable.ListBuffer[String]()
    if (consumers.isEmpty)
      out += "no scaffold _pk exchange found in the executed plan"
    consumers.forEach { (e, cs) =>
      val tag = s"_pk exchange ${e.id}"
      if (expectReuse) {
        if (cs.size < 2)
          out += s"$tag: expected both branches on one exchange, saw " +
            s"${cs.size} consumer(s) — AQE stage reuse was lost (the " +
            "totals branch re-planned as a separate scan+shuffle)"
        if (cs.size >= 2 && !cs.exists(_.viaReuse))
          out += s"$tag: two consumers but no ReusedExchange edge"
      }
      val sorts = cs.count(_.nearest.exists(_.isInstanceOf[SortExec]))
      if (sorts > 1)
        out += s"$tag: $sorts sort consumers — the corpus is sorted " +
          "more than once (r13 double-sort regression)"
      cs.filter(_.nearest.exists(_.isInstanceOf[SortAggregateExec]))
        .foreach { _ =>
          out += s"$tag: totals consumer is a SortAggregate " +
            "(guard-buffer regression re-sorting the corpus)"
        }
      cs.filter(_.nearest.isEmpty).foreach { _ =>
        out += s"$tag: consumer with no sort/aggregate ancestor — " +
          "unexpected scaffold shape"
      }
    }
    out.toList
  }
}
