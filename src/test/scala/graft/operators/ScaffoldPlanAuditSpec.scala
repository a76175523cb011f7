package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.ScaffoldPlanAudit

/** The executed-plan scaffold audit itself: reuse-held frames audit
  * clean, and a frame whose retained payload silently loses AQE stage
  * reuse (the documented degradation — the totals branch re-plans as a
  * second scan+shuffle and nothing fails) is reported LOUDLY, with the
  * explicit opt-out for call sites where the rescan is intended. */
class ScaffoldPlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame = (1L to 2000L).map(i => (i, s"text-$i"))
    .toDF("id", "text").repartition(4)

  test("scaffold audit: pruned frame keeps exchange reuse and audits clean") {
    // downstream keeps only (id, rn): both branches prune to the order
    // key, the exchanges canonicalize equal, AQE reuses the stage
    val q = Relational.globalRowNumber(frame, Seq(col("id")))
      .select("id", "rn")
    val viol = ScaffoldPlanAudit.audit(q)
    assert(viol.isEmpty, viol.mkString("; "))
  }

  test("scaffold audit: undeclared retained payload loses reuse — reported loudly, opt-out waives") {
    // downstream ALSO keeps `text`: the data branch's exchange carries
    // it, the totals branch prunes it, the subtrees stop canonicalizing
    // equal, and the totals branch silently re-scans. The audit must
    // say so — this is the degradation nothing else trips on.
    val q = Relational.globalRowNumber(frame, Seq(col("id")))
      .select("id", "text", "rn")
    val viol = ScaffoldPlanAudit.audit(q)
    assert(viol.exists(_.contains("reuse was lost")),
      s"expected a loud reuse-loss report, got: ${viol.mkString("; ")}")
    // the explicit opt-out for an intended-rescan call site still
    // checks consumer shape (one sort, hash totals) — just not reuse
    val waived = ScaffoldPlanAudit.audit(q, expectReuse = false)
    assert(waived.isEmpty, waived.mkString("; "))
  }
}
