package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch harness (not a spec): inspects the scaffold's final adaptive
  * plan and timing — run manually with Test/runMain. */
object ScaffoldScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables.load(spark, sf, "documents")
    val ev = graft.Tables.load(spark, sf, "events")

    def run(name: String, mk: () => DataFrame): Unit = {
      try mk().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"!! $name failed: $e"); return }
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val out = mk()
      out.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.execute().count()
        case p => p.execute().count()
      }
      val plan = out.queryExecution.executedPlan.toString
      val fin = plan.linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
      val nReused = "ReusedExchange".r.findAllIn(fin).size
      val nSorts = "\\bSort \\[".r.findAllIn(fin).size
      val nScans = "FileScan".r.findAllIn(fin).size
      val nWin = "\\bWindow \\[".r.findAllIn(fin).size
      println(f"== $name: min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")} " +
        s"reused=$nReused sorts=$nSorts scans=$nScans windows=$nWin")
      if (sys.env.contains("SCRATCH_PLAN"))
        println(fin.linesIterator.map(_.take(130)).mkString("\n"))
    }

    run("j6_positional_join", () =>
      Relational.positionalJoin(
        graft.Tables.load(spark, sf, "nation").select(col("n_nationkey"), col("n_name")),
        Seq(col("n_name")),
        graft.Tables.load(spark, sf, "region").select(col("r_regionkey"), col("r_name")),
        Seq(col("r_name"))))
    run("sample_token_budget", () =>
      TextAnalysis.sampleToTokenBudget(docs, "text", "doc_id", 1000000L))
    run("pack_sequences", () =>
      TextAnalysis.packSequences(docs, "text", "doc_id", ctxLen = 512))
    run("pack_windows", () =>
      TextAnalysis.packWindows(docs, "text", "doc_id", ctxLen = 512))
    run("pack_windows_by_source", () =>
      TextAnalysis.packWindowsBySource(docs, "text", "doc_id", "source", ctxLen = 512))
    run("w5_rowNumber_events", () =>
      Relational.globalRowNumber(ev, Seq(col("ts"), col("event_id"))))
    run("shard_by_token_budget", () =>
      TextAnalysis.shardByTokenBudget(docs, "text", "doc_id", 100000L))
    spark.stop()
  }
}
