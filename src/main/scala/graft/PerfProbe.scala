package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 optimization measurement harness (guide §1: measure first).
  *
  * Modes (first arg):
  *   explain <label> <gate>[,<gate>...]  — write `.explain("formatted")`
  *       of each gate to plans/r16/<gate>_<label>.txt (the judge-facing
  *       plan artifacts) and print Exchange/Join/Sort counts.
  *   time <iters> <gate>[,<gate>...]     — per-gate min/median over
  *       `iters` timed `.count()` runs (Bench methodology, one line per
  *       gate) after the standard Bench warmup.
  *   stream <tag>                        — run the t<tag> streaming gate
  *       once and print EVERY micro-batch progress JSON (durationMs
  *       breakdown: addBatch / getBatch / queryPlanning / walCommit /
  *       stateStore commit), so streaming wall time is attributable.
  *
  * Session construction mirrors Bench exactly (same master, same
  * shuffle partitions, same Tables.sessionConfigs) so numbers are
  * comparable with the driver's harness. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // true median: average of the two middle elements for even n (the
    // upper-middle index alone biased even-iteration medians high)
    def median(sorted: Seq[Double]): Double =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2

    def warmup(): Unit = {
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
      val li = Tables.load(spark, sfDir, "lineitem")
      li.groupBy(col("l_returnflag")).count().count()
      val o = Tables.load(spark, sfDir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      import org.apache.spark.sql.expressions.Window
      Tables.load(spark, sfDir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts")))).count()
      graft.operators.Snapshots.sweep(spark)
    }

    args.headOption.getOrElse("") match {
      case "explain" =>
        val label = args(1)
        val gates = args(2).split(",").toSeq
        new java.io.File("plans/r16").mkdirs()
        gates.foreach { g =>
          val df = SparkEntry.queries(g)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Path.of(s"plans/r16/${g}_$label.txt"), txt)
          def c(p: String) = p.r.findAllIn(txt).size
          println(s"$g: Exchange=${c("Exchange")} " +
            s"SMJ=${c("SortMergeJoin")} BHJ=${c("BroadcastHashJoin")} " +
            s"Sort=${c("\\bSort\\b")} HashAgg=${c("HashAggregate")} " +
            s"SortAgg=${c("SortAggregate")} -> plans/r16/${g}_$label.txt")
          graft.operators.Snapshots.sweep(spark)
        }
      case "explainexec" =>
        // EXECUTED adaptive plan (isFinalPlan=true): run the gate's own
        // physical plan via toRdd.count() (count()/collect() would wrap
        // it in a new agg plan), then dump — ReusedExchange and AQE
        // join rewrites only appear here, not in the initial plan.
        val label = args(1)
        val gates = args(2).split(",").toSeq
        new java.io.File("plans/r16").mkdirs()
        gates.foreach { g =>
          val df = SparkEntry.queries(g)(spark, sfDir)
          df.queryExecution.toRdd.count()
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Path.of(s"plans/r16/${g}_$label.txt"), txt)
          def c(p: String) = p.r.findAllIn(txt).size
          println(s"$g: Exchange=${c("Exchange")} Reused=${c("ReusedExchange")} " +
            s"SMJ=${c("SortMergeJoin")} BHJ=${c("BroadcastHashJoin")} " +
            s"Sort=${c("\\bSort\\b")} HashAgg=${c("HashAggregate")} " +
            s"SortAgg=${c("SortAggregate")} -> plans/r16/${g}_$label.txt")
          graft.operators.Snapshots.sweep(spark)
        }
      case "time" =>
        val iters = args(1).toInt
        val gates = args(2).split(",").toSeq
        warmup()
        gates.foreach { g =>
          val fn = SparkEntry.queries(g)
          val times = (1 to iters).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            graft.operators.Snapshots.sweep(spark, blocking = true)
            dt
          }.sorted
          println(f"$g%-32s min=${times.head}%.4f med=${median(times)}%.4f max=${times.last}%.4f iters=$iters")
        }
      case "ab" =>
        // Paired A/B: iters pairs of (A-run, B-run) INTERLEAVED in one
        // warm JVM, flipping a system property between runs — host-load
        // drift hits both sides of a pair equally, so the per-pair
        // delta is meaningful even on a noisy co-tenant box.
        val iters = args(1).toInt
        val gate = args(2)
        val propKey = args(3)
        // only graft.* knobs are read per-call from sys.props: a
        // spark.sql.* key would be captured at session build and the
        // flip ignored — i.e. a silent A/A comparison
        require(propKey.startsWith("graft."),
          s"ab flips sys.props per run, so the key must be a graft.* " +
            s"knob (got '$propKey'); spark.sql.* confs are fixed at " +
            "session build and would make this an A/A run")
        val va = args(4)
        val vb = args(5)
        warmup()
        val fn = SparkEntry.queries(gate)
        def run(v: String): Double = {
          if (v == "UNSET") sys.props.remove(propKey)
          else sys.props.put(propKey, v)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          graft.operators.Snapshots.sweep(spark, blocking = true)
          dt
        }
        run(va); run(vb) // one warm pair, discarded
        val pairs = (1 to iters).map(_ => (run(va), run(vb)))
        val as = pairs.map(_._1).sorted
        val bs = pairs.map(_._2).sorted
        val deltas = pairs.map { case (a, b) => b - a }.sorted
        println(f"$gate $propKey A=$va B=$vb pairs=$iters")
        println(f"  A min=${as.head}%.4f med=${median(as)}%.4f")
        println(f"  B min=${bs.head}%.4f med=${median(bs)}%.4f")
        println(f"  delta(B-A) med=${median(deltas)}%.4f " +
          f"wins(B<A)=${pairs.count(p => p._2 < p._1)}/$iters")
      case "jobs" =>
        // per-gate DRIVER JOB COUNT (dispatch floor attribution): run
        // the gate once under a job group and count the jobs the group
        // accumulated — the direct evidence for checkpoint-cadence /
        // job-overlap changes whose final-frame plan looks identical.
        val gates = args(1).split(",").toSeq
        warmup()
        gates.foreach { g =>
          val grp = s"probe_jobs_$g"
          spark.sparkContext.setJobGroup(grp, g)
          val t0 = System.nanoTime()
          SparkEntry.queries(g)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.clearJobGroup()
          val n = spark.sparkContext.statusTracker.getJobIdsForGroup(grp).length
          println(f"$g%-32s jobs=$n%-4d wall=$dt%.4f")
          graft.operators.Snapshots.sweep(spark, blocking = true)
        }
      case "stream" =>
        val tag = args(1)
        warmup()
        // re-run the gate through SparkEntry (identical plan), then dump
        // the LAST query's progress via the session's active listener
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            println("PROGRESS " + e.progress.json)
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(listener)
        val gate = SparkEntry.queries.keys.find(_.startsWith(s"t${tag}_"))
          .getOrElse(sys.error(s"no streaming gate t$tag"))
        val t0 = System.nanoTime()
        SparkEntry.queries(gate)(spark, sfDir).count()
        println(f"WALL ${(System.nanoTime() - t0) / 1e9}%.3f s ($gate)")
        spark.streams.removeListener(listener)
      case other => sys.error(s"unknown mode '$other'")
    }
    spark.stop()
  }
}
