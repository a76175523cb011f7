package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
    Tables.sessionConfigs.foreach { case (k,v) => b.config(k,v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q1_agg", "j1_broadcast_join", "p2_time_range", "s4_recent_window",
                  "dedup_minhash_lsh", "ann_bruteforce", "o4_latest", "w1_glider_segments",
                  "pipeline_corpus", "w6_sessionize", "ann_ivf_topk", "j7_salted_join")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
        .linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
