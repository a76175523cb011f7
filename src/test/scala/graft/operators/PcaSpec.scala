package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("covariance matches the textbook formula on a hand-checked set") {
    // vectors (1,2), (3,6), (5,10): y = 2x exactly → cov = [[4,8],[8,16]]
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 6.0), Seq(5.0, 10.0)).toDF("v")
    val (n, mean, cov) = Pca.covariance(df, "v")
    assert(n == 3 && mean.toSeq == Seq(3.0, 6.0))
    assert(cov(0).toSeq == Seq(4.0, 8.0) && cov(1).toSeq == Seq(8.0, 16.0))
    // partitioning must not change the result
    val (n2, _, cov2) = Pca.covariance(df.repartition(7), "v")
    assert(n2 == 3 && cov2.map(_.toSeq).toSeq == cov.map(_.toSeq).toSeq)
  }

  test("jacobi eigensolve: known 2x2 + equal-diagonal rotation case") {
    // [[4,8],[8,16]]: eigenvalues 20 and 0
    val (vals, _) = Pca.jacobiEigen(Array(Array(4.0, 8.0), Array(8.0, 16.0)))
    assert(vals.map(v => math.round(v * 1e9) / 1e9).sorted.toSeq == Seq(0.0, 20.0))
    // equal diagonal (theta == 0) needs the 45-degree rotation:
    // [[2,1],[1,2]] → eigenvalues 1 and 3
    val (vals2, _) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals2.map(v => math.round(v * 1e9) / 1e9).sorted.toSeq == Seq(1.0, 3.0))
  }

  test("principal components recover the dominant direction; projection is native") {
    // points along (3,4)/5 with small orthogonal noise
    val dir = (0.6, 0.8)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val t = rnd.nextGaussian() * 10
      val e = rnd.nextGaussian() * 0.1
      Seq(t * dir._1 - e * dir._2, t * dir._2 + e * dir._1)
    }
    val df = rows.toDF("v")
    val Seq((c1, ev1), (_, ev2)) = Pca.principalComponents(df, "v", k = 2)
    assert(ev1 > ev2 && ev2 >= 0)
    assert(math.abs(c1(0) - dir._1) < 0.01 && math.abs(c1(1) - dir._2) < 0.01)
    // projection: native expression equals manual dot products, plan is
    // a pure projection
    val proj = Pca.project(df, "v", Seq(c1))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    val got = proj.select(col("proj").getItem(0)).as[Double].head()
    val want = rows.head.zip(c1).map { case (a, b) => a * b }.sum
    assert(math.abs(got - want) < 1e-9)
  }

  test("covariance: mis-sized vector fails fast; float columns widen") {
    val bad = Seq(Seq(1.0, 2.0), Seq(1.0)).toDF("v")
    val e = intercept[Exception] { Pca.covariance(bad, "v") }
    assert(e.getMessage.contains("dimension") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension"))
    val fl = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val (n, _, cov) = Pca.covariance(fl, "v")
    assert(n == 2 && cov(0)(0) == 2.0)
  }

  test("end-to-end: project embeddings, variance concentrates in leading dims") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val comps = Pca.principalComponents(emb, "embedding", k = 4)
    val evs = comps.map(_._2)
    assert(evs == evs.sorted.reverse)
    val projected = Pca.project(emb, "embedding", comps.map(_._1))
    assert(projected.select(size(col("proj"))).distinct().head().getInt(0) == 4)
  }
}
