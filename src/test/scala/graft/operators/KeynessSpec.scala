package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class KeynessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("G2 matches hand computation; only positive keyness survives") {
    // group x: "cat cat dog", group y: "dog dog dog fish"
    val docs = Seq(
      ("x", "cat cat dog"),
      ("y", "dog dog dog fish")
    ).toDF("source", "text")
    val out = TextAnalysis.keynessTerms(docs, "source", "text", k = 5)
      .as[(String, String, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    def g2(a: Long, b: Long, bigA: Long, bigB: Long): Double = {
      val t = (bigA + bigB).toDouble
      val ab = a + b
      val e1 = bigA.toDouble * ab / (bigA + bigB)
      val e2 = bigB.toDouble * ab / (bigA + bigB)
      val v = 2.0 * ((if (a > 0) a * math.log(a / e1) else 0.0) +
        (if (b > 0) b * math.log(b / e2) else 0.0))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // totals: A(x)=3, A(y)=4, T=7
    // cat: a=2 in x, 0 elsewhere → positive for x only
    assert(out(("x", "cat"))._1 == 2L)
    assert(out(("x", "cat"))._2 == g2(2, 0, 3, 4))
    // dog: 1/3 in x vs 3/4 in y → positive for y only
    assert(!out.contains(("x", "dog")))
    assert(out(("y", "dog"))._2 == g2(3, 1, 4, 3))
    // fish: only in y
    assert(out(("y", "fish"))._2 == g2(1, 0, 4, 3))
    // ranks are 1-based per group, ordered by rounded G2 desc then token
    assert(out(("x", "cat"))._3 == 1L)
    val yRanks = out.collect { case (("y", tok), (_, _, r)) => tok -> r }.toMap
    assert(yRanks("dog") < yRanks("fish") || yRanks("fish") < yRanks("dog"))
  }

  test("tokenization matches the corpus rule; empty tokens drop") {
    val docs = Seq(("x", "Hello, WORLD!! 42"), ("y", "world")).toDF("source", "text")
    val out = TextAnalysis.keynessTerms(docs, "source", "text", k = 5)
      .as[(String, String, Long, Double, Long)].collect()
    assert(out.forall(r => r._2.matches("[a-z0-9]+")))
    assert(out.exists(r => r._1 == "x" && r._2 == "42"))
  }
}
