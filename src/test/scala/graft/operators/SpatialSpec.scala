package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Grid-cell radius join vs an in-memory brute-force oracle, including
  * the edge geometry the grid must not lose: antimeridian wrap, polar
  * caps, boundary band, empty intersections. */
class SpatialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
    val (dLat, dLon) = (math.toRadians(lat2 - lat1), math.toRadians(lon2 - lon1))
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(p1) * math.cos(p2) * math.pow(math.sin(dLon / 2), 2)
    2 * Spatial.EarthRadiusM * math.asin(math.sqrt(a))
  }

  private def bruteforce(ls: Seq[(Long, Double, Double)],
      rs: Seq[(Long, Double, Double)], r: Double): Set[(Long, Long)] =
    (for { l <- ls; rt <- rs if hav(l._2, l._3, rt._2, rt._3) <= r }
      yield (l._1, rt._1)).toSet

  private def joined(ls: Seq[(Long, Double, Double)],
      rs: Seq[(Long, Double, Double)], r: Double,
      maxAbsLat: Double = 66.0): Set[(Long, Long)] = {
    val l = ls.toDF("lid", "llat", "llon")
    val rt = rs.toDF("rid", "rlat", "rlon")
    Spatial.withinRadiusJoin(l, rt, "llat", "llon", "rlat", "rlon", r, maxAbsLat)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
  }

  test("withinRadiusJoin equals brute force on a deterministic scatter") {
    // lattice-derived pseudo-random points across the whole valid band
    val ls = (1L to 120L).map(i =>
      (i, (i * 37 % 1200) / 10.0 - 60.0, (i * 91 % 3600) / 10.0 - 180.0))
    val rs = (1L to 60L).map(i =>
      (i, (i * 53 % 1200) / 10.0 - 60.0, (i * 113 % 3600) / 10.0 - 180.0))
    // 6000 km collapses the grid to two lon columns — the modular
    // neighborhood aliases and must not double-emit pairs
    for (r <- Seq(100000.0, 500000.0, 2000000.0, 6000000.0)) {
      val expected = bruteforce(ls, rs, r)
      val l = ls.toDF("lid", "llat", "llon")
      val rt = rs.toDF("rid", "rlat", "rlon")
      val rows = Spatial.withinRadiusJoin(l, rt,
        "llat", "llon", "rlat", "rlon", r)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(rows.toSet == expected, s"radius $r")
      assert(rows.length == expected.size, s"duplicate pairs at radius $r")
      assert(expected.nonEmpty || r == 100000.0)
    }
  }

  test("antimeridian: neighbors across ±180 are found") {
    val ls = Seq((1L, 10.0, 179.8))
    val rs = Seq((2L, 10.0, -179.9), (3L, 10.0, 178.0), (4L, 10.0, -178.5))
    // 0.3° lon at lat 10 ≈ 33 km; 1.8° ≈ 197 km; 1.7°(wrapped) ≈ 186 km
    assert(joined(ls, rs, 50000.0) == Set((1L, 2L)))
    assert(joined(ls, rs, 200000.0) == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("polar caps: pairs above maxAbsLat still match, and only once") {
    val ls = Seq((1L, 88.0, 0.0), (2L, 87.5, 120.0), (3L, 65.9, 10.0))
    val rs = Seq((10L, 88.2, 30.0), (11L, 87.6, 119.0), (12L, 65.8, 10.2))
    for (r <- Seq(30000.0, 100000.0, 300000.0)) {
      val expected = bruteforce(ls, rs, r)
      val l = ls.toDF("lid", "llat", "llon")
      val rt = rs.toDF("rid", "rlat", "rlon")
      val rows = Spatial.withinRadiusJoin(l, rt,
        "llat", "llon", "rlat", "rlon", r)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(rows.toSet == expected, s"radius $r")
      assert(rows.length == rows.toSet.size, s"duplicate pair at radius $r")
    }
  }

  test("boundary band at maxAbsLat: polar x near-boundary pair is kept once") {
    // 66.5 is truly polar, 65.8 sits in the one-cell band below 66
    val ls = Seq((1L, 66.5, 50.0))
    val rs = Seq((2L, 65.8, 50.0), (3L, 60.0, 50.0))
    val rows = joined(ls, rs, 100000.0)
    assert(rows == Set((1L, 2L)))  // 0.7° lat ≈ 78 km; 6.5° is far
    val l = ls.toDF("lid", "llat", "llon")
    val rt = rs.toDF("rid", "rlat", "rlon")
    val n = Spatial.withinRadiusJoin(l, rt,
      "llat", "llon", "rlat", "rlon", 100000.0).count()
    assert(n == 1, "no duplicate via the polar bucket")
  }

  test("band-edge pairs at adversarial radii never straddle two cells") {
    // regression: with a linear meters-per-degree lon bound, radius
    // 493937.22 m at lat 66.0 (the default band edge) gave 10.909°
    // cells while the true within-radius Δλ reaches 10.9091° — the
    // pair below sat two cells apart and was silently dropped
    val r = 493937.22
    val ls = Seq((1L, 66.0, 0.0))
    val rs = Seq((2L, 66.0, 10.9090), (3L, 66.0, 10.95), (4L, 66.0, 11.5))
    val expected = bruteforce(ls, rs, r)
    assert(joined(ls, rs, r) == expected)
    // sweep radii against a same-lat fan of points: grid == brute force
    for (rr <- Seq(100000.0, 250000.0, 493937.22, 700000.0)) {
      val fan = (0 until 40).map(i => (10L + i, 65.99, i * 0.37))
      assert(joined(ls, fan, rr) == bruteforce(ls, fan, rr), s"radius $rr")
    }
  }

  test("no matches yields an empty frame, not an error") {
    assert(joined(Seq((1L, 0.0, 0.0)), Seq((2L, 50.0, 120.0)), 1000.0).isEmpty)
  }

  test("haversineMeters: known distance spot checks") {
    // one degree of latitude at the equator ≈ 111.2 km
    val d = Seq((0.0, 0.0, 1.0, 0.0)).toDF("a", "b", "c", "d")
      .select(Spatial.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(d - 111195.0) < 200.0)
    // same point = 0
    val z = Seq((12.3, 45.6, 12.3, 45.6)).toDF("a", "b", "c", "d")
      .select(Spatial.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(z == 0.0)
  }
}
