package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives for observation-platform data — the
  * reference's domain is ocean-sensor feeds (`agol_wrangler.py`
  * glider tracks, buoy positions), and "which platforms sit within R
  * of each other / of a station list" is the standing spatial query
  * over them.
  *
  * The radius join is the scale-sensitive part: the naive plan is a
  * cross join with a haversine filter — O(N·M) compare work AND a
  * BroadcastNestedLoopJoin/CartesianProduct plan that dies at 100 TB.
  * [[withinRadiusJoin]] turns it into an EQUI-join on grid-cell ids:
  * both sides bucket into a fixed lat/lon grid whose cells are at
  * least `radiusM` meters tall and wide, the probe side expands to
  * its 3×3 cell neighborhood (a bounded ×9, independent of data
  * size), and candidates sharing a cell are confirmed with the exact
  * haversine predicate. Work drops to O(pairs-per-neighborhood) and
  * the plan is a shuffled (or AQE-broadcast) hash join Catalyst can
  * reason about.
  */
object Spatial {

  /** IUGG mean Earth radius, meters. */
  val EarthRadiusM: Double = 6371008.8

  /** Meters per degree of latitude UNDER THE HAVERSINE MODEL, with
    * slack: the model's meridian is exactly R·π/180 ≈ 111194.93 m/deg
    * (from sin²(d/2R) ≥ sin²(Δφ/2), Δφ ≤ d/R with no approximation),
    * and sizing with a smaller constant only widens cells. */
  private val MinMetersPerDegLat = 110500.0

  /** Sentinel cell id for the polar caps (see [[withinRadiusJoin]]). */
  private val PolarCell = Long.MinValue

  /** Exact great-circle distance in meters (haversine, wrap-safe: the
    * sin²(Δλ/2) term is periodic so ±180° longitude needs no special
    * case). Plain `functions._` composition — stays inside
    * whole-stage codegen. */
  def haversineMeters(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * EarthRadiusM) * asin(sqrt(a))
  }

  /** All pairs (left row, right row) whose points lie within
    * `radiusM` meters great-circle distance. Output = left columns
    * then right columns (caller keeps names disjoint), exactly the
    * rows a cross join + haversine filter would produce — the grid is
    * pruning only, never semantics.
    *
    * Scale shape: `right` buckets into one cell per row; `left` (the
    * PROBE side — put the smaller or cheaper-to-replicate side here)
    * explodes into its 3×3 neighbor cells, a constant ×9 that buys an
    * equi-join on the cell id. Longitude cells are modular so
    * neighborhoods wrap the antimeridian. Cells are sized from the
    * WORST-case meters-per-degree in band (lat: equatorial minimum;
    * lon: cos(`maxAbsLat`)), so any within-radius pair at
    * |lat| ≤ `maxAbsLat` shares a neighborhood.
    *
    * Poles: above `maxAbsLat` lon cells are narrower than the radius
    * and adjacency breaks, so truly-polar rows (|lat| > maxAbsLat)
    * route through ONE dedicated polar bucket on both sides, and
    * rows in the one-cell boundary band additionally mirror into it;
    * a polar-bucket candidate only survives when at least one side is
    * truly polar, so no pair can surface twice. The polar bucket is a
    * deliberate skew point — polar data is a sliver of real feeds,
    * and `maxAbsLat` can be raised toward 89° when it is not. */
  def withinRadiusJoin(left: DataFrame, right: DataFrame,
      lLat: String, lLon: String, rLat: String, rLon: String,
      radiusM: Double, maxAbsLat: Double = 66.0): DataFrame = {
    require(radiusM > 0, "radiusM must be positive")
    require(maxAbsLat > 0 && maxAbsLat < 90, "maxAbsLat must be in (0, 90)")
    val latCellDeg = radiusM / MinMetersPerDegLat
    // exact haversine inversion for the longitude bound: for any pair
    // within r at |lat| ≤ maxAbsLat,
    //   sin²(d/2R) ≥ cosφ₁·cosφ₂·sin²(Δλ/2) ≥ cos²(maxAbsLat)·sin²(Δλ/2)
    // so Δλ ≤ 2·asin(sin(r/2R)/cos(maxAbsLat)) — a LINEAR meters-per-
    // degree bound underestimates this (asin convexity) and lets
    // within-radius pairs land two cells apart near the band edge
    val sinHalf = math.sin(math.min(math.Pi, radiusM / EarthRadiusM) / 2)
    val asinArg = sinHalf / math.cos(math.toRadians(maxAbsLat))
    val minLonCellDeg =
      if (asinArg >= 1.0) 360.0 else math.toDegrees(2 * math.asin(asinArg))
    // FLOOR, then widen every cell to exactly 360/nLon: with ceil the
    // last modular cell is a sliver narrower than the bound and
    // adjacency breaks right at the antimeridian
    val nLon = math.max(1L, math.floor(360.0 / minLonCellDeg).toLong)
    val lonCellDeg = 360.0 / nLon

    def cy(latC: Column): Column =
      floor((latC + lit(90.0)) / lit(latCellDeg)).cast("long")
    def cx(lonC: Column): Column =
      pmod(floor((lonC + lit(180.0)) / lit(lonCellDeg)).cast("long"), lit(nLon))
    def isPolar(latC: Column): Column = abs(latC) > lit(maxAbsLat)
    def inBand(latC: Column): Column =
      abs(latC) > lit(maxAbsLat - latCellDeg)

    // right: one cell per row; polar rows ONLY the polar bucket,
    // boundary-band rows mirror into it too
    val rCell = cy(col(rLat)) * lit(nLon) + cx(col(rLon))
    val r2 = right
      .withColumn("_rp", isPolar(col(rLat)))
      .withColumn("_cell", explode(
        when(col("_rp"), array(lit(PolarCell)))
          .when(inBand(col(rLat)), array(rCell, lit(PolarCell)))
          .otherwise(array(rCell))))

    // left: 3×3 neighborhood (lat rows don't wrap — out-of-range row
    // ids are simply empty; lon columns wrap modulo nLon)
    val lCy = cy(col(lLat))
    val lCx = cx(col(lLon))
    // array_distinct: with nLon <= 3 the modular dx offsets alias the
    // same cell and would emit duplicate candidate pairs
    val nine = array_distinct(array((for (dy <- -1 to 1; dx <- -1 to 1) yield
      (lCy + lit(dy.toLong)) * lit(nLon) +
        pmod(lCx + lit(dx.toLong), lit(nLon))): _*))
    val l2 = left
      .withColumn("_lp", isPolar(col(lLat)))
      .withColumn("_cell", explode(
        when(col("_lp"), array(lit(PolarCell)))
          .when(inBand(col(lLat)), concat(nine, array(lit(PolarCell))))
          .otherwise(nine)))

    l2.join(r2, "_cell")
      .filter(col("_cell") =!= lit(PolarCell) || col("_lp") || col("_rp"))
      .filter(haversineMeters(col(lLat), col(lLon),
        col(rLat), col(rLon)) <= lit(radiusM))
      .drop("_cell", "_lp", "_rp")
  }
}
