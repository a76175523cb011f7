package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge

/** Mergeable summary sketches for 100 TB-scale profiling. The first
  * entry is the KMV distinct-count sketch ([[graft.functions
  * .KmvSketchAgg]]) — chosen over HLL exactly because its estimate is
  * a deterministic function of the hashed input, so corpus profiles
  * computed on different engines (or re-computed months later) agree
  * bit-for-bit and the DuckDB oracle can hash-match it. */
object Sketches {

  /** 2⁵² — the hash space: 13 md5 hex digits, exact in a double. */
  val HashSpace: Double = 4503599627370496.0

  /** Portable 52-bit hash: the first 13 hex digits of md5 of the
    * value's string form — the same engine-portable rule every sampler
    * here uses, numeric instead of lexicographic. Codegen'd
    * projection; the aggregate above consumes these longs. */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 13), 16, 10).cast("long")

  /** Estimated distinct `valueCol` per `groupCol`:
    * (group, est, kept, kth). Exact (est = kept) below k distinct
    * values, (k−1)·2⁵²/h₍ₖ₎ past it; null values don't count. One
    * hash-partitioned aggregation with O(k) state per group and
    * map-side partial combine — no sort, no collect_set. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val sk = GraftSqlBridge.column(
      graft.functions.KmvSketchAgg(
        GraftSqlBridge.expression(kmvHash(col(valueCol))), k)
        .toAggregateExpression())
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sk.as("_sk"))
      .select(col(groupCol), col("_sk.est").as("est"),
        col("_sk.kept").as("kept"), col("_sk.kth").as("kth"))
  }

  /** Estimated CONTAINMENT C(A, B) = |A ∩ B| / |A| for every ordered
    * pair of groups — the asymmetric near-dup signal resemblance
    * misses: a document (or shard) wholly CONTAINED in a much larger
    * one has low Jaccard but containment ≈ 1. Estimator: from A's
    * bottom-k sketch Â (a uniform sample of A's hash space below
    * A's k-th smallest), C ≈ |{h ∈ Â : h ∈ B̂ ∧ h ≤ kth(B)}| / |Â'|
    * with Â' = Â restricted to min(kth(A), kth(B)) — both sketches
    * restricted to the hash prefix where BOTH are complete, so the
    * estimate is deterministic and engine-portable. Same one-pass
    * sketch build as [[kmvResemblance]]; the pairwise stage runs on
    * G² sketch rows (metadata-sized at any corpus scale). Emits
    * ordered pairs g1 ≠ g2. */
  /** One bottom-k set sketch per group — the shared build step of
    * [[kmvResemblance]] and [[kmvContainment]] (one definition: the
    * two estimators must agree on hash rule and null handling). */
  private def kmvSketches(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val sk = GraftSqlBridge.column(
      graft.functions.KmvSetAgg(
        GraftSqlBridge.expression(kmvHash(col(valueCol))), k)
        .toAggregateExpression())
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol)).agg(sk.as("_hs"))
  }

  def kmvContainment(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val sketches = kmvSketches(df, groupCol, valueCol, k)
    val a = sketches.select(col(groupCol).as("g1"), col("_hs").as("_h1"))
    val b = sketches.select(col(groupCol).as("g2"), col("_hs").as("_h2"))
    // the hash prefix where BOTH sketches are complete: below the
    // smaller of the two k-th smallest hashes (a sketch with fewer
    // than k members is complete everywhere → +inf sentinel)
    val kth1 = when(size(col("_h1")) < k, Long.MaxValue)
      .otherwise(element_at(col("_h1"), k))
    val kth2 = when(size(col("_h2")) < k, Long.MaxValue)
      .otherwise(element_at(col("_h2"), k))
    val cut = least(kth1, kth2)
    val a1 = filter(col("_h1"), h => h <= cut)
    val inter = size(filter(a1, h => array_contains(col("_h2"), h)))
    a.join(b, col("g1") =!= col("g2"))
      .select(col("g1"), col("g2"),
        when(size(a1) === 0, 0.0)
          .otherwise(inter.cast("double") / size(a1)).as("containment"))
  }

  /** Count-Min frequency sketch expressed as a RELATION: the sketch is
    * a `(d, bucket, cnt)` table of at most `depth × width` rows —
    * Spark-first instead of a custom buffer type, because the hash
    * aggregation that builds it already has exactly the right
    * distributed shape: map-side partial combine bounds the shuffle at
    * `depth × width` rows per map partition NO MATTER how many input
    * rows flowed through, and "merging" two sketches is a unionByName
    * + re-aggregate of two metadata-sized tables. Row `d` of the
    * sketch uses the engine-portable hash
    * `md5("d:" ++ value)[0,13) mod width`, so an independent SQL
    * engine recomputes the identical table and estimates. */
  def cmsBucket(c: Column, d: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$d:"), c.cast("string"))), 1, 13),
      16, 10).cast("long"), lit(width.toLong))

  /** The exploded `(d, bucket)` key column — THE single definition of
    * the sketch geometry, shared by [[cmsSketch]], [[cmsEstimate]] and
    * the streaming twin ([[graft.streaming.EventStream.hourlyCms]]):
    * sketches only merge when their geometries are bit-identical, so
    * there is exactly one place to change it. */
  def cmsKeys(valueCol: String, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { d =>
      struct(lit(d).as("d"), cmsBucket(col(valueCol), d, width).as("bucket"))
    }: _*))

  /** Build the sketch: ONE pass over the data (the `depth` bucket keys
    * explode from an inline array, not `depth` re-scans), one bounded
    * hash aggregation. Null values don't count. */
  def cmsSketch(df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(cmsKeys(valueCol, depth, width).as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches built with the SAME (depth, width) geometry —
    * counts add bucket-wise. Metadata-sized on both sides. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `probes`: est(x) = min over the
    * `depth` rows of the bucket counts x hashes to — the classic
    * one-sided overestimate (never under the true count). The sketch
    * is broadcast (≤ depth·width rows by construction), so probing is
    * a map-side join however large the probe set: no shuffle of the
    * probe stream, one bounded aggregation per probe value. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame =
    probes.filter(col(valueCol).isNotNull)
      .select(col(valueCol), cmsKeys(valueCol, depth, width).as("db"))
      .select(col(valueCol), col("db.d").as("d"), col("db.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Estimated Jaccard resemblance between every PAIR of groups from
    * their bottom-k sketches (Broder's resemblance estimator over the
    * bottom-k of the union): J(A,B) ≈ |M ∩ Â ∩ B̂| / |M| with
    * M = bottom-k(Â ∪ B̂). One sketch pass over the data (the same
    * bounded aggregate as [[kmvDistinct]]), then the PAIRWISE stage
    * runs on one row per group — sketches are k longs, so the G²
    * comparison is metadata-sized however big the data was. Emits
    * each unordered pair once (g1 < g2). */
  def kmvResemblance(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val sketches = kmvSketches(df, groupCol, valueCol, k)
    val a = sketches.select(col(groupCol).as("g1"), col("_hs").as("_h1"))
    val b = sketches.select(col(groupCol).as("g2"), col("_hs").as("_h2"))
    val m = slice(array_sort(array_union(col("_h1"), col("_h2"))), 1, k)
    a.join(b, col("g1") < col("g2"))
      .select(col("g1"), col("g2"),
        (size(array_intersect(m, array_intersect(col("_h1"), col("_h2"))))
          .cast("double") / size(m)).as("jaccard"))
  }
}
