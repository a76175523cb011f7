package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * - bruteForceTopK: exact cosine top-k against a query vector —
  *   one scan, per-row dot product via codegen'd higher-order
  *   functions, top-k via orderBy+limit (Spark plans TakeOrderedAndProject,
  *   no full sort materialization).
  * - lshCandidatePairs / lshTopK: random-hyperplane LSH bucketing — the
  *   scale path; candidate generation is an equi-join on the bucket key.
  *
  * All arithmetic is done in DOUBLE (floats cast up front) with
  * left-to-right array folds, so results are deterministic and
  * reproducible across engines.
  */
object Similarity {

  /** Dot product of two array columns in index order (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Cosine against a constant query vector with the query's norm
    * precomputed on the driver (HOF `aggregate` over a literal array is
    * not constant-folded, so without this the plan re-reduces the
    * query vector per row). */
  def cosineToQuery(vecCol: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val d = dot(vecCol, q)
    val nn = norm(vecCol) * lit(qNorm)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Exact top-k by cosine against a constant query vector. The query
    * vector is a literal in the plan (broadcast by construction). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * derived from xxhash64(p, j) scaled to [-1, 1]. Generated as literals
    * on the driver — no data-dependent state. */
  private def planeComponent(p: Int, j: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((p, j))
    (h.toDouble / Int.MaxValue)
  }

  /** Sign-random-projection bucket key: bit p = sign(v · plane_p). */
  def srpKey(vecCol: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dim).map(j => lit(planeComponent(p, j))): _*)
      when(dot(vecCol, plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** All candidate pairs sharing an SRP bucket, with exact cosine
    * attached. Bucket join = shuffled equi-join; no cross product. */
  def lshCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12): DataFrame = {
    val dim = firstVectorLength(df, vecCol)
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      srpKey(col(vecCol), dim, planes).as("bucket"))
    val l = keyed.select(col("bucket"), col("id").as("id1"), col("v").as("v1"))
    val r = keyed.select(col("bucket"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, Seq("bucket")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("v1"), col("v2")).as("cosine"))
      .dropDuplicates("id1", "id2")
  }

  /** IVF-style top-k: probe only buckets matching the query's bucket.
    * Falls back to scanning `nProbe` nearest buckets by hamming distance
    * of the SRP key — still an equi-join shape at scale. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, planes: Int = 8): DataFrame = {
    val dim = query.length
    val q = array(query.map(lit): _*)
    val qKey = srpKey(q, dim, planes)
    df.select(col(idCol), col(vecCol).as("v"),
      srpKey(col(vecCol), dim, planes).as("bucket"))
      .filter(bit_count(col("bucket").bitwiseXOR(qKey)) <= 1)
      .select(col(idCol), cosineToQuery(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  private def firstVectorLength(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  // ---- IVF (inverted-file) variant — the other scale path -----------------

  /** Train `k` centroids with Lloyd iterations on a bounded sample
    * (driver-side by design: the sample is capped at `sampleN` rows, so
    * memory is bounded regardless of table size; assignment afterwards
    * is fully distributed). Deterministic: seeded sample, first-k init. */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, sampleN: Int = 2000): Array[Array[Double]] = {
    val sample = df.select(col(vecCol)).limit(sampleN).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearestIdx(v, centroids)
        counts(c) += 1
        var j = 0
        while (j < v.length) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  private def nearestIdx(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var j = 0
      while (j < v.length) { val x = v(j) - cs(c)(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Distributed cluster assignment via the native argmin expression
    * ([[graft.functions.NearestCentroid]]): centroids ride in the
    * serialized plan, the scan is one JIT'd k×dim loop per row. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol), col(vecCol),
      graft.functions.NearestCentroid.nearest_centroid(col(vecCol), centroids)
        .as("cluster"))

  /** IVF top-k: probe only the `nProbe` centroids nearest the query —
    * the scan prunes to ~nProbe/k of the data (with a cluster-partitioned
    * layout this becomes partition pruning at 100 TB). */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 2): DataFrame = {
    val probes = centroids.indices
      .sortBy { c =>
        centroids(c).zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      }.take(nProbe).toSet
    ivfAssign(df, idCol, vecCol, centroids)
      .filter(col("cluster").isin(probes.toSeq: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
