package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Cosine similarity; 0 when either vector has zero norm. Native
    * codegen'd kernel ([[graft.functions.CosineSim]]) — same
    * left-to-right fold as the HOF formulation it replaced, so oracle
    * results are bit-identical; the HOF version ran one interpreted
    * lambda per element per candidate pair. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VecOps.cosine_sim(a, b)

  /** Cosine against a constant query vector — query and its norm ride
    * inside the native expression ([[graft.functions.CosineToQuery]]). */
  def cosineToQuery(vecCol: Column, query: Seq[Double]): Column =
    graft.functions.VecOps.cosine_to_query(vecCol, query.toArray)

  /** Exact top-k by cosine against a constant query vector. The query
    * vector is a literal in the plan (broadcast by construction). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Per-vector affine int8 quantization — the embedding STORAGE path
    * at 100 TB: a float32 corpus shrinks 4× to one byte per dimension
    * plus two doubles per vector, and every op here stays a pure
    * codegen'd projection (no shuffle, no UDF). Code u_i =
    * floor((v_i − min)·255/(max − min) + 0.5) stored as u−128 in a
    * `tinyint`; a constant vector (max = min) stores −128s and
    * dequantizes to the constant. The arithmetic is a fixed
    * left-to-right IEEE sequence, so an independent SQL engine
    * reproduces codes and dequantized values bit-for-bit. */
  def quantizeEmbeddings(df: DataFrame, idCol: String, vecCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val carried = carryCols.map(col)
    df.select(col(idCol) +: col(vecCol).as("_v") +:
        array_min(col(vecCol)).cast("double").as("q_min") +:
        array_max(col(vecCol)).cast("double").as("q_max") +: carried: _*)
      .select(col(idCol) +: col("q_min") +: col("q_max") +:
        transform(col("_v"), x =>
          when(col("q_max") === col("q_min"), lit(-128))
            .otherwise((floor((x.cast("double") - col("q_min")) * 255.0 /
              (col("q_max") - col("q_min")) + 0.5) - 128).cast("int"))
            .cast("byte")).as("qvec") +: carried: _*)
  }

  /** Dequantized double vector from a [[quantizeEmbeddings]] row. */
  def dequantize(qvec: Column, qMin: Column, qMax: Column): Column =
    transform(qvec, q =>
      qMin + (q.cast("double") + 128.0) * (qMax - qMin) / 255.0)

  /** Asymmetric top-k over a quantized corpus: the query keeps full
    * precision (the standard ADC shape — quantization error applies
    * once, not twice), corpus vectors dequantize inside the scoring
    * projection. Same scan/TakeOrdered plan as [[bruteForceTopK]]:
    * no shuffle, no sort materialization — only the byte-sized corpus
    * is read. */
  def quantizedTopK(qdf: DataFrame, idCol: String, query: Seq[Double],
      k: Int): DataFrame = {
    val dv = dequantize(col("qvec"), col("q_min"), col("q_max"))
    val qlit = array(query.map(lit): _*)
    val denom = norm(dv) * norm(qlit)
    qdf.select(col(idCol),
        when(denom === 0.0, 0.0).otherwise(dot(dv, qlit) / denom).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic ENGINE-PORTABLE pseudo-random hyperplanes: component
    * j of plane p in table t derives from the md5 of `"t:p:j"` (first 8
    * hex digits scaled to [-1, 1)). Generated as literals on the driver;
    * any engine with md5 recomputes the identical planes, which is what
    * lets the whole SRP pipeline be verified against an independent SQL
    * oracle instead of rows-only. */
  private[operators] def planeComponent(table: Int, p: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$table:$p:$j".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) / 2147483647.5 - 1.0
  }

  /** Sign-random-projection bucket key as a '0'/'1' bit STRING (plane
    * order): portable across engines and joins exactly like an int key.
    * At 100 TB the string key costs a few bytes more per row than a
    * packed long — irrelevant next to the vector payload it replaces.
    * One native codegen'd planes×dim loop per row
    * ([[graft.functions.SrpBits]]); the HOF formulation ran
    * planes interpreted `aggregate` folds per row. */
  def srpBits(vecCol: Column, dim: Int, planes: Int, table: Int = 0): Column = {
    val flat = Array.tabulate(planes * dim)(i =>
      planeComponent(table, i / dim, i % dim))
    graft.functions.VecOps.srp_bits(vecCol, flat, planes, dim)
  }

  /** Plane count scaled to the corpus: ~log2(n / targetBucketSize), so
    * expected bucket occupancy stays near `targetBucketSize` as n grows
    * — a FIXED plane count makes within-bucket pair generation
    * quadratic at 100 TB. Clamped to [4, 30]. */
  def adaptivePlanes(n: Long, targetBucketSize: Long = 64L): Int =
    math.min(30, math.max(4,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketSize)) /
        math.log(2.0)).toInt))

  /** All candidate pairs sharing an SRP bucket in ANY of `tables`
    * hash tables (OR-construction: recall 1-(1-p)^T), with exact cosine
    * attached. Bucket join = shuffled equi-join on (table, bucket); no
    * cross product. The join carries IDS ONLY — vectors are re-attached
    * to the (much smaller) deduped candidate set afterwards, keeping
    * the widest shuffle payload minimal.
    *
    * `planes = 0` (the default) → adaptive from the table's row count:
    * a FIXED plane count caps bucket cardinality forever (2^planes), so
    * at 10¹⁰ rows every bucket holds millions of vectors and pair
    * generation goes quadratic. `maxBucket > 0` (default 1000) caps
    * pair generation per bucket (first `maxBucket` members by id; drops
    * surface as the `dropped_members` observed metric) — the skew guard
    * at 100 TB, ON by default like the text-LSH paths. Callers that
    * need bit-reproducible candidate sets (oracle gates) pin an
    * explicit plane count. */
  def lshCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Int = 0, tables: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val dim = firstVectorLength(df, vecCol)
    val nPlanes = if (planes > 0) planes else adaptivePlanes(df.count())
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"), srpBits(col(vecCol), dim, nPlanes, t).as("bucket"))
      }: _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.tbl"), col("tb.bucket"))
    // Lazy drop accounting: the cap's CollectMetrics observation rides
    // the caller's action (no eager count() job mid-plan) — drops show
    // up as the `dropped_members` metric, free when the cap is unhit.
    val members = Dedup.capBuckets(
      keyed.select(col("tbl"), col("bucket"), col("id")),
      Seq("tbl", "bucket"), "id", maxBucket, "srp")
    // capped buckets → single-pass bounded-collect pair generation;
    // cap OFF → classic self-join (see Dedup.bucketPairs)
    val pairs = Dedup.bucketPairs(members, Seq("tbl", "bucket"), "id", Nil,
      bounded = maxBucket > 0).distinct()
    val vecs = df.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    pairs
      .join(vecs.select(col("_vid").as("id1"), col("_vv").as("v1")), "id1")
      .join(vecs.select(col("_vid").as("id2"), col("_vv").as("v2")), "id2")
      .select(col("id1"), col("id2"), cosine(col("v1"), col("v2")).as("cosine"))
  }

  /** Hamming distance between two same-length bit strings (small, fixed
    * plane count → unrolled codegen'd comparison chain). */
  private def bitHamming(bits: Column, ref: String): Column =
    (0 until ref.length).map { p =>
      when(substring(bits, p + 1, 1) =!= lit(ref.substring(p, p + 1)), 1)
        .otherwise(0)
    }.reduce((a, b) => a + b)

  /** Multi-probe LSH top-k: a row is a candidate when its bucket in ANY
    * table is within hamming `probeRadius` of the query's bucket for
    * that table — still one scan + filter, no cross product.
    *
    * `planes = 0` (the default) → [[adaptivePlanes]] from the row
    * count, matching [[lshCandidatePairs]]: a fixed plane count keeps
    * candidate SELECTIVITY constant as n grows, so the filter passes
    * ever-more rows to the top-k at scale. NOTE the adaptive default
    * pays one counting job over `df` at plan-build time; pass an
    * explicit plane count to stay fully lazy (oracle gates pin one
    * anyway for reproducible candidate sets). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, planes: Int = 0, tables: Int = 2,
      probeRadius: Int = 1): DataFrame = {
    val dim = query.length
    val nPlanes = if (planes > 0) planes else adaptivePlanes(df.count())
    def qBits(t: Int): String = (0 until nPlanes).map { p =>
      val d = (0 until dim).map(j => query(j) * planeComponent(t, p, j)).sum
      if (d >= 0) "1" else "0"
    }.mkString
    val probed = (0 until tables).map { tIdx =>
      bitHamming(srpBits(col(vecCol), dim, nPlanes, tIdx), qBits(tIdx)) <= probeRadius
    }.reduce(_ || _)
    df.filter(probed)
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  private def firstVectorLength(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  // ---- IVF (inverted-file) variant — the other scale path -----------------

  /** Lloyd k-means core (shared by IVF and PQ training): init = first
    * k sample vectors; assignment = first-min argmin; means accumulate
    * IN SAMPLE ORDER so an independent engine summing the same order
    * reproduces the centroids bit-for-bit; an emptied cluster keeps its
    * previous centroid. */
  private def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty training sample")
    var centroids = sample.take(k).map(_.clone())
    val assign = new Array[Int](sample.length)
    for (_ <- 0 until iters) {
      // The argmin dominates (sample × k × dim flops — with the
      // SemDeDup recipe's k ∝ n and sample ∝ k this term is the
      // quadratic driver cost, measured 1.0 s of the 3.0 s mutated
      // 16× probe). It is PURE per vector, so it runs on all cores;
      // determinism is untouched because each slot writes its own
      // index and the SUM accumulation below stays in sample order —
      // centroids remain bit-for-bit reproducible.
      val cs = centroids
      java.util.stream.IntStream.range(0, sample.length).parallel()
        .forEach(i => assign(i) = nearestIdx(sample(i), cs))
      val sums = Array.fill(centroids.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](centroids.length)
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        val c = assign(i)
        counts(c) += 1
        var j = 0
        while (j < v.length) { sums(c)(j) += v(j); j += 1 }
        i += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  /** Bounded, reproducible training sample (driver-side by design: the
    * sample is capped, so memory is bounded regardless of table size).
    * With `orderBy` set the sample is the lowest-`orderBy` rows —
    * `orderBy(..).limit(n)` plans as TakeOrderedAndProject, so
    * determinism costs no global sort (a bare `limit` is
    * partition-layout-dependent). */
  private def orderedSample(df: DataFrame, vecCol: String, sampleN: Int,
      orderBy: String): Array[Array[Double]] = {
    val picked =
      if (orderBy.isEmpty) df.select(col(vecCol)).limit(sampleN)
      else df.orderBy(col(orderBy)).select(col(vecCol)).limit(sampleN)
    picked.collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
  }

  /** Train `k` centroids with Lloyd iterations on a bounded sample;
    * assignment afterwards is fully distributed. */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, sampleN: Int = 2000, orderBy: String = ""): Array[Array[Double]] =
    lloyd(orderedSample(df, vecCol, sampleN, orderBy), k, iters)

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

  /** Centroid indices nearest the query, by L2. */
  def nearestCentroids(query: Seq[Double], centroids: Array[Array[Double]],
      nProbe: Int): Seq[Int] =
    centroids.indices
      .sortBy { c =>
        centroids(c).zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      }.take(nProbe)

  /** IVF top-k: probe only the `nProbe` centroids nearest the query —
    * the scan prunes to ~nProbe/k of the data (with a cluster-partitioned
    * layout this becomes partition pruning at 100 TB — [[writeIvfIndex]]). */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 2): DataFrame = {
    val probes = nearestCentroids(query, centroids, nProbe).toSet
    ivfAssign(df, idCol, vecCol, centroids)
      .filter(col("cluster").isin(probes.toSeq: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Materialize the IVF index as a CLUSTER-PARTITIONED parquet layout:
    * one directory per centroid (`cluster=<c>/`), assignment computed
    * once by the distributed native argmin. This is the 100-TB shape —
    * a probe query then reads only the `nProbe` matching directories
    * (Spark partition pruning; the other ~`(k-nProbe)/k` of the corpus
    * is never opened). */
  def writeIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit =
    ivfAssign(df, idCol, vecCol, centroids)
      // `_crank` = stable within-cluster rank (by id), paid ONCE at
      // index build: a probe-time per-cluster cap is then a plain
      // pushed parquet filter (`_crank <= maxProbe`) instead of a
      // window shuffle over the touched partitions — the hot-partition
      // guard costs nothing when unhit.
      .withColumn("_crank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster")).orderBy(col(idCol))).cast("long"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Top-k over a [[writeIvfIndex]] layout: the `cluster IN (probes)`
    * filter prunes PARTITION DIRECTORIES at planning time — verify with
    * `.explain` (`PartitionFilters: [cluster IN (…)]`). */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, query: Seq[Double], k: Int,
      centroids: Array[Array[Double]], nProbe: Int = 2): DataFrame = {
    val probes = nearestCentroids(query, centroids, nProbe)
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*))
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Int8-quantized IVF index: the two 100-TB levers composed —
    * `cluster=<c>/` partition layout (probe = partition pruning, only
    * nProbe/k of the directories open) where each stored row carries
    * the [[quantizeEmbeddings]] codes instead of the float vector
    * (4× fewer bytes per opened row). Cluster assignment runs on the
    * ORIGINAL floats before quantization, so pruning recall matches
    * the float index exactly. */
  def writeIvfIndexQuantized(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit = {
    quantizeEmbeddings(ivfAssign(df, idCol, vecCol, centroids),
        idCol, vecCol, carryCols = Seq("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
  }

  /** Asymmetric top-k over a [[writeIvfIndexQuantized]] layout:
    * partition pruning on the probed clusters, dequantized scoring
    * against the full-precision query. */
  def ivfTopKFromQuantizedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, query: Seq[Double], k: Int,
      centroids: Array[Array[Double]], nProbe: Int = 2): DataFrame = {
    val probes = nearestCentroids(query, centroids, nProbe)
    quantizedTopK(
      spark.read.parquet(path).filter(col("cluster").isin(probes: _*)),
      idCol, query, k)
  }

  // ---- Batch k-NN join ----------------------------------------------------

  /** Batch k-NN JOIN: exact cosine top-`k` for MANY query vectors in
    * ONE corpus scan. `queries` is a bounded driver-side set (an eval
    * or probe set — small by definition, like the centroid tables);
    * it rides into the scan inside the task closure.
    *
    * Scale shape: the naive formulation (cross join queries, window
    * per query) shuffles |corpus| × |queries| scored rows — the 100 TB
    * killer. Here each partition keeps a BOUNDED top-`k` heap per
    * query while it streams (genuine per-partition imperative state —
    * the documented `mapPartitions` case), so exactly
    * partitions × queries × k candidate rows leave the scan; the
    * global resolve is a window over that metadata-sized set. Heap
    * ordering (cosine desc, id asc) matches the final window exactly,
    * and the dot/norm folds run in index order, so results are
    * reproducible across engines bit-for-bit (same guarantee as
    * [[bruteForceTopK]]).
    *
    * Output: (qid, `idCol`, cosine, rank) with rank 1..k per query. */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Seq[Double])], k: Int): DataFrame = {
    require(queries.nonEmpty, "no queries")
    require(k > 0, "k must be positive")
    val qDims = queries.map(_._2.length).distinct
    require(qDims.size == 1 && qDims.head > 0,
      s"knnJoin: query vectors must share one non-zero dimension, got $qDims")
    val dim = qDims.head
    val spark = df.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Double], Double)] = queries.sortBy(_._1).map {
      case (qid, v) =>
        (qid, v.toArray, math.sqrt(v.iterator.map(x => x * x).sum))
    }.toArray
    val kk = k
    // explicit widening cast so ANY numeric vector column works —
    // float→double is exact, and the oracle casts to DOUBLE[] the
    // same way, so parity is unchanged
    val local = df.select(col(idCol).cast("long"),
        col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { iter =>
        // min-heap on "goodness": head = worst kept (lowest cosine,
        // ties → HIGHEST id, so a lower id displaces its equal-cosine peer)
        val ord: Ordering[(Double, Long)] =
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)
        val heaps = qArr.map(_ =>
          new java.util.PriorityQueue[(Double, Long)](kk, ord))
        iter.foreach { case (id, vec) =>
          // fail-fast with the offending id: a null or mis-sized corpus
          // vector would otherwise surface as an opaque executor NPE /
          // ArrayIndexOutOfBounds (or a silently-truncated dot product
          // when the corpus vector is LONGER than the query)
          if (vec == null) throw new IllegalArgumentException(
            s"knnJoin: null embedding for id=$id")
          if (vec.length != dim) throw new IllegalArgumentException(
            s"knnJoin: id=$id has dimension ${vec.length}, queries have $dim")
          // row norm once per row, not once per (row, query)
          var vn = 0.0; var i = 0
          while (i < vec.length) {
            val x = vec(i); vn += x * x; i += 1
          }
          val rowNorm = math.sqrt(vn)
          var q = 0
          while (q < qArr.length) {
            val qv = qArr(q)._2
            val qn = qArr(q)._3
            var dot = 0.0; var j = 0
            while (j < qv.length) { dot += vec(j) * qv(j); j += 1 }
            val den = rowNorm * qn
            val cos = if (den == 0) 0.0 else dot / den
            val h = heaps(q)
            if (h.size < kk) h.add((cos, id))
            else {
              // admission consistent with the heap's total ordering and
              // the final window (java.lang.Double.compare is NaN-total
              // like Spark's sort) — a primitive > would make NaN
              // handling depend on arrival order/partitioning. Compared
              // primitively so the steady-state rejection allocates
              // nothing; the tuple is built only on admission.
              val w = h.peek()
              val c = java.lang.Double.compare(cos, w._1)
              if (c > 0 || (c == 0 && id < w._2)) { h.poll(); h.add((cos, id)) }
            }
            q += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, q) =>
          val qid = qArr(q)._1
          Iterator.continually(h.poll()).takeWhile(_ != null)
            .map { case (cos, id) => (qid, id, cos) }
        }
      }
      .toDF("qid", "_nid", "cosine")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("_nid"))
    local.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("_nid").as(idCol), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** HARD-NEGATIVE mining for embedding-model training: for each
    * query, the `k` most-similar corpus vectors that are NOT
    * near-duplicates of it — "hard" because they rank at the top by
    * cosine, "negative" because duplicate-cluster co-membership (under
    * `dupPairs`, e.g. [[Dedup.embeddingNearDupPairs]] output) is
    * excluded, so a positive can never leak into the negative set.
    *
    * EXACT despite the filter: candidates come from ONE [[knnJoin]]
    * scan at `k + maxQueryClusterSize` — a query can lose at most ITS
    * OWN cluster's members from its top list, so the pad only needs
    * the largest cluster containing a QUERY id, not the corpus-wide
    * maximum (a corpus-wide pad is correct but scale-hostile: one
    * dense boilerplate cluster of n members anywhere inflates every
    * per-partition heap to k+n — measured 13× at 10× data before this
    * bound was tightened). The co-membership exclusion set is built the
    * same way: query rows only, joined to their cluster's members —
    * |queries| × maxQueryCluster rows, never the Σ n_c² corpus-wide
    * pair closure. The anti-join meets the queries×(k+pad)-row
    * candidate set, never the corpus. Returns
    * (qid, `idCol`, cosine, neg_rank 1..k). */
  def mineHardNegatives(df: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Seq[Double])], k: Int,
      dupPairs: DataFrame): DataFrame = {
    require(k > 0, "k must be positive")
    val clusters = Dedup.connectedComponents(dupPairs)
    val qids = queries.map(_._1)
    // clusters that contain a query id (≤ |queries| rows after distinct)
    val qClusters = clusters.filter(col("id").isin(qids: _*))
      .select(col("cluster"), col("id").as("qid"))
    val maxQCluster = clusters
      .join(qClusters.select(col("cluster")).distinct(), "cluster")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val kPad = k + math.min(maxQCluster, 1000000L).toInt
    val cand = knnJoin(df, idCol, vecCol, queries, kPad)
    val excl = qClusters
      .join(clusters.select(col("cluster"), col("id").as(idCol)), "cluster")
      .select(col("qid"), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col(idCol))
    cand.join(excl, Seq("qid", idCol), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("qid"), col(idCol), col("cosine"), col("neg_rank"))
  }

  // ---- Nearest-centroid (Rocchio) classification --------------------------

  /** Per-label MEAN vectors — the supervised counterpart of k-means
    * training: one two-level aggregate (`posexplode` → avg per
    * (label, dim), map-side partials), result bounded at
    * labels × dim rows by construction, so the driver collect is
    * metadata-sized no matter how many vectors feed it. Components
    * are rounded to 6 places so independently-computed centroids
    * (e.g. an oracle engine summing in a different order) agree
    * exactly. Returns (label, centroid) sorted by label. */
  def labelCentroids(df: DataFrame, labelCol: String,
      vecCol: String): Seq[(Int, Seq[Double])] = {
    val rows = df
      .select(col(labelCol).cast("int").as("_l"), posexplode(col(vecCol)))
      .groupBy(col("_l"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("m"))
      .collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (lab, rs) =>
      lab -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
    }
  }

  /** Nearest-centroid classification: tag every row with the label of
    * its highest-cosine centroid (ties → smallest label) plus that
    * cosine, as appended `pred`/`score` columns. One codegen'd
    * projection — `labels` native cosine kernels per row, centroids
    * riding in the plan — ZERO shuffles and no join at any corpus
    * size; the expensive part (the centroid table) is already reduced.
    * Cosines compare ROUNDED to 6 places so the chosen label is
    * reproducible across engines. */
  def classifyByCentroids(df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    // argmax via ONE greatest() over (score, -label) structs — O(L)
    // expression nodes. (A when-chain fold references its accumulator
    // twice per step, doubling the Catalyst tree per label: O(2^L)
    // planning at realistic label counts.) Struct ordering compares
    // fields left to right, so max = highest score, ties → highest
    // -label = SMALLEST label.
    val scored = centroids.map { case (lab, c) =>
      struct(round(cosineToQuery(col(vecCol), c), 6).as("s"), lit(-lab).as("nl"))
    }
    val best = if (scored.length == 1) scored.head else greatest(scored: _*)
    df.withColumn("pred", -best.getField("nl"))
      .withColumn("score", best.getField("s"))
  }

  // ---- Product quantization (PQ) — the COMPRESSED 100-TB ANN path --------
  //
  // At 10¹⁰ vectors even ids+floats don't fit hot storage; PQ stores M
  // small codes per vector (here M bytes-worth) and answers queries by
  // asymmetric distance (ADC): the query precomputes an M×K lookup
  // table and every row costs M table lookups instead of a dim-length
  // dot product — the scan reads codes, never raw vectors.

  /** Train per-subspace codebooks: the vector is split into `m` equal
    * subspaces and each gets its own `k`-centroid Lloyd run over the
    * same ordered sample. Returns `[m][k][dim/m]`. */
  def trainPq(df: DataFrame, vecCol: String, m: Int, k: Int,
      iters: Int = 3, sampleN: Int = 2000,
      orderBy: String = ""): Array[Array[Array[Double]]] = {
    val sample = orderedSample(df, vecCol, sampleN, orderBy)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { sub =>
      lloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub)), k, iters)
    }
  }

  /** Distributed PQ encode: per subspace, the sliced vector goes
    * through the codegen'd argmin ([[graft.functions.NearestCentroid]]);
    * the codebooks ride inside the expressions (broadcast with the
    * plan). Output column `codes`: array of `m` centroid ids — the
    * compressed representation a 100-TB deployment persists INSTEAD of
    * the raw vectors. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    df.select(col(idCol), array((0 until m).map { sub =>
      graft.functions.NearestCentroid.nearest_centroid(
        slice(col(vecCol), lit(sub * dsub + 1), lit(dsub)), codebooks(sub))
    }: _*).as("codes"))
  }

  /** The query's M×K squared-L2 lookup tables (computed once,
    * driver-side; subspace-major, centroid-minor). */
  private def adcTables(query: Seq[Double],
      codebooks: Array[Array[Array[Double]]]): Seq[Seq[Double]] = {
    val dsub = codebooks.head.head.length
    codebooks.zipWithIndex.map { case (cb, sub) =>
      cb.toSeq.map { c =>
        var d = 0.0
        var j = 0
        while (j < dsub) { val x = query(sub * dsub + j) - c(j); d += x * x; j += 1 }
        d
      }
    }.toSeq
  }

  /** Approximate distance over a `codes` column: M table lookups summed
    * subspace-major (left to right — the order an independent engine
    * must reproduce); the tables ride as plan literals. */
  private def adcDistance(tables: Seq[Seq[Double]]): Column =
    tables.indices.map { sub =>
      element_at(typedlit(tables(sub)), element_at(col("codes"), sub + 1) + 1)
    }.reduce(_ + _)

  /** ADC top-k: encode + lookup-sum, smallest first —
    * TakeOrderedAndProject, no sort, no join. Ordering uses the
    * ROUNDED distance so engine-identical ties resolve by id
    * identically. */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    pqEncode(df, idCol, vecCol, codebooks)
      .select(col(idCol), round(adcDistance(adcTables(query, codebooks)), 6)
        .as("adist"))
      .orderBy(col("adist").asc, col(idCol))
      .limit(k)

  /** The COMPLETE 100-TB ANN layout — IVF × PQ: one parquet directory
    * per coarse cluster, holding (id, codes) ONLY. A probe query then
    * (a) prunes to `nProbe` directories (partition pruning — the other
    * ~(k-nProbe)/k of the corpus is never opened) and (b) reads M
    * small ints per surviving row instead of the raw vector. Both the
    * coarse assignment and the subspace encodes are one projection of
    * codegen'd argmins — a single scan writes the index. */
  def writeIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    df.select(col(idCol),
      graft.functions.NearestCentroid.nearest_centroid(col(vecCol), centroids)
        .as("cluster"),
      array((0 until m).map { sub =>
        graft.functions.NearestCentroid.nearest_centroid(
          slice(col(vecCol), lit(sub * dsub + 1), lit(dsub)), codebooks(sub))
      }: _*).as("codes"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
  }

  /** ADC top-k over a [[writeIvfPqIndex]] layout: `cluster IN (probes)`
    * prunes partition directories at planning time, and the scan's
    * ReadSchema is (id, codes) — no vector column exists to read. */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, query: Seq[Double], k: Int,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], nProbe: Int = 2): DataFrame = {
    val probes = nearestCentroids(query, centroids, nProbe)
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*))
      .select(col(idCol), round(adcDistance(adcTables(query, codebooks)), 6)
        .as("adist"))
      .orderBy(col("adist").asc, col(idCol))
      .limit(k)
  }

  // ---- SemDeDup — semantic (embedding-space) deduplication ---------------
  //
  // The published SemDeDup recipe (Abbas et al. 2023, arXiv 2303.09540 —
  // public): k-means the embedding space, then look for pairs above a
  // cosine threshold ONLY within each cluster — cross-cluster pairs are
  // deliberately out of scope, which is what makes the pair step
  // tractable at corpus scale (k scales with n, clusters stay
  // bounded-ish, and the quadratic step runs per cluster, never
  // globally).

  /** Within-cluster semantic-duplicate pairs: k-means assignment (the
    * deterministic ordered-sample Lloyd shared with [[trainCentroids]] /
    * [[ivfAssign]]) followed by per-cluster pair generation and exact
    * cosine verification.
    *
    * Distributed shape: training is driver-side over a bounded sample
    * (the [[trainCentroids]] convention); assignment is one codegen'd
    * argmin scan; pair generation is the shared bucket machinery
    * (cluster = bucket, skew-capped by `maxBucket` with drop accounting,
    * 0 = exact/oracle mode); the expensive vector re-join happens only
    * for surviving candidates.
    *
    * Candidates are pre-pruned LOSSLESSLY by the triangle inequality
    * before vectors are re-joined: for unit vectors â, b̂ and the
    * cluster's own unit anchor ĉ, |d(â,ĉ) − d(b̂,ĉ)| ≤ d(â,b̂), and
    * cos(a,b) ≥ τ ⟺ d(â,b̂) ≤ δ = √(2−2τ) — so a pair whose
    * centroid-distance gap exceeds δ cannot qualify and is dropped
    * carrying only two doubles, not two vectors. At τ = 0.95+ (the
    * published operating range) δ ≈ 0.3 and most of a cluster's
    * quadratic candidate mass dies here; at low τ the filter passes
    * everything and costs one broadcast join.
    *
    * Returns (id1 < id2, cosine) with cosine ≥ `threshold`. */
  def semDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 64, iters: Int = 3, sampleN: Int = 2000,
      maxBucket: Int = 1000, orderBy: String = ""): DataFrame = {
    require(threshold > -1 && threshold <= 1, "threshold must be in (-1, 1]")
    val spark = df.sparkSession
    val centroids = trainCentroids(df, vecCol, k, iters, sampleN, orderBy)
    val delta = math.sqrt((2.0 - 2.0 * threshold).max(0.0))
    val centDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
          org.apache.spark.sql.Row(i, c.toSeq) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("_cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false),
          nullable = false))))
    // one row per input: (cluster, id, dc) where dc is the UNIT-sphere
    // distance to the cluster anchor — the annulus key
    val assigned = ivfAssign(df, idCol, vecCol, centroids)
      .join(broadcast(centDf), "cluster")
      .select(col("cluster"), col(idCol).as("id"),
        sqrt(greatest(lit(0.0),
          lit(2.0) - lit(2.0) * graft.functions.VecOps.cosine_sim(
            col(vecCol), col("_cv")))).as("dc"))
    val members = Dedup.capBuckets(assigned, Seq("cluster"), "id",
      maxBucket, "semdedup")
    val cand = Dedup.bucketPairs(members, Seq("cluster"), "id", Seq("dc"),
      bounded = maxBucket > 0)
      .filter(abs(col("dc1") - col("dc2")) <= delta)
      .select("id1", "id2")
    val vecs = df.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    cand
      .join(vecs.select(col("_vid").as("id1"), col("_vv").as("v1")), "id1")
      .join(vecs.select(col("_vid").as("id2"), col("_vv").as("v2")), "id2")
      .select(col("id1"), col("id2"),
        graft.functions.VecOps.cosine_sim(col("v1"), col("v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** INCREMENTAL SemDeDup — the production ARRIVAL path (the embedding
    * twin of [[graft.operators.Dedup.incrementalNearDups]]): the corpus
    * is indexed ONCE in the [[writeIvfIndex]] layout (cluster-partitioned
    * parquet under centroids trained on the corpus's deterministic
    * ordered sample), and each NEW batch assigns to its nearest cluster
    * and joins ONLY the matching cluster partitions — the corpus is
    * never rescanned or re-paired against itself. Exact cosine ≥
    * `threshold` verifies the candidates, so results equal the batch
    * [[semDedupPairs]] contract restricted to (new × corpus) pairs in
    * shared clusters.
    *
    * Scale shape: the batch side is small by definition (one arrival
    * window), so the cluster equi-join broadcasts it; with the index
    * laid out `cluster=<c>/`, the only corpus bytes read are the
    * clusters the batch actually touches (partition pruning — the same
    * lever as [[ivfTopKFromIndex]]). Returns (new_id, corpus_id,
    * cosine ≥ threshold).
    *
    * `maxProbe` (default ON, mirroring the minhash band cap): at most
    * that many corpus rows are probed per touched cluster — the guard
    * for BURSTY, cluster-skewed arrivals (one hot topic → one hot IVF
    * partition → that partition's full occupancy × the batch). The cap
    * rides the index's build-time `_crank` rank as a pushed parquet
    * filter (lowest ids win — deterministic), so it adds no shuffle
    * and costs nothing when unhit. 0 = exact/oracle mode. */
  def semDedupIncremental(spark: SparkSession, indexPath: String,
      batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      maxProbe: Int = 1000): DataFrame = {
    val assigned = ivfAssign(batch, idCol, vecCol, centroids)
      .select(col("cluster"), col(idCol).as("new_id"), col(vecCol).as("_nv"))
    val idx = probeCapped(spark.read.parquet(indexPath), maxProbe)
      .select(col("cluster"), col(idCol).as("corpus_id"), col(vecCol).as("_cv"))
    idx.join(broadcast(assigned), "cluster")
      .select(col("new_id"), col("corpus_id"),
        graft.functions.VecOps.cosine_sim(col("_nv"), col("_cv")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** IVF INDEX MAINTENANCE decision table — the trigger policy behind
    * [[semDedupIncremental]]'s static index. Production arrivals
    * eventually make the build-time centroids STALE (assignment
    * quality decays as the distribution drifts) and skew hot clusters
    * past what the `maxProbe` cap merely HIDES (probe capping bounds
    * the join, it doesn't fix the layout). The policy measures both
    * from data the pipeline already has — the index layout's
    * per-cluster occupancy (the `cluster` PARTITION column alone: no
    * vector bytes are read) and the arrival log (the [[ivfAssign]]
    * output every incremental batch produced anyway) — and emits one
    * row per cluster plus the global decision, the K9-style decision
    * table a scheduler acts on:
    *
    *   - `stale_index` (global): arrivals since build exceed
    *     `arrivalFrac` of the indexed rows → `reindex` (retrain
    *     centroids over corpus+arrivals, rewrite the layout);
    *   - `hot` (per cluster): projected occupancy (indexed + arrived)
    *     exceeds `hotOccupancy` × the mean → `split_cluster` (local
    *     compaction: retrain that cluster's members into
    *     sub-partitions) — the targeted fix while the index as a
    *     whole is still fresh;
    *   - otherwise `ok`.
    *
    * Scale shape: two map-side-combined counts, one broadcast of the
    * ≤k-row totals, zero data-sized shuffles — the cost is independent
    * of arrival skew (drift shifts the DECISION, never the plan;
    * ScaleProbe's `ivf_maintenance_drift` family pins this). Pure
    * integer/double arithmetic → an external SQL oracle reproduces
    * the table exactly. */
  def ivfMaintenancePlan(index: DataFrame, arrivals: DataFrame,
      arrivalFrac: Double = 0.2, hotOccupancy: Double = 4.0): DataFrame = {
    val idxCounts = index.groupBy("cluster").agg(count(lit(1)).as("n_indexed"))
    val arrCounts = arrivals.groupBy("cluster").agg(count(lit(1)).as("n_arrived"))
    val per = idxCounts.join(arrCounts, Seq("cluster"), "full_outer")
      .select(col("cluster"),
        coalesce(col("n_indexed"), lit(0L)).as("n_indexed"),
        coalesce(col("n_arrived"), lit(0L)).as("n_arrived"))
    val totals = per.agg(sum("n_indexed").as("_N"), sum("n_arrived").as("_A"),
      count(lit(1)).as("_k"))
    per.crossJoin(broadcast(totals))
      .withColumn("occupancy", col("n_indexed") + col("n_arrived"))
      .withColumn("occ_ratio",
        round(col("occupancy") * col("_k") / (col("_N") + col("_A")), 6))
      .withColumn("arrival_frac", round(col("_A") / col("_N"), 6))
      .withColumn("stale_index", col("_A") > lit(arrivalFrac) * col("_N"))
      .withColumn("hot", col("occupancy") * col("_k") >
        lit(hotOccupancy) * (col("_N") + col("_A")))
      .withColumn("action",
        when(col("stale_index"), lit("reindex"))
          .when(col("hot"), lit("split_cluster"))
          .otherwise(lit("ok")))
      .select("cluster", "n_indexed", "n_arrived", "occupancy", "occ_ratio",
        "arrival_frac", "stale_index", "hot", "action")
  }

  /** The `maxProbe` filter for an index scan: prefers the build-time
    * `_crank` rank (pushed to parquet); an index written before the
    * rank existed fails loudly rather than silently probing uncapped. */
  private def probeCapped(idx: DataFrame, maxProbe: Int): DataFrame =
    if (maxProbe <= 0) idx
    else {
      require(idx.columns.contains("_crank"),
        "maxProbe > 0 needs an index with the build-time `_crank` rank — " +
          "rebuild it with writeIvfIndex, or pass maxProbe = 0")
      idx.filter(col("_crank") <= maxProbe)
    }

  /** STREAMING twin of [[semDedupIncremental]] — arrival vectors as a
    * stream: cluster assignment is a STATELESS projection (centroids
    * ride in the plan), then a stream-static equi-join against the
    * persisted index and the exact cosine verify. No state store at
    * all — every micro-batch is independent, so streaming output
    * equals the batch operator on the same rows and the same SQL
    * oracle checks both. (Here the STATIC side is the join's
    * broadcast candidate — a stream can't broadcast — so the planner
    * broadcasts index clusters per micro-batch; at index scale the
    * `cluster=<c>/` layout keeps the static scan prunable.) */
  def semDedupIncrementalStream(spark: SparkSession, indexPath: String,
      stream: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      maxProbe: Int = 1000): DataFrame = {
    val assigned = ivfAssign(stream, idCol, vecCol, centroids)
      .select(col("cluster"), col(idCol).as("new_id"), col(vecCol).as("_nv"))
    val idx = probeCapped(spark.read.parquet(indexPath), maxProbe)
      .select(col("cluster"), col(idCol).as("corpus_id"), col(vecCol).as("_cv"))
    assigned.join(idx, "cluster")
      .select(col("new_id"), col("corpus_id"),
        graft.functions.VecOps.cosine_sim(col("_nv"), col("_cv")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup keep-set: connected components over [[semDedupPairs]],
    * keep the smallest id per semantic-duplicate group (plus every
    * unpaired row). Returns the kept ids as (`idCol`). */
  def semDedupKeep(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 64, iters: Int = 3, sampleN: Int = 2000,
      maxBucket: Int = 1000, orderBy: String = ""): DataFrame = {
    val pairs = semDedupPairs(df, idCol, vecCol, threshold, k, iters,
      sampleN, maxBucket, orderBy).select("id1", "id2")
    val labels = Dedup.connectedComponents(pairs)
    val drop = labels.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.select(col(idCol)).join(drop, Seq(idCol), "left_anti")
  }

  /** EMBEDDING QUALITY REPORT per group: vector count, dimension
    * min/max (a mixed-dim group is a broken ingest), zero-norm and
    * NaN-carrying vector counts (both poison cosine math downstream),
    * and the mean L2 norm (un-normalized embeddings show up here
    * before they skew a dot-product ANN index). One aggregate pass. */
  def embeddingQuality(df: DataFrame, vecCol: String,
      groupCol: String): DataFrame = {
    val n = norm(col(vecCol))
    df.groupBy(col(groupCol).as("_g")).agg(
        count(lit(1)).as("n_vectors"),
        min(size(col(vecCol))).cast("long").as("dim_min"),
        max(size(col(vecCol))).cast("long").as("dim_max"),
        sum(when(n === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(exists(col(vecCol), x => isnan(x)), 1L).otherwise(0L))
          .as("n_nan"),
        round(avg(n), 6).as("mean_norm"))
      .select(col("_g").as(groupCol), col("n_vectors"), col("dim_min"),
        col("dim_max"), col("n_zero"), col("n_nan"), col("mean_norm"))
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein, SIGIR '98 —
    * public): greedily re-pick `k` of each query's candidates, each
    * step taking the unselected candidate maximizing
    *
    *   marginal = λ·score − (1−λ)·max_{s ∈ selected} cos(cand, s)
    *
    * (step 1 has no diversity term: marginal = λ·score). Ties break to
    * the smaller id. Scores and pairwise cosines are 6-dp-rounded
    * BEFORE the greedy, so every downstream float (products of rounded
    * doubles and the λ literals) is bit-identical on any engine — an
    * external SQL oracle can unroll the exact selection trajectory.
    * The EMITTED marginal rounds to 5 dp: λ·(6-dp score) carries exactly
    * 7 decimal digits ending in 5, so a 6-dp emission would sit on the
    * half-rounding boundary for EVERY row — the one place engines'
    * round() implementations legitimately disagree; at 5 dp the
    * remainder never hits the boundary.
    *
    * Scale shape: candidates are rank lists (|Q|·m rows, m = a small
    * re-rank window), grouped per query — the O(k·m) greedy with its
    * O(m²) cosine table runs on constant-bounded data per key. This is
    * deliberately a typed mapGroups (a deserialization boundary): the
    * corpus never reaches it, only the already-top-m candidates. */
  def mmrRerank(cands: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, vecCol: String, k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    val spark = cands.sparkSession
    import spark.implicits._
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ds = cands.select(col(queryCol).cast("long").as("_q"),
        col(idCol).cast("long").as("_id"),
        col(scoreCol).cast("double").as("_s"),
        col(vecCol).cast("array<double>").as("_v"))
      .as[(Long, Long, Double, Seq[Double])]
    val out = ds.groupByKey(_._1).flatMapGroups { (q, it) =>
      val cs = it.toArray.sortBy(c => (-c._3, c._2))
      val m = cs.length
      // ascending-index dot fold + zero-norm guard: the exact float
      // trajectory of the SQL list_sum/list_transform formulation
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { dot += a(i) * b(i); i += 1 }
        i = 0; while (i < a.length) { na += a(i) * a(i); i += 1 }
        i = 0; while (i < b.length) { nb += b(i) * b(i); i += 1 }
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) 0.0 else dot / denom
      }
      val sim = Array.tabulate(m, m)((i, j) =>
        if (i == j) 1.0 else rnd6(cos(cs(i)._4, cs(j)._4)))
      val selected = collection.mutable.ArrayBuffer.empty[Int]
      val picked = Array.fill(m)(false)
      val result = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      var step = 1
      while (step <= k && selected.length < m) {
        var best = -1; var bestMarg = Double.NegativeInfinity
        var i = 0
        while (i < m) {
          if (!picked(i)) {
            val div =
              if (selected.isEmpty) 0.0
              else selected.iterator.map(j => sim(i)(j)).max
            val marg =
              if (selected.isEmpty) lambda * cs(i)._3
              else lambda * cs(i)._3 - (1 - lambda) * div
            // strict > keeps the smallest id on ties (cs is id-sorted
            // within equal scores and scan order is ascending)
            if (marg > bestMarg ||
                (marg == bestMarg && best >= 0 && cs(i)._2 < cs(best)._2)) {
              best = i; bestMarg = marg
            }
          }
          i += 1
        }
        picked(best) = true
        selected += best
        result += ((q, cs(best)._2, step.toLong,
          BigDecimal(bestMarg).setScale(5,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
        step += 1
      }
      result.iterator
    }
    out.toDF(queryCol, idCol, "mmr_rank", "marginal")
  }

  /** Retrieval-quality metrics (binary relevance) per query — the
    * standard IR evaluation battery over a ranked `run` (one row per
    * (query, doc) with a 1-based `rank` ≤ k, e.g. [[knnJoin]] or
    * `TextAnalysis.bm25TopK` output) against a `qrels` table of
    * (query, relevant doc) pairs:
    *
    *  - `ndcg` — DCG@k with gain 1/log2(rank+1) over the ideal DCG for
    *    min(|rel|, k) items (0 when the query has no relevant docs);
    *  - `mrr` — 1/rank of the first relevant hit (0 when none);
    *  - `precision` — relevant hits in the top k over k;
    *  - `recall` — relevant hits over |rel|.
    *
    * Queries absent from `qrels` are dropped (undefined denominators).
    * All metrics round to 6 dp.
    *
    * Scale shape: run ⋈ qrels is an equi-join on (query, doc) — both
    * sides are rank-list-sized (|Q|·k and |qrels| rows), never
    * corpus-sized; per-query reduction is one hash aggregate. The ideal
    * DCG is a k-row cumulative table built once and broadcast, so no
    * per-row log sums re-derive it. */
  def retrievalMetrics(run: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "qid", docCol: String = "vec_id",
      rankCol: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = run.sparkSession
    import org.apache.spark.sql.expressions.Window
    val rel = qrels.select(col(queryCol).as("_q"), col(docCol).as("_d"))
      .distinct()
    val nrel = rel.groupBy(col("_q")).agg(count(lit(1)).as("_nrel"))
    val marked = run.select(col(queryCol).as("_q"), col(docCol).as("_d"),
        col(rankCol).cast("long").as("_r"))
      .filter(col("_r") <= k)
      .join(rel.withColumn("_rel", lit(1.0)), Seq("_q", "_d"), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0.0)))
    val perq = marked.groupBy(col("_q")).agg(
      sum(col("_rel") / log2(col("_r") + 1)).as("_dcg"),
      sum(col("_rel")).as("_hits"),
      min(when(col("_rel") === 1.0, col("_r"))).as("_fr"))
    // ideal cumulative DCG: i → Σ_{j≤i} 1/log2(j+1), ascending
    // summation so any engine replays the identical float trajectory;
    // k rows — the single-partition window is a constant-sized table
    val ideal = spark.range(1, k + 1).select(col("id").as("_i"),
      sum(lit(1.0) / log2(col("id") + 1))
        .over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("_idcg"))
    perq.join(nrel, "_q")
      .withColumn("_cap", least(col("_nrel"), lit(k.toLong)))
      .join(broadcast(ideal), col("_cap") === col("_i"), "left")
      .select(col("_q").as(queryCol),
        round(when(col("_idcg").isNull || col("_idcg") === 0.0, 0.0)
          .otherwise(col("_dcg") / col("_idcg")), 6).as("ndcg"),
        round(coalesce(lit(1.0) / col("_fr"), lit(0.0)), 6).as("mrr"),
        round(col("_hits") / k, 6).as("precision"),
        round(col("_hits") / col("_nrel"), 6).as("recall"))
  }
}
