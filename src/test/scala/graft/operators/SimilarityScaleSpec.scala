package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scale-safety features of the SRP-LSH path: adaptive plane count,
  * per-bucket candidate caps on skewed data, multi-table
  * OR-construction recall, and portable/native simhash agreement. */
class SimilarityScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("adaptivePlanes scales ~log2(n/target) and clamps") {
    assert(Similarity.adaptivePlanes(1000, 64) == 4)
    assert(Similarity.adaptivePlanes(100000, 64) == 11)
    assert(Similarity.adaptivePlanes(1000L * 1000 * 1000, 64) == 24)
    assert(Similarity.adaptivePlanes(10, 64) == 4) // lower clamp
    assert(Similarity.adaptivePlanes(Long.MaxValue, 1) == 30) // upper clamp
  }

  test("planes = 0 engages the adaptive count without changing results shape") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(2.0f, 4.0f, 6.0f, 8.0f)),
      (3L, Array(-1.0f, -2.0f, -3.0f, -4.0f))
    ).toDF("id", "vec")
    val pairs = Similarity.lshCandidatePairs(df, "id", "vec", planes = 0)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("per-bucket cap bounds pair generation on a hot bucket (skew guard)") {
    // 100 identical vectors → ONE bucket per table; uncapped pair count
    // is 100*99/2 = 4950, capped at 10 members it is 10*9/2 = 45.
    val hot = (1L to 100L).map(i => (i, Array(1.0f, 1.0f, 0.5f, 0.25f))).toDF("id", "vec")
    val uncapped = Similarity.lshCandidatePairs(hot, "id", "vec",
      planes = 6, tables = 1).count()
    assert(uncapped == 4950)
    val capped = Similarity.lshCandidatePairs(hot, "id", "vec",
      planes = 6, tables = 1, maxBucket = 10).count()
    assert(capped == 45)
    // the kept members are the lowest ids (deterministic, not arbitrary)
    val ids = Similarity.lshCandidatePairs(hot, "id", "vec",
      planes = 6, tables = 1, maxBucket = 10)
      .select("id2").as[Long].collect()
    assert(ids.max == 10L)
  }

  test("DEFAULT args are scale-safe: 10k duplicate vectors stay bounded with drops observed") {
    // All-duplicates corpus — the web-boilerplate worst case. With the
    // defaults (adaptive planes, maxBucket = 1000) the single hot bucket
    // per table is capped: pairs = C(1000, 2) instead of C(10000, 2),
    // and the drop count surfaces as the observed metric.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var observed: Option[Long] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("srp_cap_"))
            observed = Some(row.getAs[Long]("dropped_members"))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val dup = (1L to 10000L).map(i => (i, Array(0.3f, -1.2f, 0.8f, 2.1f)))
        .toDF("id", "vec")
      val n = Similarity.lshCandidatePairs(dup, "id", "vec").count()
      assert(n == 1000L * 999 / 2, s"expected C(1000,2) capped pairs, got $n")
      val deadline = System.nanoTime() + 10e9.toLong
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      // 9000 dropped per table × 2 tables per evaluation; the self-join
      // may evaluate the capped subtree once (reused exchange) or twice.
      assert(observed.exists(d => d > 0 && d % 18000L == 0), s"observed=$observed")
    } finally spark.listenerManager.unregister(listener)
  }

  test("lshTopK adaptive planes keep the candidate FRACTION shrinking at 10x rows") {
    // k >= n makes lshTopK return every probe-filter survivor, so the
    // row count IS the candidate count. With planes = 0 (adaptive) the
    // plane count grows with n — adaptivePlanes(400)=4, (4000)=6 —
    // so the expected candidate fraction DROPS as the corpus grows; a
    // fixed plane count would hold the fraction constant and pass
    // 10x the rows to the top-k at 10x data.
    val dim = 16
    def vecs(n: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(42)
      (1L to n.toLong).map(i =>
        (i, Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("id", "vec")
    }
    val q = {
      val rnd = new scala.util.Random(7)
      Seq.fill(dim)(rnd.nextGaussian())
    }
    val nS = 400; val nL = 4000
    val cS = Similarity.lshTopK(vecs(nS), "id", "vec", q, k = nS * 10).count()
    val cL = Similarity.lshTopK(vecs(nL), "id", "vec", q, k = nL * 10).count()
    val (fS, fL) = (cS.toDouble / nS, cL.toDouble / nL)
    assert(cS > 0 && cL > 0, "probe must keep some candidates")
    assert(fL < fS,
      f"candidate fraction should SHRINK with n under adaptive planes: $fS%.3f -> $fL%.3f")
    // and the absolute candidate count grows far slower than the data
    assert(cL.toDouble / cS < 6.0,
      f"10x rows must not mean ~10x candidates (got ${cL.toDouble / cS}%.1f x)")
  }

  test("multi-table OR-construction finds pairs a single table can miss") {
    // near-identical pairs (small angle): per-table hit prob < 1, so
    // with enough planted pairs the 4-table union strictly dominates
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0 until 40).flatMap { i =>
      val v = Array.tabulate(16)(j => base(j) * (1 + 0.02f * i) + 0.15f * rnd.nextGaussian().toFloat)
      val w = Array.tabulate(16)(j => v(j) + 0.02f * rnd.nextGaussian().toFloat)
      Seq((i * 2L, v), (i * 2L + 1, w)) // planted near-dup pair
    }
    val df = rows.toDF("id", "vec")
    def plantedFound(tables: Int): Int = {
      val found = Similarity.lshCandidatePairs(df, "id", "vec",
        planes = 10, tables = tables)
        .filter(col("id2") === col("id1") + 1 && col("id1") % 2 === 0)
        .count()
      found.toInt
    }
    val one = plantedFound(1)
    val four = plantedFound(4)
    assert(four >= one)
    assert(four >= 38, s"4-table recall too low: $four/40")
  }

  test("IVF index layout: cluster partitioning turns nProbe into partition pruning") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.trainCentroids(emb, "embedding", k = 8,
      iters = 3, sampleN = 500, orderBy = "vec_id")
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val query = (0 until dim).map(j => math.sin(j + 1).toDouble)
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString

    Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids, path)
    // one directory per populated cluster
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cluster=")).sorted
    assert(dirs.nonEmpty && dirs.length <= 8)

    val viaIndex = Similarity.ivfTopKFromIndex(spark, path, "vec_id",
      "embedding", query, k = 10, centroids, nProbe = 2)
    // partition pruning is visible in the scan: cluster is a partition
    // filter, not a data filter
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"expected cluster partition pruning:\n$plan")
    // and the result matches the assign-at-query-time path exactly
    val direct = Similarity.ivfTopK(emb, "vec_id", "embedding", query,
      k = 10, centroids, nProbe = 2)
    assert(viaIndex.collect().toSeq == direct.collect().toSeq)
  }

  test("PQ: codes compress, ADC ranks the planted near-neighbor first") {
    val rnd = new scala.util.Random(11)
    val dim = 32
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val near = base.map(v => v + 0.01f * rnd.nextGaussian().toFloat)
    val rows = (2L to 200L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat))) :+ (1L, near)
    val df = rows.toDF("id", "vec")
    val cbs = Similarity.trainPq(df, "vec", m = 4, k = 8, iters = 2,
      sampleN = 500, orderBy = "id")
    assert(cbs.length == 4 && cbs.head.length == 8 && cbs.head.head.length == 8)

    // encode: one code per subspace, all within [0, k)
    val codes = Similarity.pqEncode(df, "id", "vec", cbs)
    val arr = codes.select("codes").head().getSeq[Int](0)
    assert(arr.length == 4 && arr.forall(c => c >= 0 && c < 8))

    // the planted near-duplicate of `base` must rank first by ADC
    val top = Similarity.pqTopK(df, "id", "vec",
      base.map(_.toDouble).toSeq, k = 5, cbs).collect()
    assert(top.head.getLong(0) == 1L, s"expected planted neighbor first: ${top.toSeq}")
    // distances ascend
    val dists = top.map(_.getDouble(1)).toSeq
    assert(dists == dists.sorted)
  }

  test("IVF×PQ index: partition pruning over codes-only storage, parity with direct ADC") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val rest = emb.filter(col("vec_id") =!= 0)
    val centroids = Similarity.trainCentroids(rest, "embedding", k = 8,
      iters = 2, sampleN = 500, orderBy = "vec_id")
    val cbs = Similarity.trainPq(rest, "embedding", m = 4, k = 8,
      iters = 2, sampleN = 500, orderBy = "vec_id")
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val query = (0 until dim).map(j => math.cos(j + 1).toDouble)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString

    Similarity.writeIvfPqIndex(rest, "vec_id", "embedding", centroids, cbs, path)
    val viaIndex = Similarity.ivfPqTopKFromIndex(spark, path, "vec_id",
      query, k = 10, centroids, cbs, nProbe = 3)
    val plan = viaIndex.queryExecution.executedPlan.toString
    // pruned directories + codes-only read: no vector column in the scan
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"expected cluster partition pruning:\n$plan")
    assert(!plan.contains("embedding"), "index scan must not read vectors")

    // parity: the same probed clusters scanned directly give the same top-k
    val probes = Similarity.nearestCentroids(query, centroids, 3).toSet
    val direct = Similarity.pqTopK(
      Similarity.ivfAssign(rest, "vec_id", "embedding", centroids)
        .filter(col("cluster").isin(probes.toSeq: _*))
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", query, k = 10, cbs)
    assert(viaIndex.collect().toSeq == direct.collect().toSeq)
  }

  test("portable simhash pairs agree with the native xxhash64 path on planted dups") {
    val longA = (1 to 60).map(i => s"token$i").mkString(" ")
    val longB = (1 to 60).map(i => if (i == 30) "changed" else s"token$i").mkString(" ")
    val docs = Seq(
      (1L, longA), (2L, longB), // 1 of 60 tokens changed: tiny hamming
      (3L, "completely different text about distributed query engines and shuffles"),
      (4L, "completely different text about distributed query engines and shuffles"),
      (5L, "unrelated third topic entirely concerning oceanographic buoy telemetry")
    ).toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = pairSet(Dedup.simhashPairs(docs, "text", "doc_id"))
    val portable = pairSet(Dedup.simhashPairsPortable(docs, "text", "doc_id"))
    // identical docs (3,4) must be found by both paths; the unrelated
    // doc 5 by neither. The near-identical (1,2) pair sits near the
    // hamming boundary where different hash families may legitimately
    // disagree — simhash ≤3-of-60 is a sub-percent-change band — so it
    // is deliberately not asserted.
    assert(native.contains((3L, 4L)) && portable.contains((3L, 4L)))
    assert(!native.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!portable.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("mineHardNegatives: near-dup cluster co-members excluded, rank exact after pad") {
    import spark.implicits._
    // corpus: 10 is a near-dup of query 1 (and of 13 transitively); 11
    // ranks next by cosine; 12 is orthogonal
    val corpus = Seq(
      (10L, Seq(1.0f, 0.001f)),
      (13L, Seq(0.999f, 0.01f)),
      (11L, Seq(0.9f, 0.1f)),
      (12L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq(1L -> Seq(1.0, 0.0))
    // duplicate clusters: {1, 10, 13} via two edges
    val pairs = Seq((1L, 10L), (10L, 13L)).toDF("id1", "id2")
    val out = Similarity.mineHardNegatives(corpus, "vec_id", "embedding",
      queries, k = 2, pairs)
      .orderBy("neg_rank").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // 10 and 13 are cluster co-members of the query → excluded even
    // though they have the TOP cosines; 11 then 12 fill the k = 2 set
    assert(out.toSeq == Seq((11L, 1L), (12L, 2L)))
    // no dup pairs at all → plain knn result
    val none = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val plain = Similarity.mineHardNegatives(corpus, "vec_id", "embedding",
      queries, k = 2, none).orderBy("neg_rank").collect().map(_.getLong(1))
    assert(plain.toSeq == Seq(10L, 13L))
  }

  test("mineHardNegatives: a dense cluster with NO query member neither pads nor excludes") {
    import spark.implicits._
    // 50 mutually-near-dup corpus vectors (one big cluster, ids 100+)
    // that contain NO query id, plus the query's own 2-member cluster.
    // The pad must come from the QUERY's cluster (2), not the dense
    // one (50) — and the dense cluster's members must stay eligible
    // negatives (excluding them would be wrong, they're not the
    // query's duplicates).
    val dense = (0 until 50).map(i => (100L + i, Seq(0.8f + i * 0.001f, 0.6f)))
    val corpus = (Seq(
      (10L, Seq(1.0f, 0.001f)),  // query's near-dup
      (12L, Seq(0.0f, 1.0f))     // orthogonal filler
    ) ++ dense).toDF("vec_id", "embedding")
    val queries = Seq(1L -> Seq(1.0, 0.0))
    val pairs = (Seq((1L, 10L)) ++
      (0 until 49).map(i => (100L + i, 101L + i))).toDF("id1", "id2")
    val out = Similarity.mineHardNegatives(corpus, "vec_id", "embedding",
      queries, k = 3, pairs).orderBy("neg_rank").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // 10 is excluded (query's cluster); the best dense-cluster members
    // fill the ranks — highest first component wins on cosine
    assert(out.length == 3)
    assert(!out.exists(_._1 == 10L))
    assert(out.forall { case (id, _) => id >= 100L })
    assert(out.map(_._1).toSeq == Seq(149L, 148L, 147L))
  }

  test("semDedupIncremental: planted duplicate found, orthogonal arrival isn't, " +
      "corpus never pairs with itself") {
    // corpus: two tight groups along e1 and e2; batch: one exact copy of
    // a corpus vector (must report cosine 1.0), one orthogonal vector
    // (must report nothing at tau = 0.9)
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.98f, 0.15f, 0.0f))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // dup of corpus 1
      (101L, Array(0.0f, 0.0f, 0.0f, 1.0f))    // orthogonal to everything
    ).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(corpus, "embedding", k = 2,
      iters = 3, sampleN = 10, orderBy = "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("sdi_spec").toString
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", cents, dir)
    val out = Similarity.semDedupIncremental(spark, dir, batch,
        "vec_id", "embedding", cents, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the planted duplicate pairs with its cluster co-members only
    assert(out.exists { case (n, c, cos) => n == 100L && c == 1L && cos == 1.0 })
    assert(out.forall(_._1 == 100L))           // orthogonal batch row silent
    assert(out.forall { case (_, c, _) => c == 1L || c == 2L }) // e1 cluster
  }

  test("semDedupIncremental maxProbe: hot cluster probed cap-deep, lowest ids win") {
    // ONE hot direction: 40 corpus near-dups of e1 land in one IVF
    // cluster; a skewed arrival probes it. Cap 10 must bound the probe
    // to the 10 LOWEST corpus ids (the build-time `_crank` order) —
    // deterministic, and the pruned rows are exactly ids 11..40.
    val corpus = (1L to 40L).map { i =>
      (i, Array(1.0f, 0.001f * i, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(corpus, "embedding", k = 1,
      iters = 2, sampleN = 40, orderBy = "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("sdi_cap").toString
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", cents, dir)
    val batch = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.semDedupIncremental(spark, dir, batch,
        "vec_id", "embedding", cents, threshold = 0.9, maxProbe = 10)
      .collect().map(_.getLong(1)).sorted
    assert(capped.toSeq == (1L to 10L))
    // cap off (oracle mode): the full occupancy pairs
    val exact = Similarity.semDedupIncremental(spark, dir, batch,
        "vec_id", "embedding", cents, threshold = 0.9, maxProbe = 0)
      .collect().map(_.getLong(1)).sorted
    assert(exact.toSeq == (1L to 40L))
    // an index without the build-time rank fails LOUDLY under a cap
    val legacy = java.nio.file.Files.createTempDirectory("sdi_legacy").toString
    Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
      .write.mode("overwrite").partitionBy("cluster").parquet(legacy)
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedupIncremental(spark, legacy, batch,
        "vec_id", "embedding", cents, threshold = 0.9, maxProbe = 10).count()
    }
    assert(e.getMessage.contains("_crank"))
  }

  test("ivfMaintenancePlan: stale, hot and ok branches of the decision table") {
    // index: cluster 0 holds 12 of 16 indexed rows (hot), 1 and 2 hold
    // 2 each; arrivals: 2 rows to cluster 0, 1 to cluster 3 (absent
    // from the index). Totals: N=16, A=3, k=4, mean occupancy 4.75.
    val index = ((1 to 12).map(i => (i.toLong, 0)) ++
      Seq((13L, 1), (14L, 1), (15L, 2), (16L, 2)))
      .toDF("vec_id", "cluster")
    val arrivals = Seq((101L, 0), (102L, 0), (103L, 3))
      .toDF("vec_id", "cluster")

    // arrivalFrac above 3/16 → NOT stale: hot cluster gets
    // split_cluster, the rest ok; absent-from-index cluster 3 appears
    // with n_indexed = 0
    val fresh = Similarity.ivfMaintenancePlan(index, arrivals,
        arrivalFrac = 0.25, hotOccupancy = 1.5)
      .collect().map(r => r.getAs[Int]("cluster") -> r).toMap
    assert(fresh.keySet == Set(0, 1, 2, 3))
    assert(!fresh(0).getAs[Boolean]("stale_index"))
    assert(fresh(0).getAs[Long]("occupancy") == 14L)
    assert(fresh(0).getAs[Boolean]("hot") &&
      fresh(0).getAs[String]("action") == "split_cluster")
    assert(!fresh(1).getAs[Boolean]("hot") &&
      fresh(1).getAs[String]("action") == "ok")
    assert(fresh(3).getAs[Long]("n_indexed") == 0L &&
      fresh(3).getAs[Long]("n_arrived") == 1L)
    // occ_ratio: 14 * 4 / 19 = 2.947368
    assert(math.abs(fresh(0).getAs[Double]("occ_ratio") - 2.947368) < 1e-6)
    assert(math.abs(fresh(0).getAs[Double]("arrival_frac") - 0.1875) < 1e-9)

    // arrivalFrac below 3/16 → STALE: the global trigger dominates and
    // every row's action is reindex (hot column still reports per-cluster)
    val stale = Similarity.ivfMaintenancePlan(index, arrivals,
        arrivalFrac = 0.15, hotOccupancy = 1.5)
      .collect().map(r => r.getAs[Int]("cluster") -> r).toMap
    assert(stale.values.forall(_.getAs[Boolean]("stale_index")))
    assert(stale.values.forall(_.getAs[String]("action") == "reindex"))
    assert(stale(0).getAs[Boolean]("hot"))
  }
}
