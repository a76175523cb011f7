package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpora.
  *
  * - exact: hash-groupBy keep-first (deterministic winner)
  * - minhashLsh: shingle → minhash signature → banded LSH bucket join
  * - simhash: 64-bit simhash + hamming-band candidate join
  * - ngramJaccard: exact n-gram Jaccard over candidate pairs
  * - embeddingNearDup: cosine near-dup over an embedding column
  *
  * Scale design: every pairwise step goes through a BUCKET join (band
  * hash or simhash band), never a cross join — candidate generation is
  * an equi-join Spark executes as a shuffled hash join whose fan-out is
  * bounded by bucket size. Signatures are computed with codegen'd
  * expressions (xxhash64), no UDFs.
  *
  * Performance note: shingling and the base hash run ONCE per row in
  * their own projection stages ([[shingleHashes]]); the 64 minhash
  * functions are cheap universal-hash permutations `a*h+b` of that one
  * base hash. Catalyst's CollapseProject keeps the staging because an
  * expensive alias referenced many times is never inlined — without the
  * staging the shingle expression is evaluated 64× per row (measured
  * ~50× slower at sf0.001).
  */
object Dedup {

  /** Skew guard for band joins: keep at most `maxBucket` members per
    * bucket (lowest ids win — deterministic), so within-bucket pair
    * fan-out is bounded at B² even when a duplicate-heavy corpus puts
    * thousands of identical docs in one bucket (the common case in
    * web-scale training data: boilerplate pages share every band).
    * Drop accounting is LAZY — a CollectMetrics observation rides the
    * same action instead of an eager count() job, so the guard costs
    * nothing extra when unhit; drops surface as the `dropped_members`
    * metric on the query (visible to QueryExecutionListeners / the UI).
    *
    * Pipelines should run [[exact]] dedup FIRST: identical documents
    * don't need LSH, and removing them before banding is what keeps the
    * cap from biting on legitimate near-dup structure. */
  private[operators] def capBuckets(banded: DataFrame, bucketCols: Seq[String],
      idCol: String, maxBucket: Int, tag: String): DataFrame = {
    if (maxBucket <= 0) banded
    else {
      val w = Window.partitionBy(bucketCols.map(col): _*).orderBy(col(idCol))
      val name = s"${tag}_cap_${capSeq.incrementAndGet()}"
      banded.withColumn("_rk", row_number().over(w))
        .observe(name,
          sum(when(col("_rk") > maxBucket, 1L).otherwise(0L)).as("dropped_members"))
        .filter(col("_rk") <= maxBucket).drop("_rk")
    }
  }
  private val capSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Candidate pairs within buckets — the step between banding and
    * verification in every LSH family here.
    *
    * `bounded = true` (the production shape, cap ON): members per
    * bucket are already ≤ maxBucket, so pairs come from ONE pass —
    * groupBy(bucket) → sorted BOUNDED collect → pairwise explode.
    * The whole upstream subtree (scan, signature kernel, banding,
    * cap window) is evaluated exactly once, and the groupBy reuses
    * the cap window's partitioning, so no second bucket exchange
    * forms. (The self-join road plans the upstream once PER SIDE —
    * measured two full kernel evaluations — and exchange reuse does
    * not reliably collapse them under AQE.)
    *
    * `bounded = false` (cap OFF — exact/oracle mode): a collect
    * would buffer an unbounded hot bucket in one aggregation buffer,
    * so the classic self equi-join road is used; it spills instead
    * of OOMing.
    *
    * Payload columns ride next to the ids (`p` → `p1`/`p2`); both
    * roads emit identical (id1 < id2) pair rows, deduplication across
    * buckets is the caller's. */
  private[operators] def bucketPairs(members: DataFrame, bucketCols: Seq[String],
      idCol: String, payload: Seq[String], bounded: Boolean): DataFrame = {
    if (!bounded) {
      val l = members.select(bucketCols.map(col) ++
        (col(idCol).as("id1") +: payload.map(p => col(p).as(s"${p}1"))): _*)
      val r = members.select(bucketCols.map(col) ++
        (col(idCol).as("id2") +: payload.map(p => col(p).as(s"${p}2"))): _*)
      l.join(r, bucketCols).filter(col("id1") < col("id2"))
        .drop(bucketCols: _*)
    } else {
      val entry =
        if (payload.isEmpty) col(idCol).as("_e")
        else struct(col(idCol).as(idCol) +: payload.map(col): _*).as("_e")
      val withEntry = members.select(bucketCols.map(col) :+ entry: _*)
      val grouped = withEntry.groupBy(bucketCols.map(col): _*)
        .agg(sort_array(collect_list(col("_e"))).as("_ms"))
        .filter(size(col("_ms")) >= 2)
      val first = grouped.select(col("_ms"), posexplode(col("_ms")))
        .toDF("_ms", "_i", "_a")
      val both = first.select(col("_a"),
        explode(slice(col("_ms"), col("_i") + 2, size(col("_ms")))).as("_b"))
      val out =
        if (payload.isEmpty)
          both.select(col("_a").as("id1"), col("_b").as("id2"))
        else both.select(
          (col(s"_a.$idCol").as("id1") +:
            payload.map(p => col(s"_a.$p").as(s"${p}1"))) ++
          (col(s"_b.$idCol").as("id2") +:
            payload.map(p => col(s"_b.$p").as(s"${p}2"))): _*)
      // a doc CAN land twice in one bucket (two bands hashing to the
      // same value) — the strict inequality drops the self-pair the
      // way the join road's filter does
      out.filter(col("id1") < col("id2"))
    }
  }

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken, the
    * MOSS algorithm): hash every POSITIONAL word `shingleN`-gram, then
    * keep the minimum hash of each sliding `window` of consecutive
    * shingles — guaranteeing any shared run of ≥ window+shingleN-1
    * tokens contributes at least one COMMON selected fingerprint, at a
    * ~2/(window+1) sampling rate. The partial-overlap detector exact
    * span dedup and whole-doc LSH both miss: shared passages inside
    * otherwise-different documents.
    *
    * Fingerprints are the first 16 hex chars of md5 (engine-portable;
    * lexicographic min on hex = the same total order everywhere).
    * Distributed shape: selection is ONE native kernel per row
    * ([[graft.functions.WinnowSelect]] — the shingle hashing, sliding
    * minima, and distinct-selection fold in a single pass, so nothing
    * tokens-sized ever explodes or shuffles); only the ~2/(window+1)-
    * sampled selected fingerprints leave the row. Blank documents
    * select nothing; documents shorter than a full window keep their
    * single truncated-window minimum. Returns distinct (id, fp).
    * Pinned bit-identical to [[winnowFingerprintsSql]] (the
    * explode+window formulation the DuckDB oracle mirrors) by a
    * parity spec. */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, window: Int = 4): DataFrame =
    // the kernel dedupes within the row, so (id, fp) rows are already
    // distinct — no post-explode distinct (that would be a shuffle)
    df.select(col(idCol).as("id"),
        explode(graft.functions.Winnow.winnow_select(
          col(textCol), shingleN, window)).as("fp"))

  /** The explode + per-doc-window SQL formulation of
    * [[winnowFingerprints]] — the shape the DuckDB oracle runs, kept
    * as the kernel's parity twin. */
  private[graft] def winnowFingerprintsSql(df: DataFrame, textCol: String,
      idCol: String, shingleN: Int = 3, window: Int = 4): DataFrame = {
    require(shingleN >= 1 && window >= 1, "shingleN and window must be >= 1")
    val toks = TextAnalysis.normalizedTokens(col(textCol))
    val shArr = when(size(toks) >= shingleN,
        transform(sequence(lit(0), size(toks) - shingleN),
          i => concat_ws(" ", slice(toks, i + 1, lit(shingleN)))))
      .otherwise(array(concat_ws(" ", toks)))
    val posed = df.filter(array_join(toks, "") =!= "")
      .select(col(idCol).as("id"), posexplode(shArr))
      .toDF("id", "pos", "sh")
      .withColumn("fp", substring(md5(col("sh")), 1, 16))
    val wFrame = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    val wAll = Window.partitionBy(col("id"))
    posed
      .withColumn("wfp", min(col("fp")).over(wFrame))
      .withColumn("_maxpos", max(col("pos")).over(wAll))
      .filter(col("pos") <= greatest(col("_maxpos") - (window - 1), lit(0)))
      .select(col("id"), col("wfp").as("fp")).distinct()
  }

  /** MOSS-style match: document pairs sharing ≥ `minShared` selected
    * winnowing fingerprints. Ubiquitous fingerprints (doc frequency >
    * `maxDocsPerFp`) are DROPPED first — boilerplate every document
    * carries ranks no pair, and the filter is what bounds the
    * fingerprint-bucket join (each surviving bucket ≤ maxDocsPerFp
    * members, so pair fan-out is capped and the one-pass bounded
    * collect road applies). Deterministic — the cap is a doc-frequency
    * threshold, not a member truncation — so an external oracle
    * reproduces the exact pair set. */
  def winnowMatches(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, window: Int = 4, minShared: Int = 2,
      maxDocsPerFp: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDocsPerFp >= 2,
      "minShared >= 1 and maxDocsPerFp >= 2 required")
    val fps = winnowFingerprints(df, textCol, idCol, shingleN, window)
    // doc frequency via a WINDOW over one fp exchange, not an
    // aggregate + self-join: the join road evaluates the winnow kernel
    // subtree TWICE (partial aggregation defeats exchange reuse), and
    // the kernel is the dominant cost; the downstream groupBy reuses
    // this exchange's partitioning
    val wf = Window.partitionBy(col("fp"))
    val kept = fps.withColumn("_df", count(lit(1)).over(wf))
      .filter(col("_df") <= maxDocsPerFp).drop("_df")
    bucketPairs(kept, Seq("fp"), "id", Nil, bounded = true)
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact dedup with deterministic winner: lowest `idCol` per identical
    * normalized text wins. One shuffle on the fingerprint; the
    * fingerprint is staged as a column so the exchange/sort/window all
    * reference the computed value instead of re-evaluating md5+regex. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val staged = df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    staged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "_fp")
  }

  /** DEDUPLICATION REPORT per group (source/shard/language): document
    * count, distinct normalized-text count, duplicate rows, duplicate
    * rate, and the largest duplicate-group size — the readout that
    * tells an operator WHERE duplication lives (and whether a near-dup
    * pass is even worth its cost) before anything pairwise runs.
    *
    * Scale shape: one fingerprint projection and two hash aggregates
    * (both map-side combinable); output is group-cardinality-sized.
    * No pairwise step, no window, nothing driver-side. */
  def dedupReport(df: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol).as("_g"),
        TextAnalysis.fingerprint(col(textCol)).as("_fp"))
      .groupBy(col("_g"), col("_fp")).agg(count(lit(1)).as("_n"))
      .groupBy(col("_g"))
      .agg(sum(col("_n")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        (sum(col("_n")) - count(lit(1))).as("n_dup_rows"),
        round((sum(col("_n")) - count(lit(1))).cast("double") /
          sum(col("_n")), 6).as("dup_rate"),
        max(col("_n")).as("max_group"))
      .select(col("_g").as(groupCol), col("n_docs"), col("n_unique"),
        col("n_dup_rows"), col("dup_rate"), col("max_group"))

  /** Word n-gram shingles of the normalized text, as a deduped array. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.normalizedTokens(text)
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(
      when(size(toks) >= n,
        transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** (id, hs): distinct shingle hashes via the native single-scan
    * expression ([[graft.functions.ShingleHashes]]). */
  def shingleHashes(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.ShingleHashes.shingle_hashes(col(textCol), shingleN).as("hs"))

  /** MinHash signature from precomputed base hashes — native codegen'd
    * expression ([[graft.functions.MinHash64]]): one tight loop per row,
    * wrapping arithmetic that ANSI-mode SQL would reject. */
  def minhashSignatureFromHashes(hs: Column, numHashes: Int): Column =
    graft.functions.MinHash64.minhash64(hs, numHashes)

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`,
    * each band hashed to one bucket key. Docs sharing ANY band key are
    * candidate pairs. */
  def lshBandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(sigCol, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** (id, sig) minhash signatures, one staged computation per row. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, shingleN: Int = 3): DataFrame =
    shingleHashes(df, textCol, idCol, shingleN)
      .select(col("id"), minhashSignatureFromHashes(col("hs"), numHashes).as("sig"))

  /** MinHash+LSH near-dup candidate pairs (id1 < id2), with estimated
    * Jaccard = fraction of matching signature positions. Explode band
    * keys → self equi-join on the bucket → distinct pairs. The join is a
    * shuffled equi-join on the band hash; no cross product ever forms.
    *
    * Shuffle diet: the band self-join carries IDS ONLY — the 64-long
    * signatures (the widest payload in the pipeline) are re-attached to
    * the far smaller deduped candidate set afterwards, cutting the
    * band exchange ~8× vs shipping both signatures through it.
    *
    * `maxBucket` defaults ON (1000): a hot band bucket caps at 1000
    * members → ≤ ~500k pairs instead of B² explosion on one reduce
    * task. Run [[exact]] dedup first so identical docs never reach the
    * band join; set `maxBucket = 0` to disable.
    *
    * `withEstimate = false` skips the signature re-attach joins
    * entirely and returns bare (id1, id2) — callers that only feed a
    * verify/cluster stage ([[ngramJaccardPairs]], [[dedupByClusters]]
    * inputs) should use it: the est joins re-plan the signature
    * kernel per join side. */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      maxBucket: Int = 1000, withEstimate: Boolean = true): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(df, textCol, idCol, numHashes, shingleN)
    val banded = capBuckets(
      sigs.select(col("id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band")),
      Seq("band"), "id", maxBucket, "minhash")
    val pairs = bucketPairs(banded, Seq("band"), "id", Nil,
      bounded = maxBucket > 0).distinct()
    if (!withEstimate) pairs
    else pairs
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b),
          x => x)).cast("double") / numHashes).as("est_jaccard"))
  }

  /** 64-bit SimHash from precomputed shingle hashes — native codegen'd
    * expression ([[graft.functions.SimHash64]]); the HOF formulation was
    * measured 50-500× slower (interpreted lambda per element). */
  def simhashFromHashes(hs: Column): Column =
    graft.functions.SimHash64.simhash64(hs)

  /** SimHash near-dup candidates: band the 64-bit simhash into 4×16-bit
    * blocks; docs agreeing on ≥1 block (pigeonhole covers hamming ≤3)
    * are candidates; verify with true hamming distance ≤ `maxHamming`.
    * `maxBucket` defaults ON (1000) — see [[minhashLshPairs]]. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, shingleN: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val withSim = shingleHashes(df, textCol, idCol, shingleN)
      .select(col("id"), simhashFromHashes(col("hs")).as("sim"))
    val banded = capBuckets(
      withSim.select(col("id"), col("sim"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("blk"),
            shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
        }: _*)).as("band"))
        .select(col("id"), col("sim"), col("band.blk"), col("band.key")),
      Seq("blk", "key"), "id", maxBucket, "simhash")
    bucketPairs(banded, Seq("blk", "key"), "id", Seq("sim"),
      bounded = maxBucket > 0)
      .select(col("id1"), col("id2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id1", "id2")
  }

  /** Exact n-gram Jaccard over LSH candidate pairs: re-join the shingle
    * HASH sets onto minhash candidates and compute |∩|/|∪| exactly
    * (64-bit hash collisions are negligible at corpus scale). At 100 TB
    * the exact verify only touches the candidate set, not all pairs. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // sh PINNED (r15, guide §2.4): before, the shingle kernel ran THREE
    // times per call — once inside the LSH candidate pass and once per
    // verify join side (separate prunings defeat exchange reuse). Now
    // the kernel runs ONCE: the pin feeds both verify sides AND the
    // minhash signatures (minhashSignatureFromHashes over the pinned
    // hashes is definitionally the same computation minhashLshPairs
    // runs — shingleHashes → MinHash64). The (id, hashes) pin is the
    // deduped shingle-hash index, far narrower than the text. Callers'
    // returned frame reads the pin lazily (SparkEntry.lazyPinGates).
    val sh = shingleHashes(df, textCol, idCol, shingleN).localCheckpoint(true)
    val sigs = sh.select(col("id"),
      minhashSignatureFromHashes(col("hs"), numHashes).as("sig"))
    val rowsPerBand = numHashes / bands
    val banded = capBuckets(
      sigs.select(col("id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band")),
      Seq("band"), "id", maxBucket = 1000, "minhash")
    val cands = bucketPairs(banded, Seq("band"), "id", Nil, bounded = true)
      .distinct()
    cands
      .join(sh.withColumnRenamed("id", "id1").withColumnRenamed("hs", "hs1"), "id1")
      .join(sh.withColumnRenamed("id", "id2").withColumnRenamed("hs", "hs2"), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
          size(array_union(col("hs1"), col("hs2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT set-similarity self-join at shingle-set Jaccard ≥ `threshold`
    * (distinct word `shingleN`-grams; `shingleN = 1` → word sets)
    * via rarity-ordered PREFIX FILTERING (the AllPairs/PPJoin family —
    * Bayardo et al. WWW'07, Xiao et al. WWW'08, public algorithms) —
    * the zero-false-negative complement of [[minhashLshPairs]]: LSH
    * trades recall for speed; this path guarantees the complete pair
    * set, pruned enough to survive corpus scale.
    *
    * Why it prunes: order every document's distinct tokens by GLOBAL
    * rarity (document frequency asc, token asc — one total order both
    * engines share), and keep only the first
    * `|d| − ceil(t·|d|) + 1` tokens as the doc's prefix. Any pair with
    * J ≥ t has `|A∩B| ≥ ceil(t·|A|)`, so skipping the last
    * `ceil(t·|A|) − 1` tokens cannot skip the whole intersection —
    * the prefixes of a qualifying pair MUST share a token. Candidates
    * therefore come from an equi-join on prefix tokens (dominated by
    * RARE tokens — tiny buckets), never an all-pairs product; a size
    * filter (`t·|B| ≤ |A| ≤ |B|/t`) and the PPJoin POSITION filter
    * (overlap upper bound from the smallest shared prefix token's
    * suffix lengths — see the inline derivation) prune incompatible
    * pairs before the verify.
    *
    * Distributed shape: one explode + one (token) count aggregate for
    * document frequencies (vocab-sized result, broadcast-joined back
    * when small); one shuffle on id to assemble the sorted token
    * array (materialized once via localCheckpoint — three consumers);
    * prefix equi-join on token; exact verify via array_intersect on
    * the two bounded per-doc arrays. `maxBucket` (default 1000, the
    * [[minhashLshPairs]] convention) caps a pathological hot prefix
    * token with drop accounting — set 0 for the exactness guarantee
    * (the oracle mode; capping can only drop candidates of ubiquitous
    * tokens, which rarity ordering already makes rare in prefixes).
    *
    * Returns (id1 < id2, jaccard) with jaccard ≥ threshold. */
  def jaccardPrefixJoin(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, maxBucket: Int = 1000, shingleN: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val tok = df.select(col(idCol).cast("long").as("id"),
        explode(graft.functions.ShingleStrings.shingle_strings(
          col(textCol), shingleN)).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("_df"))
    val sorted = tok.join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("_df"), col("tok"))))
        .as("_st"))
      .select(col("id"),
        transform(col("_st"), s => s.getField("tok")).as("toks"),
        size(col("_st")).cast("long").as("sz"))
      .localCheckpoint(true) // three consumers: prefix + both verify sides
    // ceil() runs in IEEE doubles; when the exact product t·sz is
    // integral in the rationals the fp rounding can land a hair ABOVE
    // it (e.g. t=3.0/17, sz=85: exact 15, fp ceil 16), shortening the
    // prefix below what the theorem allows and silently dropping a
    // qualifying pair. Subtracting an epsilon far above fp error
    // (~1e-10 at sz=1e6) but below any intended margin only LOOSENS
    // the bound — more candidates, never a lost pair; the exact
    // verify step downstream restores precision. Same guard on the
    // length ratio and position-filter bounds below.
    val fpEps = 1e-7
    val pfxLen = (col("sz") - ceil(lit(threshold) * col("sz") - fpEps) + 1)
      .cast("int")
    val pfx = capBuckets(
      sorted.select(col("id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), pfxLen)).as(Seq("pos", "tok"))),
      Seq("tok"), "id", maxBucket, "jaccard_prefix")
    // PPJoin position filter (Xiao et al. WWW'08, exact): for the
    // SMALLEST shared prefix token (prefix positions are monotone in
    // the global rarity order, so min(pos1) and min(pos2) come from the
    // same token), every common token sits at-or-after it in BOTH
    // orders — |A∩B| ≤ 1 + min(|A|−posA−1, |B|−posB−1). J ≥ t forces
    // |A∩B| ≥ ⌈t/(1+t)·(|A|+|B|)⌉, so pairs whose bound falls short
    // die here, before the vector re-join. The group-by replaces the
    // plain distinct() — same exchange, stronger pruning.
    val cand = bucketPairs(pfx, Seq("tok"), "id", Seq("sz", "pos"),
      bounded = maxBucket > 0)
      .filter(col("sz2") * lit(threshold) - fpEps <= col("sz1") &&
        col("sz1") * lit(threshold) - fpEps <= col("sz2"))
      .groupBy("id1", "id2")
      .agg(min(col("pos1")).as("_p1"), min(col("pos2")).as("_p2"),
        first(col("sz1")).as("_s1b"), first(col("sz2")).as("_s2b"))
      .filter(lit(1) + least(col("_s1b") - col("_p1") - 1,
          col("_s2b") - col("_p2") - 1) >=
        ceil(lit(threshold / (1.0 + threshold)) * (col("_s1b") + col("_s2b"))
          - fpEps))
      .select("id1", "id2")
    cand
      .join(sorted.select(col("id").as("id1"), col("toks").as("_t1"),
        col("sz").as("_s1")), "id1")
      .join(sorted.select(col("id").as("id2"), col("toks").as("_t2"),
        col("sz").as("_s2")), "id2")
      .withColumn("_i", size(array_intersect(col("_t1"), col("_t2")))
        .cast("long"))
      .select(col("id1"), col("id2"),
        (col("_i").cast("double") /
          (col("_s1") + col("_s2") - col("_i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Universal-hash constants for the portable minhash family
    * h_i(x) = (a_i·x + b_i) mod P over the 32-bit md5 prefix of a
    * shingle: ONE md5 per shingle, then integer arithmetic any engine
    * reproduces exactly (a_i < 2³¹ and x < 2³² keep a_i·x within a
    * signed 64-bit long). Constants are referenced by the oracle-SQL
    * generator, so both sides share one definition. */
  val uhP: Long = 1000000007L
  def uhA(i: Int): Long = ((2L * i + 1) * 2654435761L) % 2147483647L
  def uhB(i: Int): Long = (97L * i + 13) % uhP

  /** Engine-portable minhash: shingle → 32-bit md5 prefix → `numHashes`
    * universal-hash minima (codegen'd MIN aggregates over exploded
    * shingles, one shuffle on id); band key = md5 of the joined band
    * slice. Computable bit-identically by any engine with md5 — which
    * makes the whole LSH pipeline verifiable against an independent
    * SQL oracle, not just rows-only. `withEstimate` attaches
    * est_jaccard = fraction of matching signature positions.
    *
    * `maxBucket` defaults ON (1000) like the production twin
    * ([[minhashLshPairs]]): a duplicate-heavy corpus otherwise
    * B²-explodes one reduce task in the band self-join. Set
    * `maxBucket = 0` only when the EXACT pair set matters more than
    * bounded fan-out (e.g. oracle verification on bounded inputs). */
  def minhashLshPairsPortable(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3,
      withEstimate: Boolean = false, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Signature = ONE native kernel per row (no explode, no shuffle on
    // id): bit-identical to the md5+conv+min SQL the oracle runs — see
    // [[graft.functions.PortableSig]]. Null text matches the explode
    // semantics it replaced (the doc simply doesn't participate).
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.PortableSig.md5_minhash_sig(col(textCol), shingleN,
        Seq.tabulate(numHashes)(uhA), Seq.tabulate(numHashes)(uhB), uhP)
        .as("sig"))
      .filter(col("sig").isNotNull)
    // withEstimate CARRIES the signature through the band join instead
    // of re-attaching it with two post-hoc joins: the re-attach joins
    // re-planned the kernel subtree per join side (measured 3× kernel
    // evaluations — exchange reuse does not survive AQE's broadcast
    // conversion of the small side), while the carried payload is just
    // `numHashes` longs per banded row at the portable geometries
    // (8-16 hashes). est_jaccard is a pure function of the carried
    // sigs, so any row surviving the (id1, id2) dedupe yields the
    // identical value.
    val sigCols = if (withEstimate) Seq(col("sig")) else Nil
    val banded = capBuckets(
      sigs.select(col("id") +: sigCols :+
        explode(array((0 until bands).map { b =>
          md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
        }: _*)).as("band"): _*),
      Seq("band"), "id", maxBucket, "minhash_portable")
    val joined = bucketPairs(banded, Seq("band"), "id",
      if (withEstimate) Seq("sig") else Nil, bounded = maxBucket > 0)
    if (!withEstimate) joined.select("id1", "id2").distinct()
    else joined
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b),
          x => x)).cast("double") / numHashes).as("est_jaccard"))
      .dropDuplicates("id1", "id2")
  }

  /** Banded portable-minhash rows `(band, id)` — the PERSISTED LSH
    * index layout. This is the production dedup shape at 100 TB: the
    * corpus is signatured ONCE and its banded rows written as the
    * index ([[writeMinhashIndex]]); every later batch dedups against
    * the index via [[incrementalNearDups]] WITHOUT rescanning corpus
    * text. `maxBucket` (default on, like every band join here) caps
    * index members per band bucket with drop accounting, so one
    * viral duplicate bucket can't explode a future delta join. */
  def minhashIndexRows(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.PortableSig.md5_minhash_sig(col(textCol), shingleN,
        Seq.tabulate(numHashes)(uhA), Seq.tabulate(numHashes)(uhB), uhP)
        .as("sig"))
      .filter(col("sig").isNotNull)
    capBuckets(
      sigs.select(col("id"),
        explode(array((0 until bands).map { b =>
          md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
        }: _*)).as("band")),
      Seq("band"), "id", maxBucket, "minhash_index")
  }

  /** Persist the banded index, pre-shuffled on `band` so each band
    * bucket is colocated in one file — an incremental probe that
    * ISN'T broadcast can then bucket-join without re-shuffling the
    * (corpus-sized) index. */
  def writeMinhashIndex(df: DataFrame, textCol: String, idCol: String,
      path: String, numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3,
      maxBucket: Int = 1000, numFiles: Int = 32): Unit =
    minhashIndexRows(df, textCol, idCol, numHashes, bands, shingleN, maxBucket)
      .repartition(numFiles, col("band"))
      .write.mode("overwrite").parquet(path)

  /** Near-duplicate candidates of a NEW batch against an existing
    * [[minhashIndexRows]]/[[writeMinhashIndex]] index: signature the
    * delta (one pass over delta text only), band it with the SAME
    * geometry, and equi-join band keys against the index. With
    * `broadcastDelta` (default — a daily batch is small next to the
    * corpus) the index side streams through a broadcast-hash join
    * with NO exchange: the 100-TB index is read, never shuffled.
    * Returns distinct `(new_id, corpus_id)`. */
  def incrementalNearDups(delta: DataFrame, index: DataFrame,
      textCol: String, idCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3,
      broadcastDelta: Boolean = true): DataFrame = {
    val probe0 = minhashIndexRows(delta, textCol, idCol,
      numHashes, bands, shingleN, maxBucket = 0)
      .withColumnRenamed("id", "new_id")
    val probe = if (broadcastDelta) broadcast(probe0) else probe0
    index.join(probe, "band")
      .select(col("new_id"), col("id").as("corpus_id"))
      // a re-ingested doc already indexed under the same id matches
      // itself on every band — a self-pair would make a downstream
      // "drop matched" step delete the doc as a duplicate of itself
      .filter(col("new_id") =!= col("corpus_id"))
      .distinct()
  }

  /** STREAMING twin of [[incrementalNearDups]] — the NRT dedup shape:
    * new documents arrive as a stream, signature + banding run as a
    * STATELESS projection, and candidates come from a stream-static
    * equi-join against the persisted index (the corpus is disk state,
    * never stream state, so nothing accumulates in the state store
    * and the query is append-mode with no watermark). Emits one row
    * per MATCHING BAND — multiplicity = shared-band count, which
    * keeps the plan stateless; dedupe downstream relationally (or in
    * a foreachBatch merge). */
  def incrementalNearDupStream(delta: DataFrame, index: DataFrame,
      textCol: String, idCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3): DataFrame =
    minhashIndexRows(delta, textCol, idCol, numHashes, bands, shingleN,
        maxBucket = 0)
      .withColumnRenamed("id", "new_id")
      .join(index.withColumnRenamed("id", "corpus_id"), "band")
      .select(col("new_id"), col("corpus_id"))
      // same self-pair guard as the batch twin
      .filter(col("new_id") =!= col("corpus_id"))

  /** Engine-portable simhash: 60-bit simhash over md5-derived shingle
    * hashes (first 15 hex digits → long, within signed-64 range). The
    * bit votes run as 60 codegen'd SUM aggregates over the exploded
    * (id, hash) rows — ONE shuffle on id, no interpreted per-bit HOF
    * loop. Banding into 4×15-bit blocks is exact by pigeonhole for
    * hamming ≤ 3, so the pair set is fully determined by the simhash
    * values — which an md5-capable SQL engine recomputes identically.
    *
    * `maxBucket` defaults ON (1000) like every other band-join path:
    * a corpus of near-identical documents lands in the same 15-bit
    * block buckets and the self-join B²-explodes without the cap. Pin
    * `maxBucket = 0` when the exact pair set matters more than bounded
    * fan-out (oracle gates on bounded inputs). */
  def simhashPairsPortable(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, shingleN: Int = 3, maxBucket: Int = 1000): DataFrame = {
    // Simhash = ONE native kernel per row (no explode, no shuffle on
    // id, no 20-column packed-vote aggregate): the same md5-derived
    // 60-bit majority the oracle's SQL computes — see
    // [[graft.functions.PortableSig]]. The band join below is now the
    // pipeline's ONLY exchange.
    val sim = df.select(col(idCol).as("id"),
      graft.functions.PortableSig.md5_simhash60(col(textCol), shingleN)
        .as("sim"))
      .filter(col("sim").isNotNull)
    val banded = capBuckets(
      sim.select(col("id"), col("sim"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("blk"),
            shiftright(col("sim"), b * 15).bitwiseAND(lit(0x7FFFL)).as("key"))
        }: _*)).as("band"))
        .select(col("id"), col("sim"), col("band.blk"), col("band.key")),
      Seq("blk", "key"), "id", maxBucket, "simhash_portable")
    bucketPairs(banded, Seq("blk", "key"), "id", Seq("sim"),
      bounded = maxBucket > 0)
      .select(col("id1"), col("id2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id1", "id2")
  }

  /** Connected components over near-dup pairs — the step that turns
    * pairwise matches into keep-one-per-group dedup. Input: (id1, id2)
    * pairs; output: (id, cluster) for every NON-NULL id in a pair,
    * cluster = min id of its component. A pair whose partner id is
    * null still yields a singleton (id, id) row for the non-null side
    * (it normalizes to a self-loop); only both-null pairs are dropped.
    *
    * TWO TIERS, selected by the materialized edge count:
    *
    *  - `≤ localEdgeCap` directed edges (default 2M; LONG and STRING
    *    ids — the document-id shapes; other types always take the
    *    distributed tier): one BOUNDED
    *    collect (the a<=b half) + driver union-find with path
    *    compression — exact, one pass, no iteration, ~150 MB transient
    *    at the cap. After LSH banding + a similarity threshold the
    *    pair graph is typically corpus-scale SMALLER than the corpus,
    *    so this is the common case, and it avoids the iterative
    *    tier's per-round driver synchronization (measured: a 19-round
    *    convergence at sf0.1 cost ~20 s of round overhead for a
    *    2.7k-edge graph the driver resolves in milliseconds).
    *  - above the cap: distributed label propagation to the minimum
    *    reachable id. Each round does a neighbor-min step AND a
    *    POINTER-JUMP step (`cluster := label(cluster)`), so label
    *    distance halves per round and convergence is O(log diameter)
    *    — a pure neighbor walk is O(diameter), which silently
    *    truncates at `maxIter` on chain-shaped components at scale.
    *    `localCheckpoint` per round cuts the growing lineage.
    *
    * Both tiers produce identical labels; `localEdgeCap = 0` forces
    * the distributed tier (used by its convergence specs). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      localEdgeCap: Long = 2000000L): DataFrame = {
    // orientation-normalized edge list: least/greatest folds (a,b) and
    // (b,a) into one row BEFORE the dedup, so the distinct — the
    // largest shuffle this operator runs — processes E rows, not the
    // 2E a mirrored union would (and the distributed tier below
    // rebuilds the mirror by a narrow projection, no second distinct).
    // A pair with exactly ONE null id degenerates to a SELF-LOOP of
    // the non-null side (least/greatest skip nulls), so that vertex
    // still receives its singleton (id, id) label row — vertex
    // coverage of the output is every non-null id appearing in any
    // pair. Only both-null pairs drop: they name no vertex at all.
    val half = pairs
      .filter(col("id1").isNotNull || col("id2").isNotNull)
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .distinct()
      .localCheckpoint() // reused every round — cut the lineage once
    val halfCount = half.count() // free: counts the checkpointed blocks

    // local tier for LONG and STRING ids (the two id shapes documents
    // actually carry — synthetic longs and UUID strings); other id
    // types fall through to the type-generic distributed tier
    val idType = pairs.schema.head.dataType
    val sameTypes = pairs.schema.take(2).map(_.dataType).distinct.size == 1
    if (sameTypes && halfCount * 2 <= localEdgeCap &&
        (idType == org.apache.spark.sql.types.LongType ||
         idType == org.apache.spark.sql.types.StringType)) {
      // driver union-find over the bounded edge list. Memory: the
      // collect ships the normalized half (self-loops kept so
      // vertex-set parity with the distributed tier holds), and the
      // boxed parent map holds ≤ |V| entries — ~150 MB transient at the
      // default cap, far under any realistic driver heap.
      val spark = pairs.sparkSession
      import spark.implicits._
      val rows = half.collect()
      Snapshots.release(half) // Dataset.unpersist is a no-op on a pin
      return (idType match {
        case org.apache.spark.sql.types.LongType =>
          localUnionFind[Long](rows.map(r => (r.getLong(0), r.getLong(1))),
            _ < _).toDF("id", "cluster")
        case _ =>
          // min label must agree with the distributed tier's `min` on
          // UTF8String: BYTE-wise UTF-8 order, not String.compareTo
          // (they diverge above the BMP)
          localUnionFind[String](rows.map(r => (r.getString(0), r.getString(1))),
            utf8Lt).toDF("id", "cluster")
      })
    }
    // both directions for the label-propagation joins — a projection
    // over the pinned half (self-loops skip the mirror, so no dedup)
    val edges = half.union(
      half.filter(col("a") =!= col("b"))
        .select(col("b").as("a"), col("a").as("b")))

    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    // the frame whose blocks back `labels` — labels itself becomes a
    // PROJECTION over the pin after round 1 (step2.drop), so releasing
    // `labels` would silently miss the blocks
    var pinned = labels
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      // neighbor-min: best label among my neighbors
      val viaEdges = edges
        .join(labels.select(col("id").as("b"), col("cluster").as("nb")), "b")
        .groupBy(col("a").as("id")).agg(min(col("nb")).as("nb_min"))
      // the PREVIOUS label rides along as `old`, so convergence is a
      // filter-count over the checkpointed rows — not the extra
      // shuffle join per round it used to be
      val step1 = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"), col("cluster").as("old"),
          least(coalesce(col("nb_min"), col("cluster")), col("cluster")).as("cluster"))
      // pointer jump: follow my label's label (halves chain distance).
      // step1 feeds both join sides but is NOT checkpointed: Spark's
      // ReusedExchange already shares the shuffle, and a measured
      // localCheckpoint here made the gate 2.3× slower.
      val parents = step1.select(col("id").as("cluster"), col("cluster").as("pc"))
      val step2 = step1.join(parents, Seq("cluster"), "left")
        .select(col("id"), col("old"),
          least(col("cluster"), coalesce(col("pc"), col("cluster"))).as("cluster"))
        .localCheckpoint() // eager: materialized before prev is dropped
      Snapshots.release(pinned) // bound block-manager growth across rounds
      pinned = step2
      changed = step2.filter(col("cluster") < col("old")).count()
      labels = step2.drop("old")
      iter += 1
    }
    Snapshots.release(half)
    labels
  }

  /** Driver union-find with path compression and union-by-min-root, so
    * labels are the component minimum under `lt` — the same labels the
    * distributed tier converges to. Emits one (id, root) row per
    * distinct endpoint, INCLUDING self-loop-only ids. */
  private def localUnionFind[T](edgeArr: Array[(T, T)],
      lt: (T, T) => Boolean): Seq[(T, T)] = {
    val parent = new java.util.HashMap[T, T]()
    def find(x: T): T = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) {
        val next = parent.getOrDefault(c, c); parent.put(c, r); c = next
      }
      r
    }
    edgeArr.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val ids = new java.util.HashSet[T]()
    val out = scala.collection.mutable.ArrayBuffer.empty[(T, T)]
    edgeArr.foreach { case (a, b) =>
      Seq(a, b).foreach { id => if (ids.add(id)) out += (id -> find(id)) }
    }
    out.toSeq
  }

  /** Byte-wise UTF-8 comparison — UTF8String's binary order (what the
    * distributed tier's `min`/`least` compare by). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Keep-one-per-cluster dedup: rows whose id is its cluster's minimum
    * (plus all rows not in any near-dup pair). */
  def dedupByClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep the BEST row per duplicate cluster by `scoreCol` (ties → the
    * smallest id) — the production keep policy: among near-duplicate
    * copies of a page, keep the highest-quality one (longest, cleanest,
    * best classifier score), not whichever happens to carry the lowest
    * id. [[dedupByClusters]] is the id-deterministic special case.
    *
    * Scale shape: only CLUSTERED rows enter the contest — the labels
    * frame is pair-graph-sized, so the inner join + per-cluster
    * `max_by` aggregate shuffles the duplicate subset, never the
    * corpus; unclustered rows survive by construction and the corpus
    * is touched once by the final (small-side) anti join. */
  def dedupByClustersBest(df: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame = {
    val labels = connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster"))
    val contested = df.join(labels, Seq(idCol))
    val winners = contested.groupBy("cluster")
      .agg(max_by(col(idCol),
        struct(col(scoreCol).as("s"), (-col(idCol)).as("n"))).as("_win"))
      .select(col("_win").as(idCol))
    val losers = contested.select(col(idCol))
      .join(winners, Seq(idCol), "left_anti")
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** LEAKAGE-SAFE train/test split: every row is assigned to a side by
    * the portable md5 bucket of its duplicate-CLUSTER representative
    * (component min id; rows in no pair represent themselves), so
    * near-duplicate copies always land on the SAME side. A row-hash
    * split leaks: one copy of a near-dup pair trains while its twin
    * evaluates — the classic silent eval contamination. Same md5-bucket
    * rule as [[TextAnalysis.sampleByHash]] (reproducible, salted,
    * engine-portable); nested: testPct 10 ⊂ testPct 20 under one salt.
    * The label table is pair-graph-sized, joined once on the id.
    * Returns the input plus a `split` column ("test"/"train"). */
  def splitByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
      testPct: Int, salt: String = ""): DataFrame = {
    require(testPct >= 0 && testPct <= 100, "testPct must be 0..100")
    val labels = connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster"))
    val rep = coalesce(col("cluster"), col(idCol)).cast("string")
    val bucket =
      conv(substring(md5(concat(lit(salt), rep)), 1, 8), 16, 10)
        .cast("long") % 100
    df.join(labels, Seq(idCol), "left")
      .withColumn("split",
        when(bucket < testPct, lit("test")).otherwise(lit("train")))
      .drop("cluster")
  }

  /** LEAKAGE-SAFE k-fold assignment — [[splitByCluster]] generalized to
    * cross-validation: every row's fold is the md5 bucket of its
    * duplicate-cluster REPRESENTATIVE mod `k`, so near-duplicate copies
    * always share a fold and no fold's holdout leaks into another's
    * training set. Same salted portable-md5 rule; the label table is
    * pair-graph-sized. Returns the input plus a `fold` column (0..k−1). */
  def cvFoldsByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
      k: Int, salt: String = ""): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val labels = connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster"))
    val rep = coalesce(col("cluster"), col(idCol)).cast("string")
    val fold =
      conv(substring(md5(concat(lit(salt), rep)), 1, 8), 16, 10)
        .cast("long") % k
    df.join(labels, Seq(idCol), "left")
      .withColumn("fold", fold)
      .drop("cluster")
  }

  /** Cross-document SPAN dedup (the C4 recipe adapted to whitespace
    * tokens): cut every document into consecutive `span`-token windows,
    * keep each distinct window only at its FIRST occurrence in
    * (`idCol`, position) order, and reassemble documents from their
    * surviving spans. Repeated boilerplate (headers, license blocks,
    * injected templates) disappears from every copy but the first while
    * unique prose is untouched.
    *
    * Scale shape: one explode, then the first-occurrence winner per
    * span is a HASH AGGREGATE — `min(struct(id, pos))` per span text,
    * with map-side partials — not a window sort, so a boilerplate span
    * duplicated a billion times costs one combine per partition
    * instead of a giant per-key sort; then one groupBy-reassemble on
    * the doc id. No pairwise step at all — dedup cost is linear in
    * corpus size. Documents whose every span was seen earlier vanish
    * entirely (the reference C4 behavior for fully-duplicated
    * members). */
  def dedupSpans(df: DataFrame, textCol: String, idCol: String,
      span: Int = 10): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val nChunks = ceil(size(toks).cast("double") / span).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * span + 1, lit(span)), " "))
    val exploded = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("_id"), posexplode(chunks).as(Seq("pos", "chunk")))
    // first occurrence = lexicographic min of (id, pos) per span
    exploded.groupBy(col("chunk"))
      .agg(min(struct(col("_id"), col("pos"))).as("w"))
      .select(col("w._id").as("_id"), col("w.pos").as("pos"), col("chunk"))
      .groupBy(col("_id").as(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s.getField("chunk"))).as("text_deduped"),
        count(lit(1)).as("n_spans_kept"))
  }

  /** LINE-level boilerplate dedup (the RefinedWeb/CCNet recipe): a
    * trimmed non-blank line that occurs in at least `minDocs` DISTINCT
    * documents is boilerplate (nav bars, cookie banners, license
    * footers) and is removed from EVERY document; unique prose is
    * untouched. Documents are reassembled from their surviving lines
    * in original order; a document whose every line was boilerplate
    * vanishes (same convention as [[dedupSpans]]). Blank lines are
    * never counted as boilerplate and always survive.
    *
    * Scale shape: one explode, then the doc-frequency count is
    * TWO-STAGE — distinct (line, doc) pairs first, then a count per
    * line — so a line repeated a million times inside one document
    * costs one combine per partition, not a skewed single-key
    * reduction. The boilerplate set (lines above the threshold) is
    * data-dependent small next to the corpus; the surviving-line
    * anti-join shuffles on the line hash and AQE broadcasts the
    * boilerplate side when it fits. Linear in corpus size — no
    * pairwise step. */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would drop every line)")
    val lines = df.select(col(idCol).as("_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines
      .select(trim(col("line")).as("nline"), col("_id"))
      .filter(col("nline") =!= "")
      .distinct()
      .groupBy(col("nline")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("nline"))
    lines.join(boiler, trim(col("line")) === col("nline"), "left_anti")
      .groupBy(col("_id").as(idCol))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("text_clean"),
        count(lit(1)).as("n_lines_kept"))
  }

  /** Embedding cosine near-dup: candidate pairs whose cosine similarity
    * exceeds `threshold`, generated through Similarity's LSH buckets to
    * avoid the all-pairs product. Defaults inherit the scale-safe
    * settings: adaptive plane count (`planes = 0`) and the per-bucket
    * skew cap ON (`maxBucket = 1000`). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, tables: Int = 2,
      maxBucket: Int = 1000): DataFrame =
    Similarity.lshCandidatePairs(df, idCol, vecCol, planes, tables, maxBucket)
      .filter(col("cosine") >= threshold)

  /** Benchmark DECONTAMINATION: which corpus documents share at least
    * one word `n`-gram with an evaluation set (the standard train/test
    * overlap guard — any doc carrying a verbatim eval n-gram leaks the
    * benchmark into training). Returns `(idCol, n_eval_ngrams)` for
    * contaminated documents, where the count is the number of DISTINCT
    * document n-grams that appear in the eval set (an audit signal for
    * "how contaminated").
    *
    * Scale shape: the eval set is tiny next to the corpus (benchmarks
    * are 10³–10⁶ grams vs 10¹⁰ docs), so its distinct-gram set is
    * BROADCAST — the corpus side is one scan (native shingle
    * expression → explode → broadcast-hash join) plus one partial-agg
    * shuffle on the doc id. The 100 TB corpus is never shuffled by
    * gram. Shingles are per-doc distinct already (ShingleStrings
    * dedupes), so a plain count equals the distinct-gram hit count. */
  def contaminationHits(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val sh = graft.functions.ShingleStrings.shingle_strings(col(textCol), n)
    val evalGrams = evalSet.select(explode(sh).as("g")).distinct()
    corpus.select(col(idCol), explode(sh).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_ngrams"))
  }

  /** FUZZY decontamination — the n-gram guard ([[contaminationHits]])
    * misses a benchmark item whose corpus copy was lightly rephrased;
    * this path catches it: LSH candidates between the eval set and the
    * corpus (the [[incrementalNearDups]] machinery — the eval set is
    * the small broadcast probe, the corpus is banded once and NEVER
    * shuffled by anything global), then an EXACT normalized-Levenshtein
    * verify on the candidate pairs only. Spark's `levenshtein` and any
    * SQL engine's agree on the classic DP distance, so the verify is
    * oracle-checkable.
    *
    * Returns (eval_id, corpus_id, dist) with dist ≤ `maxDist` over the
    * fingerprint-normalized texts (lowercase alnum runs). */
  def fuzzyContamination(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, maxDist: Int,
      numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val idx = minhashIndexRows(corpus, textCol, idCol, numHashes, bands,
      shingleN, maxBucket)
    val cand = incrementalNearDups(evalSet, idx, textCol, idCol,
      numHashes, bands, shingleN)
      .withColumnRenamed("new_id", "eval_id")
    def norm(c: Column) = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    val ev = evalSet.select(col(idCol).as("eval_id"),
      norm(col(textCol)).as("_et"))
    val co = corpus.select(col(idCol).as("corpus_id"),
      norm(col(textCol)).as("_ct"))
    cand.join(broadcast(ev), "eval_id").join(co, "corpus_id")
      // |Δlen| > maxDist already implies dist > maxDist — this cheap
      // guard drops the bulk of LSH false candidates before any DP
      .filter(abs(length(col("_et")) - length(col("_ct"))) <= maxDist)
      // thresholded Levenshtein: banded DP, O(len·maxDist) per pair
      // instead of O(len²); returns −1 past the threshold (same kept
      // set and distances as the unbounded form, so the oracle is
      // unchanged)
      .withColumn("dist",
        levenshtein(col("_et"), col("_ct"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("eval_id", "corpus_id", "dist")
  }

  /** Benchmark decontamination, filter form: corpus rows carrying NO
    * eval n-gram (the rows safe to train on). Anti join on the doc id
    * against [[contaminationHits]] — the contaminated-id set is small,
    * so AQE turns this into a broadcast anti join. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame =
    corpus.join(
      contaminationHits(corpus, evalSet, textCol, idCol, n).select(col(idCol)),
      Seq(idCol), "left_anti")
}
