package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator library re-expressing the reference's transforms
  * Spark-first (SURVEY.md §2). Each function is a pure
  * `DataFrame => DataFrame` combinator; Catalyst handles pushdown,
  * pruning and join strategy. Cites are into `/root/reference/`.
  */
object Relational {

  // --- §2.1 scans / catalog -------------------------------------------------

  /** S2/P11 — catalog scan semantics: drop the self-row and rows whose
    * protocol URL is empty (`erddap_wrangler.py:306-313`). Case-insensitive
    * column resolution is handled by the caller resolving names up front. */
  def catalogScan(catalog: DataFrame, idCol: String, protocolCol: String): DataFrame =
    catalog.filter(col(idCol) =!= "allDatasets" &&
      col(protocolCol).isNotNull && col(protocolCol) =!= "")

  /** S3 — full-text catalog search (`core.py:130-137`): case-insensitive
    * substring match on the title. Pushed to the parquet scan as a filter. */
  def textSearch(df: DataFrame, titleCol: String, term: String): DataFrame =
    df.filter(lower(col(titleCol)).contains(term.toLowerCase))

  /** S4 — advanced search with recency predicate (`core.py:114-127`):
    * keep datasets whose max time falls inside the trailing `days`-day
    * window ending at the table's own max — the deterministic analog of
    * ERDDAP's `minTime=now-7days`. Single extra scan for the max; the
    * scalar is broadcast into the filter. */
  def recentWindow(df: DataFrame, tsCol: String, days: Int): DataFrame = {
    val win = df.select(max(col(tsCol)).as("hi"))
      .select((col("hi") - expr(s"INTERVAL $days DAYS")).as("lo"))
    df.join(broadcast(win), col(tsCol) >= col("lo")).drop("lo")
  }

  // --- §2.3 projections / filters ------------------------------------------

  /** P1 — projection with `time` pulled to the front
    * (`data_wrangler.py:330-344`: depth forced forward, time prepended). */
  def projectTimeFirst(df: DataFrame, timeCol: String, attrs: Seq[String]): DataFrame =
    df.select((timeCol +: attrs.filterNot(_ == timeCol)).map(col): _*)

  /** P2 — time-range predicate (`data_wrangler.py:360-370`), inclusive
    * both ends like the URL grammar `time>=startZ&time<=endZ`. */
  def timeRange(df: DataFrame, tsCol: String, start: String, end: String): DataFrame =
    df.filter(col(tsCol) >= lit(start).cast("timestamp") &&
      col(tsCol) <= lit(end).cast("timestamp"))

  /** P8 — drop columns that are entirely null on a bounded probe sample
    * (`erddap_wrangler.py:380-410`). One aggregate job over the sample
    * computes all counts; no per-column jobs. */
  def dropAllNullColumns(df: DataFrame, sampleRows: Int = 10000): DataFrame = {
    val sample = df.limit(sampleRows)
    val counts = sample.select(df.columns.map(c => count(col(c)).as(c)): _*)
      .head()
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0 => c
    }
    df.select(keep.map(col): _*)
  }

  /** P9 — coordinate validity filter (`agol_wrangler.py:774-792`):
    * NaN→null then drop rows with null in any coordinate column. */
  def dropInvalidCoords(df: DataFrame, coordCols: Seq[String]): DataFrame = {
    val noNan = coordCols.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType.typeName == "double")
        d.withColumn(c, when(isnan(col(c)), lit(null)).otherwise(col(c)))
      else d
    }
    noNan.na.drop(coordCols)
  }

  /** P10/O3 — row-range / pagination (`Json2GeoJSON.py:941-957`,
    * `core.py:191-197`). Deterministic only under a total order, so the
    * caller supplies sort keys. */
  def pageSlice(df: DataFrame, order: Seq[Column], offset: Int, length: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(length)

  // --- §2.4 joins -----------------------------------------------------------

  /** J1 — search-result ↔ date-cache restore (`core.py:150-155`): left
    * broadcast join re-attaching authoritative (minTime,maxTime). The cache
    * is small (one row per dataset id) so it is always broadcast. */
  def dateCacheJoin(searched: DataFrame, cache: DataFrame, key: String): DataFrame =
    searched.join(broadcast(cache), Seq(key), "left")

  /** J2/E1 — anti join: candidates minus already-published
    * (`core.py:763-781`). */
  def newMinusExisting(candidates: DataFrame, existing: DataFrame, key: String): DataFrame =
    candidates.join(existing, Seq(key), "left_anti")

  /** J4 — existence check as semi join (`core.py:753-761`). */
  def existsIn(df: DataFrame, other: DataFrame, key: String): DataFrame =
    df.join(other, Seq(key), "left_semi")

  /** Bloom-pruned EXACT semi join — the membership pattern for key
    * sets too large to broadcast as an exact hash set but compact as a
    * Bloom filter (decontamination lists, opt-out registries: 10⁹ keys
    * ≈ 1.2 GB at 1% fpp vs ~16 GB exact). Two stages:
    *   1. build the filter over `keys` once (distributed sketch
    *      aggregate, driver holds bits only) and PREFILTER `big` with
    *      a codegen'd probe — definite non-members (99%+ of a 100 TB
    *      scan when the hit rate is low) never reach the join;
    *   2. the surviving candidates exact-join `keys`, so false
    *      positives drop out — the result equals a plain semi join
    *      bit-for-bit, the filter only sheds shuffle volume.
    * The filter bytes are reusable across runs ([[graft.functions
    * .BloomOps.buildFilter]] / `mightContain` take the serialized
    * form). `expectedItems` sizes the filter; pass the known key count
    * (an overestimate only wastes bits, an underestimate inflates fpp
    * and with it candidate shuffle volume — never correctness). */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
      keys: DataFrame, keysKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = graft.functions.BloomOps.buildFilter(keys, keysKey,
      expectedItems, fpp)
    big.filter(graft.functions.BloomOps.mightContain(col(bigKey), bytes))
      .join(keys.select(col(keysKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** J6 — positional (byLayerOrder) join (`OverwriteFS.py:1284`): match
    * nth row of `left` to nth row of `right` under each side's own order.
    * Both sides number through [[globalRowNumber]] — the naive
    * `row_number() OVER (ORDER BY …)` with no partition funnels every
    * row through one task, which dies at 100 TB scale. */
  def positionalJoin(left: DataFrame, leftOrder: Seq[Column],
      right: DataFrame, rightOrder: Seq[Column]): DataFrame = {
    val ln = globalRowNumber(left, leftOrder, outCol = "_pos")
    val rn = globalRowNumber(right, rightOrder, outCol = "_pos")
    ln.join(rn, "_pos").drop("_pos")
  }

  /** Skew-resistant equi-join: salt the skewed (big) side's key into
    * `saltFactor` sub-keys and explode the small side across all salts,
    * so one hot key spreads over `saltFactor` reduce tasks. AQE's
    * skew-join handles moderate skew automatically; explicit salting is
    * the tool for pathological keys at the 100 TB end. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a table bucketed+sorted on the join key so repeated joins on
    * that key are CO-LOCATED: both sides read pre-hashed buckets and the
    * join plans with NO shuffle exchange. The write-once-shuffle-never
    * pattern for hot fact/dim keys at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", s"/tmp/graft-warehouse/$table")
      .saveAsTable(table)

  // --- §2.5 aggregations ----------------------------------------------------

  /** A1 — per-dataset time extent (`das_client.py:186-232`). */
  def timeExtent(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("min_time"), max(col(tsCol)).as("max_time"))

  /** A3 — chunk-plan derivation (`data_wrangler.py:283-314`): rows → number
    * of uniform time chunks of `chunkSize` expected rows. Runs as one
    * aggregate; the plan itself stays tiny (one row per dataset). */
  def chunkPlan(df: DataFrame, keyCol: String, tsCol: String,
      chunkSize: Long = 100000L): DataFrame =
    df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("row_count"),
      min(col(tsCol)).as("start_time"),
      max(col(tsCol)).as("end_time"))
      .withColumn("chunks", ceil(col("row_count") / lit(chunkSize.toDouble)).cast("long"))

  // --- §2.6 windows ---------------------------------------------------------

  /** W2 — calendar bucketing (`data_wrangler.py:190-221`): day/week/month
    * division of the time axis with its label. */
  def calendarBucket(df: DataFrame, tsCol: String, unit: String): DataFrame = {
    val trunc = date_trunc(unit, col(tsCol))
    val label = unit.toLowerCase match {
      case "week"  => concat(lit("W"), lpad(weekofyear(trunc), 2, "0"),
        lit("-"), year(trunc))
      case "month" => date_format(trunc, "MMM-yyyy")
      case _       => date_format(trunc, "yyyy-MM-dd")
    }
    df.withColumn("bucket_start", trunc).withColumn("bucket_label", label)
  }

  // --- §2.7 sorts / top-k ---------------------------------------------------

  /** The SHARED two-pass global-prefix scaffold behind
    * [[globalRowNumber]], [[TextAnalysis.packSequences]] and
    * [[TextAnalysis.sampleToTokenBudget]]: a global running value
    * (`row_number`/cumulative sum `OVER (ORDER BY …)`) forces every
    * row through ONE partition (WindowExec warns exactly this), which
    * dies at 100 TB. Instead: range-repartition by the order keys,
    * evaluate `local` (the caller's running expression over the
    * per-partition window) in parallel, then add per-partition offsets
    * computed from the P-row totals table.
    *
    * The offsets use an UNPARTITIONED window — fine HERE because the
    * totals table is exactly `parts` rows (metadata-sized, not
    * data-sized): O(P log P) in one task. (A triangular broadcast
    * self-join avoids that exchange but generates O(P²) BNLJ pairs —
    * 5×10⁹ comparisons at P = 100k.) The DATA-path window stays
    * partitioned by `_pid`.
    *
    * Returns the input plus `_pid`, `outLocal` (the within-partition
    * running value, MONOTONE by construction so the per-partition max
    * is its total), and `_offset` (sum of earlier partitions' totals);
    * callers combine and drop the temps.
    *
    * The ranked intermediate is PINNED with an eager localCheckpoint:
    * the totals aggregate and the final join are two consumers of the
    * same sub-plan, and without materialization each re-evaluates
    * `repartitionByRange` — whose sampled range boundaries are NOT
    * guaranteed identical across evaluations — so a row near a
    * boundary can take its local rank from one partitioning and its
    * offset from another (caught at the 10× sweep SF: pack_whole_docs
    * ranks stopped being a permutation). The checkpoint costs one
    * block-manager materialization of the ranked data — the price of a
    * consistent snapshot, same discipline as the iterative graph ops. */
  private[operators] def withGlobalPrefix(df: DataFrame, parts: Int,
      order: Seq[Column], outLocal: String)(
      local: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val localDf = ranged.withColumn(outLocal, local(w)).localCheckpoint(true)
    val sums = localDf.groupBy(col("_pid")).agg(max(col(outLocal)).as("_sum"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("_offset", coalesce(sum(col("_sum")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_offset"))
    localDf.join(broadcast(offsets), "_pid")
  }

  /** [[withGlobalPrefix]] generalized to PER-STRATUM running values
    * (one independent cumsum per source/domain): range-partition by
    * (stratum, order) so each stratum's rows are contiguous across
    * partitions, evaluate the local window per (stratum, partition),
    * then add offsets from the (stratum × partition)-row totals table —
    * the offsets window partitions by stratum over ≤P rows each, so no
    * task ever sees more than P totals. The totals table must stay
    * broadcast-sized: strata × partitions rows — fine for
    * sources/domains (10³×10³), NOT for per-user strata; use a keyed
    * window directly when the stratum key is high-cardinality (each
    * stratum is then small enough to sort in one task). */
  private[operators] def withStratumPrefix(df: DataFrame, parts: Int,
      stratumCols: Seq[String], order: Seq[Column], outLocal: String)(
      local: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame = {
    val stratum = stratumCols.map(col)
    val ranged = df.repartitionByRange(parts, (stratum ++ order): _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy(stratum :+ col("_pid"): _*).orderBy(order: _*)
    // pinned for the same reason as withGlobalPrefix: totals and join
    // must see ONE evaluation of the sampled range partitioning
    val localDf = ranged.withColumn(outLocal, local(w)).localCheckpoint(true)
    val sums = localDf.groupBy(stratum :+ col("_pid"): _*)
      .agg(max(col(outLocal)).as("_sum"))
    val wOff = Window.partitionBy(stratum: _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("_offset", coalesce(sum(col("_sum")).over(wOff), lit(0L)))
      .select(stratum :+ col("_pid") :+ col("_offset"): _*)
    localDf.join(broadcast(offsets), stratumCols :+ "_pid")
  }

  /** HIGH-CARDINALITY twin of [[withStratumPrefix]]: when the stratum
    * key has too many distinct values for the stratum×partition totals
    * table to stay broadcast-sized (per-user / per-session strata), the
    * two-pass scaffold's broadcast join becomes the bottleneck — but by
    * the same token each stratum is SMALL, so the running value can be
    * computed in ONE keyed window: hash-partition by stratum, sort each
    * stratum inside its task. One shuffle, no totals table, no
    * broadcast; the opposite trade of the two-pass path (which exists
    * precisely because few-strata windows put whole strata in one
    * task). Emits the same `_pid`/`_offset`/`outLocal` columns
    * (constant 0 offsets) so callers' combine step is identical —
    * parity-spec'd against [[withStratumPrefix]]. */
  private[operators] def withStratumPrefixKeyed(df: DataFrame,
      stratumCols: Seq[String], order: Seq[Column], outLocal: String)(
      local: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame = {
    val w = Window.partitionBy(stratumCols.map(col): _*).orderBy(order: _*)
    df.withColumn(outLocal, local(w))
      .withColumn("_pid", lit(0))
      .withColumn("_offset", lit(0L))
  }

  private[operators] def defaultParts(df: DataFrame, numPartitions: Int): Int =
    if (numPartitions > 0) numPartitions
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Scalable global row numbering — [[withGlobalPrefix]] with a
    * per-partition `row_number`. Identical output to
    * `row_number() OVER (ORDER BY …)` at any partition count. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      numPartitions: Int = 0, outCol: String = "rn"): DataFrame =
    withGlobalPrefix(df, defaultParts(df, numPartitions), order, "_local_rn")(
      w => row_number().over(w))
      .withColumn(outCol, (col("_offset") + col("_local_rn")).cast("long"))
      .drop("_pid", "_local_rn", "_offset")

  /** Morton (Z-ORDER) code over `cols` — the multi-dimensional data
    * CLUSTERING primitive: rows close in every dimension land close on
    * the one-dimensional curve, so range-partitioning by the code makes
    * a 100-TB table's min/max footer stats selective on EVERY clustered
    * column at once (multi-column scan pruning, not just the leading
    * sort key).
    *
    * Each dimension is scaled to a `bits`-bit integer against its
    * GLOBAL min/max — ONE tiny aggregate pass whose 2·d values inline
    * into the plan as literals (driver-held metadata, not data) — then
    * the bits interleave: bit i of dimension j lands at position
    * i·d + j. Pure integer arithmetic (`DIV`), so an external SQL
    * oracle reproduces the code bit-for-bit. Inputs must cast to
    * BIGINT; constant dimensions map to 0. `bits · cols.size` ≤ 63. */
  def zorderColumn(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      "need 1+ columns and bits*dims <= 63")
    val d = cols.size
    val m = (1L << bits) - 1
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      val mn = stats.getLong(2 * j)
      val mx = stats.getLong(2 * j + 1)
      if (mx <= mn) lit(0L)
      else expr(s"CAST(((CAST(`$c` AS BIGINT) - $mn) * $m) DIV ${mx - mn} AS BIGINT)")
    }
    (for (i <- 0 until bits; j <- 0 until d) yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_.bitwiseOR(_)).as("zval")
  }

  /** Cluster a table on the Z-curve: compute [[zorderColumn]], then
    * range-partition + sort by it — the write-side layout step before a
    * parquet sink, so every output file covers a small hyper-box of the
    * clustered dimensions and downstream scans prune on any of them.
    * One extra full-table pass (the min/max aggregate) plus the one
    * range shuffle any re-layout needs. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Int = 0): DataFrame =
    df.withColumn("_z", zorderColumn(df, cols, bits))
      .repartitionByRange(defaultParts(df, numPartitions), col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** O4 — "latest" selector (`data_wrangler.py:443-446`): single most
    * recent row per key. Window top-1, shuffles once on the key. */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc +: tieBreak.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // --- time-series joins (training-pipeline extensions) ---------------------

  /** BACKWARD AS-OF LEFT JOIN: for every left row, the single right row
    * with the greatest `tsCol` ≤ the left row's `tsCol` on the same
    * key (DuckDB's `ASOF LEFT JOIN`, pandas `merge_asof`). Left rows
    * with no prior right row keep null right columns; `toleranceSeconds`
    * additionally nulls matches older than the window.
    *
    * Spark-first shape — NO range/inequality join anywhere: both sides
    * union into one keyed stream, ONE shuffle on the key, and a
    * carry-forward window (`last(_, ignoreNulls)` over rows ≤ current)
    * threads the latest right payload to each left row. At equal
    * timestamps the right row sorts FIRST (side 0 < 1), so same-instant
    * matches are backward-INCLUSIVE like DuckDB's `>=` bound. Cost is
    * sort-within-partition of |L|+|R| — immune to the range-join blowup
    * (a BNLJ here is |L|·|R| comparisons per key).
    *
    * The right side must be unique per (key, ts) — pre-aggregate if it
    * isn't (ties would otherwise resolve by partition order, which no
    * oracle can reproduce). Output: every left column, then each
    * `rightCols` column plus `<tsCol>_right`, null when unmatched. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String],
      toleranceSeconds: Long = Long.MaxValue): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin: rightCols must be non-empty")
    val rightTs = tsCol + "_right"
    val rStructCols = col(tsCol).as(rightTs) +: rightCols.map(col)
    val rStructType = right.select(rStructCols: _*).schema
    val lPart = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_side"),
      lit(null).cast(rStructType).as("_r"),
      struct(left.columns.map(col): _*).as("_l"))
    val rPart = right
      // SQL join semantics: a null key or null ts never matches — the
      // union trick would otherwise pair null-key rows with each other
      // (they land in the same window partition)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
        lit(0).as("_side"),
        struct(rStructCols: _*).as("_r"),
        lit(null).cast(left.schema).as("_l"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lPart.unionByName(rPart)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .withColumn("_m",
        when(col("_m").isNotNull &&
            col("_ts").cast("long") - col("_m").getField(rightTs).cast("long")
              <= toleranceSeconds,
          col("_m")))
    val outCols = left.columns.map(c => col("_l").getField(c).as(c)) ++
      (rightTs +: rightCols).map(c => col("_m").getField(c).as(c))
    matched.select(outCols.toSeq: _*)
  }

  /** FORWARD AS-OF LEFT JOIN: for every left row, the single right row
    * with the SMALLEST `tsCol` ≥ the left row's `tsCol` on the same key
    * (pandas `merge_asof(direction='forward')`) — "what happened next".
    * The exact mirror of [[asofJoin]]: one keyed shuffle, a
    * carry-forward window over the DESCENDING timestamp order (the
    * right row still sorts first at equal timestamps, so same-instant
    * matches are forward-inclusive), no range join anywhere.
    * `toleranceSeconds` nulls matches further than the window ahead.
    * Right side must be unique per (key, ts) — pre-aggregate ties. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String],
      toleranceSeconds: Long = Long.MaxValue): DataFrame = {
    require(rightCols.nonEmpty, "asofJoinForward: rightCols must be non-empty")
    val rightTs = tsCol + "_right"
    val rStructCols = col(tsCol).as(rightTs) +: rightCols.map(col)
    val rStructType = right.select(rStructCols: _*).schema
    val lPart = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_side"),
      lit(null).cast(rStructType).as("_r"),
      struct(left.columns.map(col): _*).as("_l"))
    val rPart = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
        lit(0).as("_side"),
        struct(rStructCols: _*).as("_r"),
        lit(null).cast(left.schema).as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lPart.unionByName(rPart)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .withColumn("_m",
        when(col("_m").isNotNull &&
            col("_m").getField(rightTs).cast("long") - col("_ts").cast("long")
              <= toleranceSeconds,
          col("_m")))
    val outCols = left.columns.map(c => col("_l").getField(c).as(c)) ++
      (rightTs +: rightCols).map(c => col("_m").getField(c).as(c))
    matched.select(outCols.toSeq: _*)
  }

  /** Point-in-interval RANGE JOIN via time-bin bucketing: pairs every
    * `points` row whose `ptCol` falls inside [`loCol`, `hiCol`] of an
    * `intervals` row — WITHOUT the CartesianProduct/BNLJ Spark plans
    * for a bare inequality join (the 100 TB killer: |I|·|P|
    * comparisons). Each interval explodes into its covered
    * `binSeconds`-wide bins (pick binSeconds ≈ typical interval length
    * so that's a handful of rows); each point maps to exactly ONE bin,
    * so the bin equi-join shuffles both sides once, emits no
    * duplicates, and the exact [lo, hi] predicate runs as a residual
    * filter. Output: all interval columns + all point columns. */
  def rangeJoin(intervals: DataFrame, loCol: String, hiCol: String,
      points: DataFrame, ptCol: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol).cast("long") / binSeconds),
        floor(col(hiCol).cast("long") / binSeconds))))
    val pt = points.withColumn("_bin",
      floor(col(ptCol).cast("long") / binSeconds))
    iv.join(pt, "_bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }
}
