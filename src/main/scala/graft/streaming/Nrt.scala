package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** NRT (near-real-time) incremental refresh (SURVEY.md §2.10, T1-T6)
  * re-expressed as Spark batch jobs over a small parquet CONTROL TABLE —
  * the Spark-native replacement for the reference's
  * ProcessPoolExecutor(4) + per-dataset retry loop (`core.py:806-880`).
  *
  * Control table schema (one row per published dataset, the analog of
  * the reference's tag-recovered AGOL items, `update_manager.py:30-84`):
  *   dataset_id, base_url, active_slot ("a"|"b"), fingerprint,
  *   last_modified, last_refresh
  *
  * Change detection (T2) tiers map as:
  *   1. HTTP Last-Modified vs stored          → `last_modified` compare
  *   2. CRC32 of downloaded bytes             → [[tableFingerprint]]
  *   3. converter publicationDate             → caller-side watermark
  * An unchanged dataset refresh is a NO-OP (the reference's
  * success=None outcome, `OverwriteFS.py:2182-2196`).
  *
  * Publishing is a blue-green A/B swap (K10, `OverwriteFS.py:1131-1744`):
  * each refresh writes the INACTIVE slot directory in full (the
  * reference's overwrite semantics — no merge, T3), then flips
  * `active_slot` in the control table; readers resolve through
  * [[activePath]] so the flip is atomic at the pointer level.
  */
object Nrt {

  val controlSchema = "dataset_id string, base_url string, active_slot string, " +
    "fingerprint bigint, last_modified timestamp, last_refresh timestamp"

  /** A5 — order-independent content fingerprint of a DataFrame. One
    * aggregate job, no collect; at 100 TB this is a single scan with a
    * tiny result.
    *
    * A pure XOR fold cancels any even-multiplicity difference
    * ({A,A,B} and {B,C,C} XOR to the same value), so the fold combines
    * three commutative moments of the row-hash multiset — XOR, wrapping
    * SUM, and COUNT — each avalanche-mixed before combining. SUM is
    * multiplicity-sensitive where XOR is blind; COUNT catches
    * pure-duplication changes. Summed as decimal(38,0) so the wrapping
    * is ours (low 64 bits), not an ANSI overflow error. */
  def tableFingerprint(df: DataFrame): Long = {
    val hashed = df.select(xxhash64(to_json(struct(df.columns.map(col): _*)))
      .as("h"))
    val row = hashed.agg(
      coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
      count(lit(1)).as("n"),
      coalesce(sum(col("h").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("s")).head()
    def mix(z0: Long): Long = { // murmur3 fmix64
      var z = z0; z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL
      z ^= z >>> 33; z *= 0xC4CEB9FE1A85EC53L; z ^ (z >>> 33)
    }
    val wrappedSum = row.getDecimal(2).toBigInteger.longValue() // low 64 bits
    mix(row.getLong(0)) ^ mix(wrappedSum + 0x9E3779B97F4A7C15L) ^ mix(row.getLong(1))
  }

  /** T1 — the trailing moving-window filter applied to a dataset read. */
  def movingWindow(df: DataFrame, tsCol: String, now: java.sql.Timestamp,
      windowDays: Int = 7): DataFrame =
    df.filter(col(tsCol) >= lit(new java.sql.Timestamp(
      now.getTime - windowDays * 86400000L)) && col(tsCol) <= lit(now))

  /** J3-style plan: which control rows are due for refresh — either
    * source `last_modified` advanced past the stored one, or it's been
    * ≥ `maxAgeHours` since the last refresh. Pure DataFrame filter. */
  def duePlan(control: DataFrame, sourceLastModified: DataFrame,
      maxAgeHours: Int = 24): DataFrame = {
    val src = sourceLastModified
      .withColumnRenamed("last_modified", "src_last_modified")
    control.join(broadcast(src), Seq("dataset_id"), "left")
      .filter(col("src_last_modified").isNull || // unknown → refresh
        col("src_last_modified") > col("last_modified") ||
        col("last_refresh") < current_timestamp() - expr(s"INTERVAL $maxAgeHours HOURS"))
  }

  case class RefreshOutcome(datasetId: String, changed: Boolean,
    newFingerprint: Long, rows: Long, failed: Boolean = false)

  /** One dataset's refresh: read the window, fingerprint it, skip when
    * unchanged (T2/T3), else full-replace the inactive slot (K8+K10). */
  def refreshDataset(spark: SparkSession, datasetId: String, fresh: DataFrame,
      storedFingerprint: Option[Long], sinkRoot: String,
      activeSlot: String): RefreshOutcome = {
    val fp = tableFingerprint(fresh)
    if (storedFingerprint.contains(fp))
      RefreshOutcome(datasetId, changed = false, fp, -1L)
    else {
      val inactive = if (activeSlot == "a") "b" else "a"
      val path = s"$sinkRoot/$datasetId/$inactive"
      fresh.write.mode(SaveMode.Overwrite).parquet(path)
      val n = spark.read.parquet(path).count()
      RefreshOutcome(datasetId, changed = true, fp, n)
    }
  }

  /** Resolve the active data path for a dataset (reader side of K10). */
  def activePath(sinkRoot: String, datasetId: String, activeSlot: String): String =
    s"$sinkRoot/$datasetId/$activeSlot"

  /** [[refreshDataset]] driven through the ONE portal seam
    * ([[graft.sinks.PortalTransport]]): the control state (fingerprint,
    * active slot) lives in the portal item's properties instead of a
    * control-table row, so the SAME flow runs against the local model
    * or a live portal — the reference's tag-recovered item state
    * (`update_manager.py:30-84`) with Spark doing the data plane.
    * Unchanged data still touches the item (the reference touches
    * dependents even on no-op, `OverwriteFS.py:2670-2686`). */
  def refreshViaPortal(spark: SparkSession, datasetId: String, fresh: DataFrame,
      transport: graft.sinks.PortalTransport, sinkRoot: String,
      now: Long = System.currentTimeMillis()): RefreshOutcome = {
    val item = transport.findByTitle(datasetId).getOrElse(
      transport.addOrRetry(datasetId, "Feature Service",
        Seq("erddap2agol", s"did_$datasetId")))
    val stored = transport.props(item.id).get("fingerprint").map(_.toLong)
    val fp = tableFingerprint(fresh)
    if (stored.contains(fp)) {
      transport.touch(item.id, now)
      RefreshOutcome(datasetId, changed = false, fp, -1L)
    } else {
      val active = transport.props(item.id).getOrElse("activeSlot", "b")
      val inactive = if (active == "a") "b" else "a"
      val path = s"$sinkRoot/$datasetId/$inactive"
      fresh.write.mode(SaveMode.Overwrite).parquet(path)
      val n = spark.read.parquet(path).count()
      transport.update(item.id, Map(
        "activeSlot" -> inactive, "fingerprint" -> fp.toString))
      transport.touch(item.id, now)
      RefreshOutcome(datasetId, changed = true, fp, n)
    }
  }

  /** [[refreshViaPortal]] over a set of datasets with the reference's
    * per-dataset fault isolation (`core.py:869-880`) — the portal-seam
    * twin of [[refreshCycle]]: one dataset dying mid-read, mid-write or
    * mid-commit reports a FAILED outcome while the rest proceed. The
    * item-property update is the LAST step of a refresh, so a victim's
    * control state (activeSlot, fingerprint) is untouched by
    * construction: it stays due, its active slot keeps serving the old
    * data in full, and the next healthy cycle's full slot overwrite
    * repairs any partial inactive data — the same invariants
    * NrtChaosSpec proves for the local control-table seam, here proven
    * against BOTH transports (in-JVM model and the live REST client
    * over real sockets; reference recovery: `OverwriteFS.py:2533-2560`). */
  def refreshCycleViaPortal(spark: SparkSession, datasetIds: Seq[String],
      readFresh: String => DataFrame, transport: graft.sinks.PortalTransport,
      sinkRoot: String,
      now: Long = System.currentTimeMillis()): Seq[RefreshOutcome] =
    // DELIBERATELY sequential while refreshCycle runs on parMap: every
    // refresh funnels through the one PortalTransport, whose
    // implementations (token mint + per-request session state) are not
    // proven thread-safe — parallelize only after the transport is.
    datasetIds.map { id =>
      try refreshViaPortal(spark, id, readFresh(id), transport, sinkRoot, now)
      catch { case scala.util.control.NonFatal(_) =>
        RefreshOutcome(id, changed = false, newFingerprint = 0L,
          rows = -1L, failed = true)
      }
    }

  /** Apply refresh outcomes to the control table: flip the slot and
    * store the new fingerprint for changed datasets; touch
    * `last_refresh` for all attempted ones (the reference touches
    * dependent views even on no-op, `OverwriteFS.py:2670-2686`). */
  def applyOutcomes(control: DataFrame, outcomes: Seq[RefreshOutcome],
      now: java.sql.Timestamp): DataFrame = {
    val spark = control.sparkSession
    import spark.implicits._
    // a FAILED refresh leaves its control row completely untouched —
    // including last_refresh — so the dataset stays due and the next
    // cycle retries it (the reference's timeout requeue,
    // `core.py:869-874`)
    val applied = outcomes.filterNot(_.failed)
    if (applied.isEmpty) return control
    val o = applied.toDF()
      .select(col("datasetId").as("dataset_id"), col("changed"),
        col("newFingerprint").as("new_fp"))
    control.join(broadcast(o), Seq("dataset_id"), "left")
      .select(
        col("dataset_id"), col("base_url"),
        when(col("changed") === true,
          when(col("active_slot") === "a", "b").otherwise("a"))
          .otherwise(col("active_slot")).as("active_slot"),
        when(col("changed") === true, col("new_fp"))
          .otherwise(col("fingerprint")).as("fingerprint"),
        col("last_modified"),
        when(col("changed").isNotNull, lit(now))
          .otherwise(col("last_refresh")).as("last_refresh"))
  }

  /** Full refresh cycle over the control table. `readFresh` produces the
    * windowed source read per dataset (in the connector world this is
    * the ERDDAP source with the NRT window pushed down). Datasets run
    * sequentially on the driver but each read/write is a distributed
    * job; at cluster scale you submit them on a fair-scheduler pool —
    * the reference's 4-process pool becomes Spark's own scheduler. */
  def refreshCycle(spark: SparkSession, control: DataFrame,
      readFresh: String => DataFrame, sinkRoot: String,
      now: java.sql.Timestamp): (DataFrame, Seq[RefreshOutcome]) = {
    val rows = control.collect() // control table is small by construction
    // r15 (guide §2.6 "overlap independent jobs"): per-dataset refreshes
    // are independent distributed jobs submitted from the driver —
    // running them from a small thread pool lets the next dataset's
    // tasks back-fill executors freed by the current one's tail instead
    // of serializing every job's full latency. Outcome ORDER stays the
    // control-row order (parMap is order-preserving), so applyOutcomes
    // and the oracle see exactly the sequential result. Mirrors the
    // reference's 4-process pool (`core.py:869-880`).
    val outcomes = parMap(rows.toSeq) { r =>
      val id = r.getAs[String]("dataset_id")
      val slot = r.getAs[String]("active_slot")
      val fp = Option(r.getAs[java.lang.Long]("fingerprint")).map(_.toLong)
      // per-dataset fault isolation, like the reference's pool loop
      // (`core.py:869-880`): one dataset dying mid-read or mid-commit
      // must not abort the cycle — it reports a FAILED outcome (control
      // row untouched, stays due) while the rest proceed. The inactive
      // slot may hold a partial write; the active slot still serves and
      // the next cycle's full-overwrite repairs.
      try refreshDataset(spark, id, readFresh(id), fp, sinkRoot, slot)
      catch { case scala.util.control.NonFatal(_) =>
        RefreshOutcome(id, changed = false, newFingerprint = 0L,
          rows = -1L, failed = true)
      }
    }
    (applyOutcomes(control, outcomes, now), outcomes)
  }

  /** Order-preserving parallel map on a bounded thread pool — the
    * driver-side job-overlap harness of guide §2.6. Caller-supplied
    * bodies must handle their own per-item faults (the refresh loops
    * already do); an escaped exception propagates after all items
    * finish. NOTE this is run-all-then-throw: a FATAL error in item k
    * (the NonFatal per-item guards pass it through) no longer prevents
    * items k+1..n from running and writing their slots, unlike the
    * pre-r15 sequential loop — acceptable here because every refresh
    * is independently recoverable by construction (control row
    * untouched on failure, next cycle's full slot overwrite repairs
    * partial data). The short-lived non-daemon pool per call is
    * deliberate too: 3 calls per pipeline run, and shutdown() in
    * finally means no thread leak and no daemon-thread teardown races
    * with spark.stop(). The pool is sized like the reference's
    * 4-process refresh pool — enough to fill stage tails, not enough
    * to thrash the scheduler. */
  private[graft] def parMap[A, B](xs: Seq[A], parallelism: Int = 4)(
      f: A => B): Seq[B] = {
    if (xs.size <= 1) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, xs.size))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = xs.map { x =>
        new java.util.concurrent.Callable[B] { def call(): B = f(x) }
      }
      pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
    } finally pool.shutdown()
  }
}
