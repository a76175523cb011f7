package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** Shared across executor threads (local mode = one JVM): lets the
  * chaos UDF count row evaluations so the FINGERPRINT pass over a
  * dataset succeeds and the subsequent slot WRITE dies partway — a
  * genuine mid-commit kill, not a read-time failure. */
object NrtChaosCounter {
  val evals = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** Chaos pass on the NRT lifecycle (the reference's operational core:
  * per-dataset retry isolation `core.py:869-880`, overwrite recovery
  * `OverwriteFS.py:2533-2560`). [[NrtPipelineSpec]] proves the happy
  * path; here one dataset's refresh is KILLED MID-COMMIT and the
  * composite invariants must hold: the cycle completes for the other
  * datasets, the victim's active slot still serves the old data, its
  * control row is untouched (so it stays due), and the next healthy
  * cycle repairs the partial slot via the full overwrite. */
class NrtChaosSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def base(v: Int) = spark.range(200)
    .select(col("id"), lit(v).as("ver"), (col("id") % 7).as("grp"))
    .repartition(4)

  test("mid-commit kill: victim untouched and still due, cycle survives, next cycle repairs") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("nrt_chaos").toString
    val now1 = Timestamp.valueOf("2024-02-01 00:00:00")
    val now2 = Timestamp.valueOf("2024-02-02 00:00:00")
    val now3 = Timestamp.valueOf("2024-02-03 00:00:00")
    val lm = Timestamp.valueOf("2024-01-01 00:00:00")
    val control = Seq("ds_a", "ds_b", "ds_c").map { id =>
      (id, "https://x/", "a", null.asInstanceOf[java.lang.Long], lm, lm)
    }.toDF("dataset_id", "base_url", "active_slot", "fingerprint",
      "last_modified", "last_refresh")

    // cycle 1: clean publish everywhere (fingerprints unknown)
    val (c1, out1) = Nrt.refreshCycle(spark, control, _ => base(1), root, now1)
    assert(out1.forall(o => o.changed && !o.failed))
    assert(c1.collect().forall(_.getAs[String]("active_slot") == "b"))
    val fpB1 = c1.filter(col("dataset_id") === "ds_b")
      .collect().head.getAs[Long]("fingerprint")

    // cycle 2: ds_b's write dies mid-commit. The chaos column passes
    // the 200-row fingerprint scan (evals 1-200) and throws during the
    // write job (evals 201+, threshold 300 ≈ half the rows written).
    NrtChaosCounter.evals.set(0L)
    val boom = udf { (id: Long) =>
      if (NrtChaosCounter.evals.incrementAndGet() > 300L)
        throw new RuntimeException("chaos: mid-commit kill")
      id
    }
    def read2(id: String) = id match {
      case "ds_a" => base(1) // unchanged → no-op
      case "ds_b" => base(2).withColumn("chaos", boom(col("id")))
      case _ => base(2) // changed → refresh
    }
    val (c2, out2) = Nrt.refreshCycle(spark, c1, read2, root, now2)
    val byId = out2.map(o => o.datasetId -> o).toMap
    assert(!byId("ds_a").changed && !byId("ds_a").failed)
    assert(byId("ds_b").failed, "the killed refresh must report failed")
    assert(byId("ds_c").changed && !byId("ds_c").failed)

    val rows2 = c2.collect().map(r => r.getAs[String]("dataset_id") -> r).toMap
    // victim row COMPLETELY untouched: slot, fingerprint, last_refresh
    assert(rows2("ds_b").getAs[String]("active_slot") == "b")
    assert(rows2("ds_b").getAs[Long]("fingerprint") == fpB1)
    assert(rows2("ds_b").getAs[Timestamp]("last_refresh") == now1,
      "failed refresh must NOT touch last_refresh — the dataset stays due")
    // survivors proceeded: ds_a no-op touch, ds_c flipped
    assert(rows2("ds_a").getAs[String]("active_slot") == "b")
    assert(rows2("ds_a").getAs[Timestamp]("last_refresh") == now2)
    assert(rows2("ds_c").getAs[String]("active_slot") == "a")

    // the victim's ACTIVE slot still serves cycle-1 data in full
    val served = spark.read.parquet(Nrt.activePath(root, "ds_b", "b"))
    assert(served.count() == 200)
    assert(served.agg(max(col("ver"))).head().getInt(0) == 1)

    // cycle 3 (healthy): the full slot overwrite repairs the partial
    // inactive dir and ds_b finally flips with complete v2 data
    val (c3, out3) = Nrt.refreshCycle(spark, c2, _ => base(2), root, now3)
    val byId3 = out3.map(o => o.datasetId -> o).toMap
    assert(byId3("ds_b").changed && !byId3("ds_b").failed)
    assert(byId3("ds_b").rows == 200)
    val rows3 = c3.collect().map(r => r.getAs[String]("dataset_id") -> r).toMap
    assert(rows3("ds_b").getAs[String]("active_slot") == "a")
    assert(rows3("ds_b").getAs[Long]("fingerprint") != fpB1)
    assert(rows3("ds_b").getAs[Timestamp]("last_refresh") == now3)
    val repaired = spark.read.parquet(Nrt.activePath(root, "ds_b", "a"))
    assert(repaired.count() == 200)
    assert(repaired.agg(min(col("ver"))).head().getInt(0) == 2)
    // ds_c: same content as cycle 2 → no-op, slot stays
    assert(!byId3("ds_c").changed)
    assert(rows3("ds_c").getAs[String]("active_slot") == "a")
  }

  test("read-time death (source timeout analog) is isolated the same way") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("nrt_chaos2").toString
    val now = Timestamp.valueOf("2024-02-01 00:00:00")
    val lm = Timestamp.valueOf("2024-01-01 00:00:00")
    val control = Seq(("ok", "u", "a", null.asInstanceOf[java.lang.Long], lm, lm),
        ("dead", "u", "a", null.asInstanceOf[java.lang.Long], lm, lm))
      .toDF("dataset_id", "base_url", "active_slot", "fingerprint",
        "last_modified", "last_refresh")
    def read(id: String) =
      if (id == "dead") throw new java.io.IOException("connector timeout")
      else base(1)
    val (c, out) = Nrt.refreshCycle(spark, control, read, root, now)
    val byId = out.map(o => o.datasetId -> o).toMap
    assert(byId("ok").changed && !byId("ok").failed)
    assert(byId("dead").failed)
    val rows = c.collect().map(r => r.getAs[String]("dataset_id") -> r).toMap
    assert(rows("ok").getAs[String]("active_slot") == "b")
    assert(rows("dead").getAs[String]("active_slot") == "a")
    assert(rows("dead").getAs[Timestamp]("last_refresh") == lm)
  }
}
