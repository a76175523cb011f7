package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Randomized invariants for the two-pass global-prefix scaffold — the
  * engine's highest-risk component (global ranks must stay an exact
  * permutation under ANY bin assignment, duplicate order keys, null
  * keys, and partition counts; the historical failure class only
  * appeared under re-evaluation disagreement at scale). Every property
  * checks the scaffold against the naive single-partition window over
  * the same data. */
class ScaffoldPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260816L)

  test("globalRowNumber property: exact single-window parity under duplicate keys, nulls, and partition counts") {
    (1 to 4).foreach { round =>
      val n = 50 + rnd.nextInt(400)
      // small key space → heavy duplicate order keys; ~10% null keys
      val rows = (1 to n).map { i =>
        val k: java.lang.Long =
          if (rnd.nextInt(10) == 0) null else rnd.nextInt(12).toLong
        (i.toLong, k)
      }
      val parts = 1 + rnd.nextInt(9)
      val df = rows.toDF("id", "k").repartition(1 + rnd.nextInt(6))
      val got = Relational.globalRowNumber(df,
          Seq(col("k"), col("id")), numPartitions = parts)
        .select(col("id"), col("rn")).as[(Long, Long)].collect().toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
        .select(col("id"), col("rn")).as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round n=$n parts=$parts")
    }
  }

  test("withGlobalPrefix cumsum property: per-row running sums match the single window, including zero and null summands") {
    // null summands count as 0 (the scaffold coalesces before both the
    // window and the totals branch), so the naive reference window sums
    // coalesce(w, 0) too — a raw null-skipping sum(w) disagrees exactly
    // when a null summand lands on the first row of a bin > 0 (cum
    // would be NULL instead of the prior bins' total). The dense-null
    // rounds (w null half the time) make that placement near-certain.
    (1 to 6).foreach { round =>
      val n = 40 + rnd.nextInt(300)
      val nullDen = if (round > 3) 2 else 8
      val rows = (1 to n).map { i =>
        val w: java.lang.Long =
          if (rnd.nextInt(nullDen) == 0) null else rnd.nextInt(5).toLong
        (i.toLong, w)
      }
      val parts = 2 + rnd.nextInt(7)
      val df = rows.toDF("id", "w").repartition(3)
      val got = Relational.withGlobalPrefix(df, parts, Seq(col("id")),
          "_local", col("w"))
        .withColumn("cum", col("_offset") + col("_local"))
        .select(col("id"), col("cum")).as[(Long, Option[Long])]
        .collect().toMap
      val want = df.withColumn("cum",
          sum(coalesce(col("w"), lit(0L))).over(Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("id"), col("cum")).as[(Long, Option[Long])]
        .collect().toMap
      assert(got == want, s"round $round n=$n parts=$parts")
      assert(got.valuesIterator.forall(_.isDefined),
        s"round $round: coalesced running sums must never be NULL")
    }
  }

  test("withStratumPrefix null-summand parity: per-stratum running sums coalesce nulls to 0") {
    (1 to 3).foreach { round =>
      val n = 60 + rnd.nextInt(240)
      val rows = (1 to n).map { i =>
        val w: java.lang.Long =
          if (rnd.nextInt(2) == 0) null else rnd.nextInt(7).toLong
        (i.toLong, s"s${rnd.nextInt(4)}", w)
      }
      val parts = 2 + rnd.nextInt(6)
      val df = rows.toDF("id", "src", "w").repartition(3)
      val got = Relational.withStratumPrefix(df, parts, Seq("src"),
          Seq(col("id")), "_local", col("w"))
        .withColumn("cum", col("_offset") + col("_local"))
        .select(col("id"), col("cum")).as[(Long, Option[Long])]
        .collect().toMap
      val keyed = Relational.withStratumPrefixKeyed(df, Seq("src"),
          Seq(col("id")), "_local", col("w"))
        .withColumn("cum", col("_offset") + col("_local"))
        .select(col("id"), col("cum")).as[(Long, Option[Long])]
        .collect().toMap
      val want = df.withColumn("cum",
          sum(coalesce(col("w"), lit(0L)))
            .over(Window.partitionBy(col("src")).orderBy(col("id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("id"), col("cum")).as[(Long, Option[Long])]
        .collect().toMap
      assert(got == want, s"round $round n=$n parts=$parts")
      assert(keyed == want, s"keyed twin round $round n=$n parts=$parts")
    }
  }

  test("hexPrefixBin scaffold property: md5-rank cumsum matches the single window, nulls ranked first") {
    (1 to 3).foreach { round =>
      val n = 50 + rnd.nextInt(300)
      val rows = (1 to n).map { i =>
        val id: java.lang.Long = if (rnd.nextInt(12) == 0) null else i.toLong
        (id, 1L + rnd.nextInt(9))
      }
      val parts = 2 + rnd.nextInt(7)
      val df = rows.toDF("id", "w")
        .withColumn("_bk", md5(col("id").cast("string")))
        .repartition(3)
      val got = Relational.withGlobalPrefix(df, parts,
          Seq(col("_bk"), col("id")), "_local", col("w"),
          bin = Some(Relational.hexPrefixBin(col("_bk"), parts)))
        .withColumn("cum", col("_offset") + col("_local"))
        .select(col("id"), col("cum")).as[(Option[Long], Long)]
        .collect().sorted
      val want = df.withColumn("cum",
          sum(col("w")).over(Window.orderBy(col("_bk"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("id"), col("cum")).as[(Option[Long], Long)]
        .collect().sorted
      assert(got.sameElements(want), s"round $round n=$n parts=$parts")
      assert(got.length == n, "null-id rows must survive (bin 0)")
    }
  }

  test("withStratumPrefix property: per-stratum running sums match keyed windows for every stratum") {
    (1 to 3).foreach { round =>
      val n = 60 + rnd.nextInt(240)
      val rows = (1 to n).map { i =>
        (i.toLong, s"s${rnd.nextInt(4)}", rnd.nextInt(7).toLong)
      }
      val parts = 2 + rnd.nextInt(6)
      val df = rows.toDF("id", "src", "w").repartition(3)
      val got = Relational.withStratumPrefix(df, parts, Seq("src"),
          Seq(col("id")), "_local", col("w"))
        .withColumn("cum", col("_offset") + col("_local"))
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
      val want = df.withColumn("cum",
          sum(col("w")).over(Window.partitionBy(col("src")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round n=$n parts=$parts")
    }
  }
}
