package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SparkTestSession, TextAnalysis}
import graft.functions.DecodeDatetime

/** Hostile-input hardening across the operator surface. */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dedup pipeline survives empty and whitespace-only documents") {
    val df = Seq(
      (1L, ""), (2L, "   "), (3L, ""), (4L, "real content here with words")
    ).toDF("doc_id", "text")
    // empty docs share a fingerprint → exact dedup keeps lowest id
    val kept = Dedup.exact(df, "text", "doc_id").select("doc_id")
      .as[Long].collect().sorted
    // "" and "   " normalize to the same fingerprint (empty)
    assert(kept.toSeq == Seq(1L, 4L))
    // minhash path: no crash; empty docs collide into a pair
    val pairs = Dedup.minhashLshPairs(df, "text", "doc_id")
    assert(pairs.count() >= 1)
    // simhash path: no crash
    Dedup.simhashPairs(df, "text", "doc_id").count()
  }

  test("text analysis on unicode and punctuation-only input") {
    val df = Seq(
      (1L, "héllo wörld ünïcode"),
      (2L, "!!! ... ???"),
      (3L, "12345 67890")
    ).toDF("doc_id", "text")
    val q = TextAnalysis.qualitySignals(df, "text")
      .select("doc_id", "n_tokens", "punct_ratio", "digit_ratio")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getLong(1) == 3L)
    assert(q(2L).getDouble(2) > 0.5)   // mostly punctuation
    assert(q(3L).getDouble(3) > 0.8)   // mostly digits
    // langid on non-matching text → und
    val lang = TextAnalysis.languageId(df, "text")
      .filter(col("doc_id") === 2L).select("lang_guess").head().getString(0)
    assert(lang == "und")
  }

  test("decode_datetime corpus breadth") {
    def dec(s: String) =
      DecodeDatetime.decode(s, asMicroseconds = false, defaultYear = 2024)
        .map(_.instant)
    assert(dec("Sat, 01 Jun 2024 00:00:00 UTC")
      .contains(Instant.parse("2024-06-01T00:00:00Z")))
    assert(dec("2024-05-25T14:02:00.5Z")
      .contains(Instant.parse("2024-05-25T14:02:00.500Z")))
    // time-only → Jan 1 of default year
    assert(dec("14:02:30").contains(Instant.parse("2024-01-01T14:02:30Z")))
    // 12h boundary cases
    assert(dec("June 1, 2024 12:00 AM").contains(Instant.parse("2024-06-01T00:00:00Z")))
    assert(dec("June 1, 2024 12:00 PM").contains(Instant.parse("2024-06-01T12:00:00Z")))
    // day-name prefix with abbreviated month
    assert(dec("Mon 3 Jun 2024 08:15:00")
      .contains(Instant.parse("2024-06-03T08:15:00Z")))
    // 13-digit negative epoch under the ms quirk
    assert(DecodeDatetime.decode("-86400000", asMicroseconds = true)
      .map(_.instant).contains(Instant.parse("1969-12-31T00:00:00Z")))
  }

  test("glider segments with all-null coordinates yield empty output, not failure") {
    val df = Seq(
      (1L, 1L, 1.0, Double.NaN, Double.NaN),
      (1L, 2L, 2.0, Double.NaN, 1.0)
    ).toDF("track", "pt", "ts", "lon", "lat")
    assert(graft.operators.Glider.segments(df, "track", "ts", "lon", "lat")
      .count() == 0)
  }

  test("chunk planner degenerate extents") {
    import graft.erddap.ChunkPlanner
    val t = Instant.parse("2024-01-01T00:00:00Z")
    // zero-width extent with many rows: all chunks collapse to the instant
    val chunks = ChunkPlanner.timeSubsets(t, t, rowCount = 500, chunkSize = 100)
    assert(chunks.size == 5)
    assert(chunks.forall(c => c.start == t && c.end == t))
  }
}
