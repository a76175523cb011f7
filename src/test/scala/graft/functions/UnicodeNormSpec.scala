package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

/** Every fixture uses explicit \uXXXX escapes — a source file with
  * bare accented literals cannot distinguish composed from decomposed
  * (editors and tooling silently re-normalize them). */
class UnicodeNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def norm(s: String, form: String = "NFC"): String =
    Seq(Tuple1(s)).toDF("t")
      .select(UnicodeNorm.unicode_normalize(col("t"), form))
      .head().getString(0)

  test("NFC composes decomposed accents; NFD decomposes; ASCII untouched") {
    assert(norm("cafe\u0301") == "caf\u00e9")
    assert(norm("A\u030angstro\u0308m") == "\u00c5ngstr\u00f6m")
    assert(norm("caf\u00e9", "NFD") == "cafe\u0301")
    assert(norm("plain ascii 123") == "plain ascii 123")
  }

  test("NFKC folds compatibility characters NFC leaves alone") {
    // U+FB01 LATIN SMALL LIGATURE FI, U+2460 CIRCLED DIGIT ONE
    assert(norm("\ufb01n") == "\ufb01n")
    assert(norm("\ufb01n", "NFKC") == "fin")
    assert(norm("\u2460", "NFKC") == "1")
  }

  test("idempotent, null-safe, already-normalized returns the same object path") {
    val once = norm("cafe\u0301 \ufb01")
    assert(norm(once) == once)
    val rows = Seq(Tuple1(null: String)).toDF("t")
      .select(UnicodeNorm.unicode_normalize(col("t"))).collect()
    assert(rows.head.isNullAt(0))
  }

  test("invalid form fails at construction with the knob named; SQL surface works") {
    val e = intercept[IllegalArgumentException] { norm("x", "NFX") }
    assert(e.getMessage.contains("unicode_normalize"))
    graft.GraftExtensions.register(spark)
    // the combining char is embedded via a SCALA escape — Spark SQL chr()
    // is ASCII mod 256, unlike DuckDB codepoint chr()
    val r = spark.sql(
      "SELECT unicode_normalize('cafe\u0301') AS a, " +
        "unicode_normalize('\ufb01', 'NFKC') AS b").head()
    assert(r.getString(0) == "caf\u00e9" && r.getString(1) == "fi")
  }

  test("supplementary-plane text survives (surrogate pairs round-trip)") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(norm(emoji + "e\u0301") == emoji + "\u00e9")
  }
}
