package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

class MojibakeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def moji(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))

  test("repairs classic single mojibake, incl. cp1252 punctuation bytes") {
    // note: no codepoint here may UTF-8-encode through bytes 0x81/0x8D/
    // 0x8F/0x90/0x9D — strict cp1252 decoders replace those with U+FFFD
    // (tested lossy below); e.g. a closing ” (…80 9D) only survives
    // Latin-1-style mojibake
    for (clean <- Seq("café", "naïve résumé", "em—dash", "“open-quote",
      "’apostrophe’", "mixed ascii café and № sign", "日本語 text")) {
      val broken = moji(clean)
      assert(broken != clean, s"sanity: '$clean' must actually break")
      assert(Mojibake.repair(broken) == clean, s"repair of '$broken'")
    }
  }

  test("repairs Latin-1-minted mojibake (C1 passthrough) and refuses lossy FFFD") {
    def mojiL1(s: String): String =
      new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    for (clean <- Seq("ā-macron (0x81 continuation)", "café", "“quoted”",
      "em—dash")) {
      val broken = mojiL1(clean)
      assert(Mojibake.repair(broken) == clean, s"latin-1 repair of '$clean'")
    }
    // a strict cp1252 decoder replaced 0x81 with U+FFFD: irrecoverable,
    // and the repair must NOT guess
    val lossy = moji("ā")
    assert(lossy.contains('�') && Mojibake.repair(lossy) == lossy)
  }

  test("leaves correctly-encoded text untouched") {
    for (s <- Seq("plain ascii", "café déjà-vu", "—…‘’“”", "русский", "中文",
      "single é", "€100", ""))
      assert(Mojibake.repair(s) == s, s)
  }

  test("unwinds double mojibake; bounded passes terminate") {
    val clean = "café — fin"
    // Latin-1 minting: the second decode hits €'s 0x82 continuation
    // byte, which strict cp1252 would have destroyed
    def mojiL1(s: String): String =
      new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Mojibake.repair(mojiL1(mojiL1(clean))) == clean)
    assert(Mojibake.repair(mojiL1(moji(clean))) == clean)
  }

  test("mixed content: only the broken run is repaired") {
    val s = "intro café kept, broken " + moji("naïve") + " fixed, end"
    assert(Mojibake.repair(s) == "intro café kept, broken naïve fixed, end")
  }

  test("expression over a DataFrame, null-safe") {
    val df = Seq(Tuple1(moji("café")), Tuple1(null.asInstanceOf[String]))
      .toDF("t")
    val out = df.select(Mojibake.fix_mojibake(col("t")).as("f")).collect()
    assert(out(0).getString(0) == "café")
    assert(out(1).isNullAt(0))
  }
}
