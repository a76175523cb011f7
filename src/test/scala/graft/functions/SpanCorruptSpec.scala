package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Span corruption invariants: sentinel splice round-trip, span
  * geometry, passthrough, determinism. */
class SpanCorruptSpec extends AnyFunSuite {

  private def run(text: String, id: String, block: Int = 20, span: Int = 3)
      : (String, String, Long) = {
    val r = SpanCorruptOps.corrupt(text, id, block, span, "")
    (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getLong(2))
  }

  /** Reverse the corruption: replace each <extra_id_k> in the input
    * with the tokens the target carries for it. */
  private def splice(input: String, target: String): String = {
    val sent = "<extra_id_(\\d+)>".r
    val segs = sent.split(target).map(_.trim) // segs(0) empty, k-th after
    val ids = sent.findAllMatchIn(target).map(_.group(1).toInt).toSeq
    val fill = ids.zip(segs.drop(1) ++ Seq("")).toMap
    sent.replaceAllIn(input, m => fill(m.group(1).toInt))
      .replaceAll("\\s+", " ").trim
  }

  test("splice(input, target) reconstructs the original token stream") {
    val text = (0 until 47).map(i => s"t$i").mkString(" ")
    val (in, tgt, n) = run(text, "42")
    assert(n == 2) // 47 tokens → two full 20-token blocks
    assert(splice(in, tgt) == text)
    // exactly n spans' sentinels in input, n+1 in target (closing one)
    assert("<extra_id_".r.findAllIn(in).size == 2)
    assert("<extra_id_".r.findAllIn(tgt).size == 3)
    // each target span carries exactly spanLen tokens
    val body = "<extra_id_\\d+>".r.split(tgt).map(_.trim).filter(_.nonEmpty)
    assert(body.forall(_.split(" ").length == 3))
  }

  test("span placement follows the md5 rule; different ids differ; deterministic") {
    val text = (0 until 40).map(i => s"w$i").mkString(" ")
    val (in1, _, _) = run(text, "1")
    val (in1b, _, _) = run(text, "1")
    assert(in1 == in1b)
    val h0 = java.lang.Long.parseLong(
      CdcOps.md5Hex("1_0".getBytes("UTF-8")).substring(0, 8), 16)
    val o0 = (h0 % 18).toInt
    assert(in1.split(" ")(o0) == "<extra_id_0>")
    // salted identity differs across docs (with overwhelming likelihood
    // for these two fixed ids — asserted concretely, not statistically)
    val (in2, _, _) = run(text, "2")
    assert(in1 != in2)
  }

  test("short and empty documents pass through unmasked") {
    val (in, tgt, n) = run("only five tokens right here", "9")
    assert(in == "only five tokens right here" && tgt == "" && n == 0)
    val (ei, et, en) = run("   ", "9")
    assert(ei == "" && et == "" && en == 0)
  }
}
