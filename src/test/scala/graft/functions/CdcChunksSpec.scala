package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Gear-CDC invariants: reassembly, content-defined boundary stability
  * under prefix edits, clamp behavior. */
class CdcChunksSpec extends AnyFunSuite {

  private def parts(text: String, maskBits: Int = 5): Seq[(Long, Long, String)] = {
    val arr = CdcOps.chunks(UTF8String.fromString(text), maskBits)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
    }
  }

  /** Deterministic pseudo-random ASCII (LCG over printable range). */
  private def synth(n: Int, seed: Long): String = {
    var s = seed
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      s = (s * 6364136223846793005L + 1442695040888963407L)
      sb.append((33 + math.floorMod(s >>> 33, 94L)).toChar)
    }
    sb.toString
  }

  test("chunks are contiguous, cover the text, and hash their own bytes") {
    val text = synth(500, 7)
    val cs = parts(text)
    assert(cs.nonEmpty)
    assert(cs.head._1 == 0L)
    cs.sliding(2).foreach {
      case Seq((s1, l1, _), (s2, _, _)) => assert(s1 + l1 == s2)
      case _ =>
    }
    assert(cs.last._1 + cs.last._2 == text.length)
    cs.foreach { case (s, l, h) =>
      assert(h == CdcOps.md5Hex(
        text.substring(s.toInt, (s + l).toInt).getBytes("UTF-8")))
    }
  }

  test("boundaries are content-defined: a prefix edit leaves tail chunks intact") {
    val body = synth(400, 11)
    val a = parts("short prefix " + body).map(_._3)
    val b = parts("a completely different and longer prefix!! " + body).map(_._3)
    // the gear hash forgets bytes after 31 shifts, so chunks fully
    // inside the shared suffix hash identically — offset-based blocking
    // would share nothing
    val shared = a.toSet intersect b.toSet
    assert(shared.size >= 3, s"only ${shared.size} shared chunks")
    assert(a.takeRight(2) == b.takeRight(2))
  }

  test("clamped variant respects min/max and still reassembles") {
    val text = synth(600, 23)
    val arr = CdcOps.chunksClamped(UTF8String.fromString(text), 4, 8, 40)
    val cs = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1))
    }
    assert(cs.head._1 == 0 && cs.last._1 + cs.last._2 == text.length)
    cs.sliding(2).foreach {
      case Seq((s1, l1), (s2, _)) => assert(s1 + l1 == s2)
      case _ =>
    }
    assert(cs.forall(_._2 <= 40))
    assert(cs.dropRight(1).forall(_._2 >= 8))
  }

  test("empty text yields no chunks; single char yields one") {
    assert(CdcOps.chunks(UTF8String.fromString(""), 5).numElements() == 0)
    val one = CdcOps.chunks(UTF8String.fromString("x"), 5)
    assert(one.numElements() == 1)
    assert(one.getStruct(0, 3).getLong(1) == 1L)
  }
}
