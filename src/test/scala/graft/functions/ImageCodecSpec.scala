package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

class ImageCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def decode(bytes: Array[Byte]) =
    Option(ImageCodec.decodeMetaInternal(bytes))

  test("JPEG round-trip: SOF0 baseline and SOF2 progressive, 1 and 3 components") {
    for ((ch, prog) <- Seq((1, false), (3, false), (1, true), (3, true))) {
      val b = ImageCodec.synthJpeg(640, 480, ch, prog)
      val m = decode(b).get
      assert(m.getUTF8String(0).toString == "jpeg")
      assert(m.getInt(1) == 640 && m.getInt(2) == 480)
      assert(m.getInt(3) == 8)          // precision
      assert(m.getInt(4) == ch)
      assert(m.isNullAt(5))             // color_type is PNG-only
      assert(m.getBoolean(6) == prog)
    }
  }

  test("JPEG: COM payload full of marker-lookalike 0xFF bytes is skipped by length") {
    // synthJpeg always embeds one; also check dims that themselves
    // contain 0xFF bytes (width 0xFF01 would break a naive FF-scan)
    val b = ImageCodec.synthJpeg(0xFF01 & 0xFFFF, 0x00FF, 3, progressive = false)
    val m = decode(b).get
    assert(m.getInt(1) == 0xFF01 && m.getInt(2) == 0x00FF)
  }

  test("JPEG: truncation, missing SOF, and lost sync all decode to null") {
    val good = ImageCodec.synthJpeg(100, 50, 3, progressive = false)
    assert(decode(good.take(3)).isEmpty)
    assert(decode(good.take(25)).isEmpty)         // cut inside a segment
    // SOI + EOI only: structurally valid, no frame header
    assert(decode(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)).isEmpty)
    // corrupt: a non-FF byte where a marker must start
    val bad = good.clone(); bad(2) = 0x00
    assert(decode(bad).isEmpty)
  }

  test("PNG round-trip: every color type maps to its channel count") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val b = ImageCodec.synthPng(1920, 1080, 8, ct)
      val m = decode(b).get
      assert(m.getUTF8String(0).toString == "png")
      assert(m.getInt(1) == 1920 && m.getInt(2) == 1080)
      assert(m.getInt(3) == 8)
      assert(m.getInt(4) == ch, s"color type $ct")
      assert(m.getInt(5) == ct)
      assert(m.isNullAt(6))             // progressive is JPEG-only
    }
    assert(decode(ImageCodec.synthPng(10, 10, 16, 2)).get.getInt(3) == 16)
  }

  test("PNG: corrupted IHDR fails its CRC and decodes to null") {
    val b = ImageCodec.synthPng(64, 64, 8, 2)
    val bad = b.clone(); bad(17) = (bad(17) ^ 0x01).toByte // flip a width bit
    assert(decode(bad).isEmpty)
    assert(decode(b.take(20)).isEmpty)  // truncated before IHDR ends
    assert(decode("not an image".getBytes("ASCII")).isEmpty)
  }

  test("fuzz: no byte sequence throws — truncations, corruptions, random bytes") {
    val rnd = new scala.util.Random(1234)
    val valid = Seq(
      ImageCodec.synthJpeg(640, 480, 3, progressive = false),
      ImageCodec.synthJpeg(1, 1, 1, progressive = true),
      ImageCodec.synthPng(1920, 1080, 8, 6),
      ImageCodec.synthPng(1, 1, 1, 0))
    // every truncation of every valid image decodes or returns null
    valid.foreach { b =>
      (0 to b.length).foreach { n => decode(b.take(n)) }
    }
    // single-byte corruptions at every offset
    valid.foreach { b =>
      b.indices.foreach { i =>
        val c = b.clone(); c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
        decode(c)
      }
    }
    // random bytes, with and without magic prefixes
    val prefixes = Seq(Array.emptyByteArray,
      Array(0xFF.toByte, 0xD8.toByte),
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte))
    (1 to 2000).foreach { _ =>
      val p = prefixes(rnd.nextInt(prefixes.length))
      val body = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(body)
      decode(p ++ body)
    }
    // valid inputs still decode after the fuzz storm (no shared state)
    assert(decode(valid.head).get.getInt(1) == 640)
  }

  test("expressions: synth+decode is a codegen'd projection with correct rows") {
    val df = Seq((0L, "even doc"), (1L, "odd doc"), (6L, "gray jpeg"),
      (3L, "16-bit png"), (27L, "palette png")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        ImageCodec.image_meta(ImageCodec.image_synth(col("doc_id"), col("text"))).as("m"))
      .select(col("doc_id"), col("m.format"), col("m.channels"),
        col("m.bit_depth"), col("m.progressive"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2),
        r.getInt(3), if (r.isNullAt(4)) null else r.getBoolean(4)): (String, Int, Int, Any))).toMap

    assert(out(0L) == (("jpeg", 1, 8, true)))   // 0 % 6 == 0 → gray, 0 % 4 == 0 → progressive
    assert(out(6L) == (("jpeg", 1, 8, false)))
    assert(out(1L) == (("png", 3, 8, null)))    // ct=2 rgb
    assert(out(3L) == (("png", 2, 16, null)))   // ct=4 gray+alpha, 3 % 3 == 0 → 16-bit
    assert(out(27L) == (("png", 1, 8, null)))   // ct=3 palette: 16-bit suppressed

    val plan = df.select(ImageCodec.image_meta(
        ImageCodec.image_synth(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"), plan)
  }
}
