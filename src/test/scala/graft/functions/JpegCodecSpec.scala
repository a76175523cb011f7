package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SparkTestSession

class JpegCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gradPlane(w: Int, h: Int, a: Long, b: Long, c: Long,
      id: Long): Array[Int] =
    Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      java.lang.Math.floorMod(bx * a + by * b + id * c, 256L).toInt
    }

  test("block-constant gray round-trips EXACTLY through the full codec") {
    for ((w, h, dri) <- Seq((16, 16, 0), (23, 17, 0), (8, 8, 0), (41, 29, 2))) {
      val plane = gradPlane(w, h, 7, 11, 1, 42L)
      val jpeg = JpegCodec.encode(w, h, Array(plane), dri)
      val dec = JpegCodec.decodePixels(jpeg)
      assert(dec != null && dec.width == w && dec.height == h && dec.channels == 1)
      for (i <- 0 until w * h)
        assert((dec.samples(i) & 0xFF) == plane(i), s"px $i dims ${w}x$h dri=$dri")
    }
  }

  test("block-constant YCbCr round-trips exactly; RGB conversion is the fixed rounding") {
    val (w, h) = (23, 17)
    val id = 5L
    val py = gradPlane(w, h, 5, 7, 1, id)
    val pcb = gradPlane(w, h, 3, 13, 2, id)
    val pcr = gradPlane(w, h, 11, 3, 3, id)
    val dec = JpegCodec.decodePixels(JpegCodec.encode(w, h, Array(py, pcb, pcr)))
    assert(dec != null && dec.channels == 3)
    def conv(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def c8(x: Double) = math.max(0, math.min(255, math.floor(x + 0.5).toInt))
      (c8(y + 1.402 * (cr - 128)),
        c8(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        c8(y + 1.772 * (cb - 128)))
    }
    for (i <- 0 until w * h) {
      val (r, g, b) = conv(py(i), pcb(i), pcr(i))
      assert((dec.samples(3 * i) & 0xFF) == r
        && (dec.samples(3 * i + 1) & 0xFF) == g
        && (dec.samples(3 * i + 2) & 0xFF) == b, s"px $i")
    }
  }

  test("arbitrary pixels round-trip within ±1 per sample at flat quantization") {
    val rnd = new scala.util.Random(8)
    val (w, h) = (24, 16)
    val plane = Array.fill(w * h)(rnd.nextInt(256))
    val dec = JpegCodec.decodePixels(JpegCodec.encode(w, h, Array(plane)))
    assert(dec != null)
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs((dec.samples(i) & 0xFF) - plane(i)))
    assert(maxErr <= 1, s"maxErr=$maxErr")
    // restart markers on an arbitrary image: same bound, predictors reset
    val dec2 = JpegCodec.decodePixels(JpegCodec.encode(w, h, Array(plane), 1))
    for (i <- 0 until w * h)
      assert(math.abs((dec2.samples(i) & 0xFF) - plane(i)) <= 1)
  }

  test("entropy stream with 0xFF data bytes survives stuffing; header path agrees") {
    // hunt a random plane whose encoded stream contains a stuffed FF00
    // (dense random AC values hit 0xFF data bytes quickly) — decode
    // must still land within the flat-quant bound
    val rnd = new scala.util.Random(31)
    var found = false
    var tries = 0
    while (!found && tries < 200) {
      val plane = Array.fill(24 * 16)(rnd.nextInt(256))
      val jpeg = JpegCodec.encode(24, 16, Array(plane))
      // skip the fixed headers; look inside the entropy data
      val sosAt = (0 until jpeg.length - 1).indexWhere(i =>
        (jpeg(i) & 0xFF) == 0xFF && (jpeg(i + 1) & 0xFF) == 0xDA)
      val hasStuffed = (sosAt until jpeg.length - 1).exists(i =>
        (jpeg(i) & 0xFF) == 0xFF && (jpeg(i + 1) & 0xFF) == 0x00)
      if (hasStuffed) {
        found = true
        val dec = JpegCodec.decodePixels(jpeg)
        assert(dec != null)
        for (i <- 0 until 24 * 16)
          assert(math.abs((dec.samples(i) & 0xFF) - plane(i)) <= 1)
      }
      tries += 1
    }
    assert(found, "no stream with a stuffed byte in 200 random planes")
    // the existing header-only path reports the same dims
    val jpeg = JpegCodec.synthJpegPixels(6L, UTF8String.fromString("meta check"))
    val m = ImageCodec.decodeMetaInternal(jpeg)
    val n = "meta check".getBytes("UTF-8").length
    assert(m.getInt(1) == n % 39 + 8 && m.getInt(2) == n % 25 + 8)
  }

  test("synth → pixel stats matches the analytic block rule (gray and color)") {
    for ((id, text) <- Seq((0L, "gray jpeg"), (1L, "color jpeg!"),
        (-3L, "negative color"), (6L, "x" * 35), (3L, "restart color"))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h) = (n % 39 + 8, n % 25 + 8)
      val gray = java.lang.Math.floorMod(id, 2L) == 0L
      val st = ImageCodec.pixelStatsInternal(JpegCodec.synthJpegPixels(id, u))
      assert(st != null, s"id=$id")
      assert(st.getInt(0) == w && st.getInt(1) == h)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val bx = x / 8; val by = y / 8
        if (gray) {
          val v = java.lang.Math.floorMod(bx * 7L + by * 11L + id, 256L)
          sr += v; sg += v; sb += v
        } else {
          val yv = java.lang.Math.floorMod(bx * 5L + by * 7L + id, 256L).toDouble
          val cb = java.lang.Math.floorMod(bx * 3L + by * 13L + id * 2, 256L) - 128.0
          val cr = java.lang.Math.floorMod(bx * 11L + by * 3L + id * 3, 256L) - 128.0
          def c8(x: Double) = math.max(0L, math.min(255L, math.floor(x + 0.5).toLong))
          sr += c8(yv + 1.402 * cr)
          sg += c8(yv - 0.344136 * cb - 0.714136 * cr)
          sb += c8(yv + 1.772 * cb)
        }
      }
      assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((sr, sg, sb)), s"id=$id")
      assert(st.isNullAt(6))
    }
  }

  test("JPEG resize: decode → NN resample → lossless PNG out") {
    val u = UTF8String.fromString("resize jpeg")
    val id = 1L
    val n = u.numBytes
    val (w, h) = (n % 39 + 8, n % 25 + 8)
    val out = ImageCodec.resizeNnInternal(JpegCodec.synthJpegPixels(id, u), 9, 6)
    assert(out != null)
    val m = ImageCodec.decodeMetaInternal(out)
    assert(m.getUTF8String(0).toString == "png" && m.getInt(1) == 9 && m.getInt(2) == 6)
    // spot-check one resampled pixel against the block rule + conversion
    val png = ImageCodec.decodePngPixels(out)
    val (sx, sy) = (4 * w / 9, 3 * h / 6)
    val bx = sx / 8; val by = sy / 8
    val yv = java.lang.Math.floorMod(bx * 5L + by * 7L + id, 256L).toDouble
    val cr = java.lang.Math.floorMod(bx * 11L + by * 3L + id * 3, 256L) - 128.0
    val expR = math.max(0, math.min(255, math.floor(yv + 1.402 * cr + 0.5).toInt))
    assert((png.samples((3 * 9 + 4) * 3) & 0xFF) == expR)
  }

  test("4:2:0: block-constant planes round-trip exactly through interleaved MCUs") {
    for ((id, w, h) <- Seq((9L, 21, 13), (4L, 32, 32), (0L, 17, 25), (7L, 44, 30))) {
      val (cw, chh) = ((w + 1) / 2, (h + 1) / 2)
      val py = Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        java.lang.Math.floorMod(bx * 5L + by * 7L + id, 256L).toInt
      }
      def sub(a: Long, b: Long, c: Long) = Array.tabulate(cw * chh) { i =>
        val bx = (i % cw) / 8; val by = (i / cw) / 8
        java.lang.Math.floorMod(bx * a + by * b + id * c, 256L).toInt
      }
      val pcb = sub(3, 13, 2); val pcr = sub(11, 3, 3)
      val dri = if (id % 2 == 0) 1 else 0 // restart every MCU on even ids
      val jpeg = JpegCodec.encode(w, h, Array(py, pcb, pcr), dri,
        Array(2, 1, 1), Array(2, 1, 1))
      val dec = JpegCodec.decodePixels(jpeg)
      assert(dec != null && dec.width == w && dec.height == h && dec.channels == 3)
      def c8(x: Double) = math.max(0, math.min(255, math.floor(x + 0.5).toInt))
      for (y <- 0 until h; x <- 0 until w) {
        val yv = py(y * w + x)
        val cb = pcb((y / 2) * cw + x / 2) - 128.0
        val cr = pcr((y / 2) * cw + x / 2) - 128.0
        val o = (y * w + x) * 3
        assert((dec.samples(o) & 0xFF) == c8(yv + 1.402 * cr), s"id=$id px ($x,$y)")
        assert((dec.samples(o + 1) & 0xFF) ==
          c8(yv - 0.344136 * cb - 0.714136 * cr))
        assert((dec.samples(o + 2) & 0xFF) == c8(yv + 1.772 * cb))
      }
    }
  }

  test("4:2:2 and 4:4:0 factor mixes decode; arbitrary 4:2:0 content bounded") {
    val rnd = new scala.util.Random(22)
    val (w, h) = (19, 14)
    // 4:2:2 — chroma halved horizontally only
    val cw22 = (w + 1) / 2
    val y1 = Array.fill(w * h)(rnd.nextInt(256))
    val cb1 = Array.fill(cw22 * h)(rnd.nextInt(256))
    val cr1 = Array.fill(cw22 * h)(rnd.nextInt(256))
    val d22 = JpegCodec.decodePixels(JpegCodec.encode(w, h,
      Array(y1, cb1, cr1), 0, Array(2, 1, 1), Array(1, 1, 1)))
    assert(d22 != null && d22.width == w)
    // 4:4:0 — halved vertically only
    val ch40 = (h + 1) / 2
    val d40 = JpegCodec.decodePixels(JpegCodec.encode(w, h,
      Array(y1, Array.fill(w * ch40)(rnd.nextInt(256)),
        Array.fill(w * ch40)(rnd.nextInt(256))),
      0, Array(1, 1, 1), Array(2, 1, 1)))
    assert(d40 != null && d40.height == h)
    // arbitrary 4:2:0 content: Y within ±1 of source after round-trip
    val cw = (w + 1) / 2; val chh = (h + 1) / 2
    val cb2 = Array.fill(cw * chh)(rnd.nextInt(256))
    val cr2 = Array.fill(cw * chh)(rnd.nextInt(256))
    val d20 = JpegCodec.decodePixels(JpegCodec.encode(w, h,
      Array(y1, cb2, cr2), 0, Array(2, 1, 1), Array(2, 1, 1)))
    assert(d20 != null)
    def c8(x: Double) = math.max(0, math.min(255, math.floor(x + 0.5).toInt))
    for (y <- 0 until h; x <- 0 until w) {
      val cb = cb2((y / 2) * cw + x / 2) - 128.0
      val cr = cr2((y / 2) * cw + x / 2) - 128.0
      // reconstruct the decoded Y from R (Y = R - 1.402·Cr ± decode err)
      val r = d20.samples((y * w + x) * 3) & 0xFF
      val expR = c8(y1(y * w + x) + 1.402 * cr)
      assert(math.abs(r - expR) <= 2, s"px ($x,$y): $r vs $expR")
    }
  }

  test("synth 4:2:0 → pixel stats matches the analytic two-grid rule") {
    for ((id, text) <- Seq((0L, "sub gray-ish"), (1L, "sub color"),
        (3L, "restart sub"), (-7L, "negative sub"))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h) = (n % 37 + 8, n % 23 + 8)
      val st = ImageCodec.pixelStatsInternal(JpegCodec.synthJpeg420(id, u))
      assert(st != null, s"id=$id")
      assert(st.getInt(0) == w && st.getInt(1) == h)
      var sr = 0L; var sg = 0L; var sb = 0L
      def c8(x: Double) = math.max(0L, math.min(255L, math.floor(x + 0.5).toLong))
      for (y <- 0 until h; x <- 0 until w) {
        val yv = java.lang.Math.floorMod((x / 8) * 5L + (y / 8) * 7L + id, 256L).toDouble
        val cb = java.lang.Math.floorMod((x / 16) * 3L + (y / 16) * 13L + id * 2, 256L) - 128.0
        val cr = java.lang.Math.floorMod((x / 16) * 11L + (y / 16) * 3L + id * 3, 256L) - 128.0
        sr += c8(yv + 1.402 * cr)
        sg += c8(yv - 0.344136 * cb - 0.714136 * cr)
        sb += c8(yv + 1.772 * cb)
      }
      assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((sr, sg, sb)), s"id=$id")
    }
  }

  test("malformed JPEG: truncations, corruptions, random bytes never throw or hang") {
    val rnd = new scala.util.Random(2468)
    val valid = JpegCodec.synthJpegPixels(7L, UTF8String.fromString("fuzz jpeg"))
    (0 to valid.length).foreach { n =>
      JpegCodec.decodePixels(valid.take(n))
      ImageCodec.pixelStatsInternal(valid.take(n))
    }
    valid.indices.foreach { i =>
      val c = valid.clone(); c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
      JpegCodec.decodePixels(c)
    }
    (1 to 500).foreach { _ =>
      val body = new Array[Byte](rnd.nextInt(120)); rnd.nextBytes(body)
      JpegCodec.decodePixels(Array(0xFF.toByte, 0xD8.toByte) ++ body)
    }
    // a scanless SOF2 header stub is refused (EOI with zero scans); the
    // header-only path still reports it
    val prog = ImageCodec.synthJpeg(64, 48, 3, progressive = true)
    assert(JpegCodec.decodePixels(prog) == null)
    assert(ImageCodec.decodeMetaInternal(prog) != null)
    assert(JpegCodec.decodePixels(valid) != null) // state not poisoned
  }

  test("progressive == baseline decode, bit-exact, on arbitrary content") {
    val rnd = new scala.util.Random(77)
    // gray, 4:4:4 color, 4:2:0 color; with and without restart markers
    for (((kind, dri), caseIdx) <- Seq(("gray", 0), ("gray", 2), ("444", 0),
        ("444", 3), ("420", 0), ("420", 1)).zipWithIndex) {
      val (w, h) = (19 + caseIdx, 14 + caseIdx)
      val y = Array.fill(w * h)(rnd.nextInt(256))
      val (planes, fh, fv) = kind match {
        case "gray" => (Array(y), null, null)
        case "444" => (Array(y, Array.fill(w * h)(rnd.nextInt(256)),
          Array.fill(w * h)(rnd.nextInt(256))), null, null)
        case _ =>
          val cw = (w + 1) / 2; val ch = (h + 1) / 2
          (Array(y, Array.fill(cw * ch)(rnd.nextInt(256)),
            Array.fill(cw * ch)(rnd.nextInt(256))),
            Array(2, 1, 1), Array(2, 1, 1))
      }
      val base = JpegCodec.decodePixels(JpegCodec.encode(w, h, planes, dri, fh, fv))
      val prog = JpegCodec.decodePixels(
        JpegCodec.encodeProgressive(w, h, planes, dri, fh, fv))
      assert(base != null && prog != null, s"$kind dri=$dri")
      assert(prog.width == base.width && prog.height == base.height
        && prog.channels == base.channels)
      // identical coefficients through the same IDCT ⇒ identical pixels
      assert(java.util.Arrays.equals(prog.samples, base.samples),
        s"$kind dri=$dri: progressive decode diverged from baseline")
    }
  }

  test("progressive block-constant synth → pixel stats matches the analytic rule") {
    for ((id, text) <- Seq((0L, "prog gray"), (1L, "prog color!"),
        (5L, "prog 420 subsampled"), (15L, "prog 420 + rst" * 2),
        (3L, "prog restart"), (-9L, "negative prog"), (6L, "g" * 30))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h) = (n % 35 + 8, n % 27 + 8)
      val gray = java.lang.Math.floorMod(id, 2L) == 0L
      val sub = !gray && java.lang.Math.floorMod(id, 5L) == 0L
      val st = ImageCodec.pixelStatsInternal(JpegCodec.synthJpegProg(id, u))
      assert(st != null, s"id=$id")
      assert(st.getInt(0) == w && st.getInt(1) == h, s"id=$id")
      var sr = 0L; var sg = 0L; var sb = 0L
      def c8(x: Double) = math.max(0L, math.min(255L, math.floor(x + 0.5).toLong))
      for (y <- 0 until h; x <- 0 until w) {
        if (gray) {
          val v = java.lang.Math.floorMod((x / 8) * 7L + (y / 8) * 11L + id, 256L)
          sr += v; sg += v; sb += v
        } else {
          val cd = if (sub) 16 else 8 // chroma block size at full resolution
          val yv = java.lang.Math.floorMod((x / 8) * 5L + (y / 8) * 7L + id, 256L).toDouble
          val cb = java.lang.Math.floorMod((x / cd) * 3L + (y / cd) * 13L + id * 2, 256L) - 128.0
          val cr = java.lang.Math.floorMod((x / cd) * 11L + (y / cd) * 3L + id * 3, 256L) - 128.0
          sr += c8(yv + 1.402 * cr)
          sg += c8(yv - 0.344136 * cb - 0.714136 * cr)
          sb += c8(yv + 1.772 * cb)
        }
      }
      assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((sr, sg, sb)), s"id=$id")
    }
  }

  test("progressive streams: truncation and bit-flip fuzz never throws or hangs") {
    val rnd = new scala.util.Random(1357)
    val valid = JpegCodec.synthJpegProg(1L, UTF8String.fromString("fuzz prog"))
    (0 to valid.length).foreach { n =>
      JpegCodec.decodePixels(valid.take(n))
    }
    valid.indices.foreach { i =>
      val c = valid.clone(); c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
      JpegCodec.decodePixels(c)
    }
    assert(JpegCodec.decodePixels(valid) != null)
    // progressive rides resize too (decode → NN resample → lossless PNG)
    val out = ImageCodec.resizeNnInternal(valid, 7, 5)
    assert(out != null)
    val m = ImageCodec.decodeMetaInternal(out)
    assert(m.getUTF8String(0).toString == "png" && m.getInt(1) == 7)
  }

  test("expressions: synth → stats is a pure codegen'd projection") {
    val df = Seq((0L, "gray"), (1L, "color"), (3L, "restart")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        ImageCodec.image_pixel_stats(
          ImageCodec.image_synth_jpeg_px(col("doc_id"), col("text"))).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.n_px")).collect()
    assert(out.length == 3)
    val n0 = "gray".getBytes("UTF-8").length
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getInt(1) == n0 % 39 + 8)
    val plan = df.select(ImageCodec.image_pixel_stats(
        ImageCodec.image_synth_jpeg_px(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"), plan)
  }
}
