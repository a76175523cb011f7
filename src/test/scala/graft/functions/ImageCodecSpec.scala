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

  // ------------------------------------------------------- BMP pixel path

  private def stats(bytes: Array[Byte]) =
    Option(ImageCodec.pixelStatsInternal(bytes))

  /** The synth gradient evaluated in plain Scala — the same formulas the
    * SQL oracle uses. */
  private def gradSums(id: Long, w: Int, h: Int,
      map: (Int, Int) => (Int, Int)): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (sx, sy) = map(x, y)
      sr += java.lang.Math.floorMod(sx * 13 + sy * 17 + id * 3, 256L)
      sg += java.lang.Math.floorMod(sx * 7 + sy * 11 + id * 2, 256L)
      sb += java.lang.Math.floorMod(sx * 3 + sy * 5 + id, 256L)
    }
    (sr, sg, sb)
  }

  test("BMP: synth → pixel stats matches the analytic gradient, stride-padded widths included") {
    // text lengths chosen so w*3 % 4 covers every padding case (w = n%37+4);
    // the negative id pins the floorMod contract (sign-following % would
    // wrap through toByte into oracle-divergent values)
    for ((id, text) <- Seq((7L, "abc"), (12L, "abcd"), (5L, "abcde"),
        (99L, "x" * 30), (-42L, "neg id"))) {
      val n = text.getBytes("UTF-8").length
      val w = n % 37 + 4
      val h = n % 23 + 3
      val st = stats(ImageCodec.synthBmp(id,
        org.apache.spark.unsafe.types.UTF8String.fromString(text))).get
      val (sr, sg, sb) = gradSums(id, w, h, (x, y) => (x, y))
      assert(st.getInt(0) == w && st.getInt(1) == h)
      assert(st.getLong(2) == w.toLong * h)
      assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((sr, sg, sb)))
    }
  }

  test("BMP resize: identity dims preserve sums; downsample maps floor(x*w/W)") {
    val t = org.apache.spark.unsafe.types.UTF8String.fromString("hello world")
    val n = 11; val w = n % 37 + 4; val h = n % 23 + 3 // 15 × 14
    val bmp = ImageCodec.synthBmp(42L, t)
    val same = ImageCodec.resizeNnInternal(bmp, w, h)
    assert(java.util.Arrays.equals(same, bmp)) // identity NN == byte-identical
    val rs = stats(ImageCodec.resizeNnInternal(bmp, 4, 5)).get
    val (sr, sg, sb) = gradSums(42L, 4, 5,
      (x, y) => ((x * w / 4), (y * h / 5)))
    assert(rs.getInt(0) == 4 && rs.getInt(1) == 5)
    assert((rs.getLong(3), rs.getLong(4), rs.getLong(5)) == ((sr, sg, sb)))
  }

  test("BMP resize: upsample repeats source pixels; chained resize composes") {
    val t = org.apache.spark.unsafe.types.UTF8String.fromString("ab")
    val bmp = ImageCodec.synthBmp(3L, t) // 6 × 5
    val up = stats(ImageCodec.resizeNnInternal(bmp, 12, 10)).get
    val (sr, sg, sb) = gradSums(3L, 12, 10, (x, y) => (x * 6 / 12, y * 5 / 10))
    assert((up.getLong(3), up.getLong(4), up.getLong(5)) == ((sr, sg, sb)))
    // down then up again lands on the down-sampled grid, not the original
    val down = ImageCodec.resizeNnInternal(bmp, 3, 2)
    val back = stats(ImageCodec.resizeNnInternal(down, 6, 4)).get
    val (r2, g2, b2) = gradSums(3L, 6, 4,
      (x, y) => ((x * 3 / 6) * 6 / 3, (y * 2 / 4) * 5 / 2))
    assert((back.getLong(3), back.getLong(4), back.getLong(5)) == ((r2, g2, b2)))
  }

  test("BMP: top-down (negative height) decodes to the same logical pixels") {
    // hand-build a 2×2 top-down BMP: rows stored top-first
    val px = Seq( // (r,g,b) logical rows top-down
      Seq((10, 20, 30), (40, 50, 60)),
      Seq((70, 80, 90), (100, 110, 120)))
    val stride = 8 // 2*3 padded to 4
    val buf = java.nio.ByteBuffer.allocate(54 + stride * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * 2)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(-2) // NEGATIVE height: top-down
      .putShort(1).putShort(24).putInt(0).putInt(stride * 2)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    px.foreach { row =>
      row.foreach { case (r, g, b) =>
        buf.put(b.toByte).put(g.toByte).put(r.toByte) }
      buf.put(0.toByte).put(0.toByte)
    }
    val st = stats(buf.array()).get
    assert(st.getInt(0) == 2 && st.getInt(1) == 2)
    assert(st.getLong(3) == 10L + 40 + 70 + 100)
    assert(st.getLong(5) == 30L + 60 + 90 + 120)
    // meta sniff agrees
    val m = decode(buf.array()).get
    assert(m.getUTF8String(0).toString == "bmp" && m.getInt(1) == 2 && m.getInt(2) == 2)
  }

  test("BMP fuzz: truncations, corruptions, random bytes never throw; bad dims null") {
    val rnd = new scala.util.Random(77)
    val valid = ImageCodec.synthBmp(5L,
      org.apache.spark.unsafe.types.UTF8String.fromString("fuzz me"))
    (0 to valid.length).foreach { n =>
      stats(valid.take(n)); ImageCodec.resizeNnInternal(valid.take(n), 4, 4)
    }
    valid.indices.foreach { i =>
      val c = valid.clone(); c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
      stats(c); ImageCodec.resizeNnInternal(c, 4, 4)
    }
    (1 to 500).foreach { _ =>
      val body = new Array[Byte](rnd.nextInt(80)); rnd.nextBytes(body)
      stats(Array[Byte]('B', 'M') ++ body)
    }
    assert(ImageCodec.resizeNnInternal(valid, 0, 4) == null)
    assert(ImageCodec.resizeNnInternal(valid, 4, 1 << 20) == null)
    assert(stats(valid).isDefined) // no shared state poisoned by the storm
  }

  // ------------------------------------------------------- PNG pixel path

  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length).put(typ.getBytes("ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  private def chOf(ct: Int) = ct match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }

  test("PNG encode→decode round-trips exact samples: color types × filters, cycling, multi-IDAT") {
    val rnd = new scala.util.Random(42)
    for (ct <- Seq(0, 2, 4, 6); filterMode <- -1 to 4) {
      val ch = chOf(ct)
      val (w, h) = (13, 11)
      val samples = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val filterOf: Int => Int = if (filterMode < 0) identity else (_ => filterMode)
      val png = ImageCodec.encodePng(w, h, ct, samples, filterOf)
      val dec = ImageCodec.decodePngPixels(png)
      assert(dec != null, s"ct=$ct filter=$filterMode")
      assert(dec.width == w && dec.height == h && dec.channels == ch
        && dec.colorType == ct)
      assert(java.util.Arrays.equals(dec.samples, samples), s"ct=$ct filter=$filterMode")
    }
    // incompressible RGBA image → compressed stream ≥ 32 bytes → the
    // encoder splits it across two IDAT chunks; count them on the wire
    val big = Array.fill(32 * 24 * 4)(rnd.nextInt(256).toByte)
    val png = ImageCodec.encodePng(32, 24, 6, big, _ % 5)
    def countIdat(b: Array[Byte]): Int = {
      var i = 8; var n = 0
      while (i + 8 <= b.length) {
        val len = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
          ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (new String(b, i + 4, 4, "ASCII") == "IDAT") n += 1
        i += 12 + len
      }
      n
    }
    assert(countIdat(png) == 2)
    assert(java.util.Arrays.equals(ImageCodec.decodePngPixels(png).samples, big))
  }

  test("PNG encode: negative filterOf values floor-mod into 0-4 instead of crashing") {
    val samples = Array.tabulate(6 * 4 * 3)(i => (i * 7).toByte)
    for (neg <- Seq(-1, -3, -5, Int.MinValue + 4)) {
      val png = ImageCodec.encodePng(6, 4, 2, samples, _ => neg)
      val dec = ImageCodec.decodePngPixels(png)
      assert(dec != null && java.util.Arrays.equals(dec.samples, samples), s"filter=$neg")
    }
    // and a y-dependent mix of signs
    val png = ImageCodec.encodePng(6, 4, 2, samples, y => y - 2)
    assert(java.util.Arrays.equals(ImageCodec.decodePngPixels(png).samples, samples))
  }

  test("PNG: FDICT preset-dictionary stream returns null promptly instead of spinning") {
    // zlib header with FDICT set: CMF=0x78, FLG=0x3F (bit 5 set, and
    // 0x783F % 31 == 0), then a 4-byte DICTID. Inflater.inflate returns
    // 0 with needsDictionary()=true forever — the decoder must bail.
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val fdict = Array[Byte](0x78, 0x3F, 0x01, 0x02, 0x03, 0x04)
    val png = pngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", fdict) ++
      pngChunk("IEND", Array.emptyByteArray)
    val t0 = System.nanoTime
    assert(ImageCodec.decodePngPixels(png) == null)
    assert(ImageCodec.pixelStatsInternal(png) == null)
    assert(System.nanoTime - t0 < 2e9, "decode did not return promptly")
    // truncated-but-valid-prefix stream (needsInput) also returns null
    val trunc = pngSig ++ pngChunk("IHDR", java.nio.ByteBuffer.allocate(13)
        .putInt(4).putInt(4).put(8.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()) ++
      pngChunk("IDAT", Array[Byte](0x78, 0x01, 0x00)) ++ // cut mid-stream
      pngChunk("IEND", Array.emptyByteArray)
    assert(ImageCodec.decodePngPixels(trunc) == null)
  }

  /** Analytic channel sums for the synthPngPixels affine rule. */
  private def pngGradSums(id: Long, w: Int, h: Int, ch: Int,
      map: (Int, Int) => (Int, Int)): Array[Long] = {
    val sums = new Array[Long](ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
      val (sx, sy) = map(x, y)
      sums(c) += java.lang.Math.floorMod(
        sx.toLong * (3 + 2 * c) + sy.toLong * (5 + 2 * c) + id * (c + 1), 256L)
    }
    sums
  }

  test("PNG synth → pixel stats matches the analytic gradient for every color type") {
    for ((id, text) <- Seq((0L, "gray"), (1L, "rgb doc"), (2L, "gray+alpha!"),
        (3L, "rgba here"), (-6L, "negative gray+alpha"), (7L, "x" * 40))) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h) = (n % 29 + 4, n % 19 + 3)
      val ct = Array(0, 2, 4, 6)(java.lang.Math.floorMod(id, 4L).toInt)
      val ch = chOf(ct)
      val st = stats(ImageCodec.synthPngPixels(id, u)).get
      val s = pngGradSums(id, w, h, ch, (x, y) => (x, y))
      assert(st.getInt(0) == w && st.getInt(1) == h && st.getLong(2) == w.toLong * h)
      val (er, eg, eb, ea) = ct match {
        case 0 => (s(0), s(0), s(0), null)
        case 2 => (s(0), s(1), s(2), null)
        case 4 => (s(0), s(0), s(0), s(1))
        case _ => (s(0), s(1), s(2), s(3))
      }
      assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((er, eg, eb)), s"id=$id")
      if (ea == null) assert(st.isNullAt(6)) else assert(st.getLong(6) == ea)
    }
  }

  test("PNG resize: decode → NN resample → re-encode, stats match the mapped gradient") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("resize me now")
    val n = u.numBytes // 13 → w=17, h=16
    val (w, h) = (n % 29 + 4, n % 19 + 3)
    val id = 3L // ct=6 RGBA
    val png = ImageCodec.synthPngPixels(id, u)
    val out = ImageCodec.resizeNnInternal(png, 5, 4)
    assert(out != null && out.take(8).sameElements(pngSig)) // PNG in → PNG out
    val m = decode(out).get
    assert(m.getUTF8String(0).toString == "png" && m.getInt(1) == 5
      && m.getInt(2) == 4 && m.getInt(5) == 6)
    val st = stats(out).get
    val s = pngGradSums(id, 5, 4, 4, (x, y) => (x * w / 5, y * h / 4))
    assert((st.getLong(3), st.getLong(4), st.getLong(5), st.getLong(6))
      == ((s(0), s(1), s(2), s(3))))
    // upsample works too and stays exact
    val up = stats(ImageCodec.resizeNnInternal(png, w * 2, h * 2)).get
    val su = pngGradSums(id, w * 2, h * 2, 4, (x, y) => (x / 2, y / 2))
    assert(up.getLong(3) == su(0) && up.getLong(6) == su(3))
    // malformed PNG input → null, not a crash
    val bad = png.clone(); bad(20) = (bad(20) ^ 0x7F).toByte
    assert(ImageCodec.resizeNnInternal(bad, 5, 4) == null)
  }

  test("palette PNG: encode → decode expands PLTE indices to exact RGB") {
    val rnd = new scala.util.Random(7)
    val plte = Array.tabulate(16 * 3)(i => (i * 37 + 5).toByte)
    val (w, h) = (9, 7)
    val idx = Array.fill(w * h)(rnd.nextInt(16).toByte)
    for (filterMode <- -1 to 4) {
      val filterOf: Int => Int = if (filterMode < 0) identity else (_ => filterMode)
      val png = ImageCodec.encodePng(w, h, 3, idx, filterOf, plte)
      val dec = ImageCodec.decodePngPixels(png)
      assert(dec != null && dec.channels == 3 && dec.colorType == 3)
      for (p <- 0 until w * h; c <- 0 until 3)
        assert(dec.samples(p * 3 + c) == plte((idx(p) & 0xFF) * 3 + c),
          s"pixel $p ch $c filter $filterMode")
    }
    // meta still reports the on-wire shape: 1 channel, color type 3
    val m = decode(ImageCodec.encodePng(w, h, 3, idx, _ => 0, plte)).get
    assert(m.getInt(4) == 1 && m.getInt(5) == 3)
  }

  test("palette PNG: synth → stats matches the composed affine rules; resize → truecolor") {
    for ((id, text) <- Seq((0L, "two entries"), (5L, "seven-ish"),
        (-9L, "negative id"), (14L, "x" * 28))) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h) = (n % 31 + 4, n % 17 + 3)
      val ps = java.lang.Math.floorMod(id, 15L).toInt + 2
      val st = stats(ImageCodec.synthPngPalette(id, u)).get
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val e = java.lang.Math.floorMod(x * 3L + y * 5L + id, ps.toLong)
        sr += java.lang.Math.floorMod(e * 5 + id * 7, 256L)
        sg += java.lang.Math.floorMod(e * 11 + id * 3, 256L)
        sb += java.lang.Math.floorMod(e * 13 + id, 256L)
      }
      assert(st.getInt(0) == w && st.getInt(1) == h)
      assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((sr, sg, sb)), s"id=$id")
      assert(st.isNullAt(6)) // no alpha channel
    }
    // resize expands to truecolor (color type 2) with NN-mapped pixels
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("resizable pal")
    val out = ImageCodec.resizeNnInternal(ImageCodec.synthPngPalette(3L, u), 6, 5)
    val m = decode(out).get
    assert(m.getInt(5) == 2 && m.getInt(1) == 6 && m.getInt(2) == 5)
    assert(stats(out).isDefined)
  }

  test("palette PNG: missing PLTE, PLTE after IDAT, out-of-range index all null") {
    val plte = Array.tabulate(4 * 3)(i => i.toByte)
    val idx = Array.tabulate(6 * 4)(i => (i % 4).toByte)
    val good = ImageCodec.encodePng(6, 4, 3, idx, _ => 0, plte)
    assert(ImageCodec.decodePngPixels(good) != null)
    // strip the PLTE chunk (starts right after IHDR at offset 33)
    val plteLen = 12 + plte.length
    val noPlte = good.take(33) ++ good.drop(33 + plteLen)
    assert(ImageCodec.decodePngPixels(noPlte) == null)
    // move PLTE after the IDATs (re-assemble: sig+IHDR, IDAT.., PLTE, IEND)
    val iendLen = 12
    val moved = good.take(33) ++
      good.slice(33 + plteLen, good.length - iendLen) ++
      good.slice(33, 33 + plteLen) ++ good.takeRight(iendLen)
    assert(ImageCodec.decodePngPixels(moved) == null)
    // an index past the palette end is corruption
    val badIdx = idx.clone(); badIdx(5) = 9 // only 4 entries
    val bad = ImageCodec.encodePng(6, 4, 3, badIdx, _ => 0, plte)
    assert(ImageCodec.decodePngPixels(bad) == null)
    assert(ImageCodec.pixelStatsInternal(bad) == null)
  }

  test("16-bit PNG: encode → decode round-trips exact big-endian samples, all filters") {
    val rnd = new scala.util.Random(16)
    for (ct <- Seq(0, 2, 4, 6); filterMode <- -1 to 4) {
      val ch = chOf(ct)
      val (w, h) = (7, 5)
      val samples = Array.fill(w * h * ch * 2)(rnd.nextInt(256).toByte)
      val filterOf: Int => Int = if (filterMode < 0) identity else (_ => filterMode)
      val png = ImageCodec.encodePng(w, h, ct, samples, filterOf, null, 16)
      val dec = ImageCodec.decodePngPixels(png)
      assert(dec != null && dec.bitDepth == 16 && dec.channels == ch)
      assert(java.util.Arrays.equals(dec.samples, samples), s"ct=$ct filter=$filterMode")
    }
  }

  test("16-bit PNG: synth → stats sums full-range values; resize preserves depth") {
    for ((id, text) <- Seq((0L, "gray deep"), (1L, "rgb deep img"),
        (-4L, "neg gray"), (9L, "y" * 31))) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h) = (n % 23 + 4, n % 15 + 3)
      val gray = java.lang.Math.floorMod(id, 2L) == 0L
      val st = stats(ImageCodec.synthPng16(id, u)).get
      var s0 = 0L; var s1 = 0L; var s2 = 0L
      for (y <- 0 until h; x <- 0 until w) {
        s0 += java.lang.Math.floorMod(x * 31L + y * 47L + id, 65536L)
        s1 += java.lang.Math.floorMod(x * 33L + y * 49L + id * 2, 65536L)
        s2 += java.lang.Math.floorMod(x * 35L + y * 51L + id * 3, 65536L)
      }
      assert(st.getInt(0) == w && st.getInt(1) == h)
      if (gray) assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((s0, s0, s0)))
      else assert((st.getLong(3), st.getLong(4), st.getLong(5)) == ((s0, s1, s2)), s"id=$id")
      assert(st.isNullAt(6))
    }
    // a sample value beyond the 8-bit ceiling survives decode intact:
    // pin one pixel analytically on a large-id image
    val big = stats(ImageCodec.synthPng16(40001L,
      org.apache.spark.unsafe.types.UTF8String.fromString("p"))).get
    // 1 char → w=5, h=4, id odd → RGB; v0(0,0) = floorMod(40001, 65536) > 255
    var exp = 0L
    for (y <- 0 until 4; x <- 0 until 5)
      exp += java.lang.Math.floorMod(x * 31L + y * 47L + 40001L, 65536L)
    assert(big.getLong(3) == exp && exp > 255L * 20)
    // resize: 16-bit in → 16-bit out, NN-mapped deep samples intact
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("deep resize")
    val n = u.numBytes; val (w, h) = (n % 23 + 4, n % 15 + 3)
    val out = ImageCodec.resizeNnInternal(ImageCodec.synthPng16(1L, u), 5, 4)
    val m = decode(out).get
    assert(m.getInt(3) == 16 && m.getInt(1) == 5 && m.getInt(2) == 4)
    val rs = stats(out).get
    var e0 = 0L
    for (y <- 0 until 4; x <- 0 until 5)
      e0 += java.lang.Math.floorMod((x * w / 5) * 31L + (y * h / 4) * 47L + 1L, 65536L)
    assert(rs.getLong(3) == e0)
  }

  test("PNG expressions: synth → resize → stats is a pure codegen'd projection") {
    val df = Seq((1L, "one"), (2L, "two two"), (3L, "three"), (4L, "fourfour"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        ImageCodec.image_pixel_stats(ImageCodec.image_resize_nn(
          ImageCodec.image_synth_png(col("doc_id"), col("text")),
          lit(6), lit(5))).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.n_px"), col("st.sum_r"))
      .collect()
    assert(out.forall(r => r.getInt(1) == 6 && r.getLong(2) == 30L))
    val plan = df.select(ImageCodec.image_pixel_stats(
        ImageCodec.image_synth_png(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"), plan)
  }

  test("BMP expressions: synth → resize → stats is a pure codegen'd projection") {
    val df = Seq((1L, "one"), (2L, "two two")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        ImageCodec.image_pixel_stats(ImageCodec.image_resize_nn(
          ImageCodec.image_synth_bmp(col("doc_id"), col("text")),
          lit(16), lit(9))).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.n_px"), col("st.sum_r"))
      .collect()
    assert(out.forall(r => r.getInt(1) == 16 && r.getLong(2) == 144L))
    val n = "one".length; val w = n % 37 + 4; val h = n % 23 + 3
    val (sr, _, _) = gradSums(1L, 16, 9, (x, y) => (x * w / 16, y * h / 9))
    assert(out.find(_.getLong(0) == 1L).get.getLong(3) == sr)
    val plan = df.select(ImageCodec.image_pixel_stats(
        ImageCodec.image_synth_bmp(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"), plan)
  }

  // ---- dHash ----

  /** Truecolor PNG from an explicit (x, y) → (r, g, b) rule. */
  private def rgbPng(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val s = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      s((y * w + x) * 3) = r.toByte
      s((y * w + x) * 3 + 1) = g.toByte
      s((y * w + x) * 3 + 2) = b.toByte
    }
    ImageCodec.encodePng(w, h, 2, s, _ => 0)
  }

  test("dhash: monotone gradients give all-ones / all-zeros; flat gives zeros") {
    // brightness strictly increasing left-to-right → every cell darker
    // than its right neighbor → all 64 bits set
    val asc = rgbPng(18, 16, (x, _) => (x * 10, x * 10, x * 10))
    assert(ImageCodec.dhashInternal(asc) == -1L) // 64 ones = -1 signed
    val desc = rgbPng(18, 16, (x, _) => (170 - x * 10, 170 - x * 10, 170 - x * 10))
    assert(ImageCodec.dhashInternal(desc) == 0L)
    val flat = rgbPng(18, 16, (_, _) => (7, 7, 7))
    assert(ImageCodec.dhashInternal(flat) == 0L) // equal is NOT darker
  }

  test("dhash: near-identical images differ in few bits; unrelated differ in many") {
    def img(seed: Int) = rgbPng(27, 24, (x, y) =>
      ((x * 7 + y * 3 + seed) % 256, (x * 5 + y * 11) % 256, (x * 3 + y) % 256))
    val a = ImageCodec.dhashInternal(img(0)).longValue()
    val b = ImageCodec.dhashInternal(img(1)).longValue() // tiny brightness shift
    assert(java.lang.Long.bitCount(a ^ b) <= 3,
      s"near pair hamming ${java.lang.Long.bitCount(a ^ b)}")
    val noise = rgbPng(27, 24, (x, y) =>
      (((x * 131 + y * 197) * 31) % 256, ((x * 89 + y * 57) * 17) % 256,
        ((x * 41 + y * 13) * 101) % 256))
    val c = ImageCodec.dhashInternal(noise).longValue()
    assert(java.lang.Long.bitCount(a ^ c) >= 10,
      s"unrelated hamming ${java.lang.Long.bitCount(a ^ c)}")
  }

  test("dhash: same pixels through PNG and BMP containers hash identically") {
    val w = 21; val h = 12
    def px(x: Int, y: Int) = ((x * 9 + y * 4) % 256, (x * 3) % 256, (y * 5) % 256)
    val png = ImageCodec.dhashInternal(rgbPng(w, h, px))
    // BMP rows are bottom-up with BGR order and 4-byte row padding
    val stride = (w * 3 + 3) / 4 * 4
    val bmp = new Array[Byte](54 + stride * h)
    bmp(0) = 'B'; bmp(1) = 'M'
    def put32(off: Int, v: Int): Unit = {
      bmp(off) = v.toByte; bmp(off + 1) = (v >> 8).toByte
      bmp(off + 2) = (v >> 16).toByte; bmp(off + 3) = (v >> 24).toByte
    }
    put32(2, bmp.length); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h); bmp(26) = 1; bmp(28) = 24
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val i = 54 + (h - 1 - y) * stride + x * 3
      bmp(i) = b.toByte; bmp(i + 1) = g.toByte; bmp(i + 2) = r.toByte
    }
    assert(ImageCodec.dhashInternal(bmp) == png)
  }

  test("dhash: undersized, GIF/TIFF, and garbage bytes are null") {
    assert(ImageCodec.dhashInternal(rgbPng(8, 16, (_, _) => (1, 2, 3))) == null)
    assert(ImageCodec.dhashInternal(rgbPng(16, 7, (_, _) => (1, 2, 3))) == null)
    assert(ImageCodec.dhashInternal("notanimage".getBytes) == null)
    assert(ImageCodec.dhashInternal(Array[Byte]()) == null)
    assert(ImageCodec.dhashInternal(null) == null)
  }

  // ---- pHash ----

  test("phash: AC cosine columns sum to exactly zero — DC-only brightness") {
    // the exact-brightness-invariance property below rests on this:
    // a uniform shift moves every pooled cell by the same amount, and
    // a zero column sum means that shift lands entirely in DC
    for (u <- 1 until 8) {
      assert(ImageCodec.phashCosX.map(_(u)).sum == 0L, s"cosX col $u")
      assert(ImageCodec.phashCosY.map(_(u)).sum == 0L, s"cosY col $u")
    }
    assert(ImageCodec.phashCosX.map(_(0)).forall(_ == 4096L))
    assert(ImageCodec.phashCosY.map(_(0)).forall(_ == 4096L))
  }

  test("phash: flat image hashes to 0; uniform brightness shift is invariant") {
    val flat = rgbPng(20, 10, (_, _) => (7, 7, 7))
    assert(ImageCodec.phashInternal(flat) == 0L) // all AC = 0, strict >
    def img(c: Int) = rgbPng(25, 13, (x, y) =>
      ((x * 7 + y * 3) % 200 + c, (x * 5 + y * 11) % 200 + c,
        (x * 3 + y) % 200 + c))
    // +c on every channel shifts only the DC coefficient (excluded from
    // the hash) — dHash shares this property, but pHash keeps it through
    // the DCT only because the AC table columns sum to zero exactly
    assert(ImageCodec.phashInternal(img(0)) == ImageCodec.phashInternal(img(55)))
  }

  test("phash: near-identical images differ in few bits; unrelated in many") {
    def img(seed: Int) = rgbPng(27, 24, (x, y) =>
      ((x * 7 + y * 3 + seed) % 256, (x * 5 + y * 11) % 256, (x * 3 + y) % 256))
    val a = ImageCodec.phashInternal(img(0)).longValue()
    val b = ImageCodec.phashInternal(img(1)).longValue()
    assert(java.lang.Long.bitCount(a ^ b) <= 3,
      s"near pair hamming ${java.lang.Long.bitCount(a ^ b)}")
    val noise = rgbPng(27, 24, (x, y) =>
      (((x * 131 + y * 197) * 31) % 256, ((x * 89 + y * 57) * 17) % 256,
        ((x * 41 + y * 13) * 101) % 256))
    val c = ImageCodec.phashInternal(noise).longValue()
    assert(java.lang.Long.bitCount(a ^ c) >= 10,
      s"unrelated hamming ${java.lang.Long.bitCount(a ^ c)}")
  }

  test("phash: same pixels through PNG and gray-PNG containers agree; nulls") {
    // gray PNG (color type 0) and an RGB PNG with r=g=b must pool the
    // same grayscale (gray is replicated ×3 by the accessor)
    val w = 20; val h = 11
    def lum(x: Int, y: Int) = (x * 9 + y * 4) % 256
    val rgb = ImageCodec.phashInternal(rgbPng(w, h, (x, y) =>
      (lum(x, y), lum(x, y), lum(x, y))))
    val graySamples = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) graySamples(y * w + x) = lum(x, y).toByte
    val gray = ImageCodec.phashInternal(ImageCodec.encodePng(w, h, 0, graySamples, _ => 0))
    assert(rgb == gray)
    assert(ImageCodec.phashInternal(rgbPng(15, 8, (_, _) => (1, 2, 3))) == null)
    assert(ImageCodec.phashInternal(rgbPng(16, 7, (_, _) => (1, 2, 3))) == null)
    assert(ImageCodec.phashInternal("notanimage".getBytes) == null)
    assert(ImageCodec.phashInternal(null) == null)
  }
}
