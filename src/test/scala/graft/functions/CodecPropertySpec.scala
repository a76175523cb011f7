package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip sweeps for the four binary codecs — beyond
  * the fixed-case specs: random dimensions (including 1-pixel and
  * non-multiple-of-8 edges), every format variant, random content,
  * random filter/restart choices. Seeded, so failures reproduce. */
class CodecPropertySpec extends AnyFunSuite {

  test("PNG: random dims × color types × depths round-trip exactly, random filters") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 60) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val ct = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val depth = if (rnd.nextBoolean()) 8 else 16
      val ch = ct match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
      val samples = Array.fill(w * h * ch * (depth / 8))(rnd.nextInt(256).toByte)
      val filterOf: Int => Int = {
        val mode = rnd.nextInt(3)
        if (mode == 0) _ => rnd.nextInt(5) // fixed-per-call random is fine: captured once below
        else if (mode == 1) identity
        else y => (y * 31 + trial) % 5
      }
      // materialize the filter choice per scanline so encode sees a pure fn
      val filters = Array.tabulate(h)(filterOf)
      val png = ImageCodec.encodePng(w, h, ct, samples, filters(_), null, depth)
      val dec = ImageCodec.decodePngPixels(png)
      assert(dec != null, s"trial $trial: ${w}x$h ct=$ct depth=$depth")
      assert(dec.width == w && dec.height == h && dec.bitDepth == depth)
      assert(java.util.Arrays.equals(dec.samples, samples), s"trial $trial")
    }
  }

  test("Adam7 interlaced PNG: random dims (incl. sub-8) round-trip to the same pixels") {
    val rnd = new scala.util.Random(777)
    for (trial <- 0 until 50) {
      val w = 1 + rnd.nextInt(36)
      val h = 1 + rnd.nextInt(28)
      val ct = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val depth = if (rnd.nextBoolean()) 8 else 16
      val ch = ct match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
      val samples = Array.fill(w * h * ch * (depth / 8))(rnd.nextInt(256).toByte)
      val filters = Array.tabulate(math.max(h, 1))(_ => rnd.nextInt(5))
      val i7 = ImageCodec.encodePng(w, h, ct, samples,
        y => filters(y % filters.length), null, depth, interlaced = true)
      val dec = ImageCodec.decodePngPixels(i7)
      assert(dec != null, s"trial $trial ${w}x$h ct=$ct depth=$depth")
      assert(java.util.Arrays.equals(dec.samples, samples),
        s"trial $trial ${w}x$h ct=$ct depth=$depth")
      // and the interlaced wire decodes to the SAME pixels as the
      // plain wire — interlacing is transport, not content
      val plain = ImageCodec.decodePngPixels(ImageCodec.encodePng(
        w, h, ct, samples, _ => 0, null, depth))
      assert(java.util.Arrays.equals(dec.samples, plain.samples))
      // meta path reports the same header regardless of interlace
      val m = ImageCodec.decodeMetaInternal(i7)
      assert(m.getInt(1) == w && m.getInt(2) == h)
    }
    // 1×1: only pass 1 carries the pixel; every other pass is empty
    val one = ImageCodec.encodePng(1, 1, 0, Array(42.toByte), _ => 4,
      null, 8, interlaced = true)
    val d1 = ImageCodec.decodePngPixels(one)
    assert(d1 != null && d1.samples(0) == 42.toByte)
  }

  test("sub-byte PNG: 1/2/4-bit gray and palette round-trip raw codes, both wire layouts") {
    val rnd = new scala.util.Random(2468)
    for (trial <- 0 until 60) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(25)
      val depth = Seq(1, 2, 4)(rnd.nextInt(3))
      val maxv = 1 << depth
      val interlaced = rnd.nextBoolean()
      val palette = rnd.nextBoolean()
      val samples = Array.fill(w * h)(rnd.nextInt(maxv).toByte)
      val filters = Array.fill(math.max(h, 1))(rnd.nextInt(5))
      if (palette) {
        val plte = Array.fill(maxv * 3)(rnd.nextInt(256).toByte)
        val png = ImageCodec.encodePng(w, h, 3, samples,
          y => filters(y % filters.length), plte, depth, interlaced)
        val dec = ImageCodec.decodePngPixels(png)
        assert(dec != null && dec.channels == 3,
          s"trial $trial pal ${w}x$h d=$depth i=$interlaced")
        for (p <- 0 until w * h; c <- 0 until 3)
          assert(dec.samples(p * 3 + c) == plte((samples(p) & 0xFF) * 3 + c),
            s"trial $trial pal px $p")
      } else {
        val png = ImageCodec.encodePng(w, h, 0, samples,
          y => filters(y % filters.length), null, depth, interlaced)
        val dec = ImageCodec.decodePngPixels(png)
        assert(dec != null && dec.bitDepth == depth,
          s"trial $trial gray ${w}x$h d=$depth i=$interlaced")
        assert(java.util.Arrays.equals(dec.samples, samples),
          s"trial $trial gray ${w}x$h d=$depth i=$interlaced")
        // meta agrees on the declared depth
        assert(ImageCodec.decodeMetaInternal(png).getInt(3) == depth)
      }
    }
  }

  test("PNG palette: random palettes and index maps expand exactly") {
    val rnd = new scala.util.Random(7777)
    for (trial <- 0 until 30) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(20)
      val entries = 1 + rnd.nextInt(256)
      val plte = Array.fill(entries * 3)(rnd.nextInt(256).toByte)
      val idx = Array.fill(w * h)(rnd.nextInt(entries).toByte)
      val png = ImageCodec.encodePng(w, h, 3, idx, _ => rnd.nextInt(5) % 5, plte)
      val dec = ImageCodec.decodePngPixels(png)
      assert(dec != null && dec.channels == 3, s"trial $trial entries=$entries")
      for (p <- 0 until w * h; c <- 0 until 3)
        assert(dec.samples(p * 3 + c) == plte((idx(p) & 0xFF) * 3 + c))
    }
  }

  test("WAV: random channel counts, rates, frame counts round-trip through stats") {
    val rnd = new scala.util.Random(31415)
    for (trial <- 0 until 40) {
      val ch = 1 + rnd.nextInt(4)
      val nf = 1 + rnd.nextInt(300)
      val rate = 1 + rnd.nextInt(96000)
      val frames = Array.fill(nf * ch)(rnd.nextInt(65536).toShort)
      val wav = AudioCodec.encodeWav(ch, rate, frames)
      val m = AudioCodec.metaInternal(wav)
      assert(m != null && m.getInt(1) == ch && m.getInt(2) == rate
        && m.getLong(3) == nf, s"trial $trial")
      val st = AudioCodec.statsInternal(wav)
      var sl = 0L
      for (i <- 0 until nf) sl += frames(i * ch)
      assert(st.getLong(3) == sl, s"trial $trial")
      // decimation at a random k preserves count arithmetic
      val k = 1 + rnd.nextInt(10)
      val dec = AudioCodec.statsInternal(AudioCodec.frameSampleInternal(wav, k))
      assert(dec.getLong(2) == (nf + k - 1) / k)
    }
  }

  test("G.711: every code byte round-trips decode parity between laws and formats") {
    val rnd = new scala.util.Random(999)
    for (trial <- 0 until 20) {
      val ch = 1 + rnd.nextInt(2)
      val nf = 1 + rnd.nextInt(200)
      val ulaw = rnd.nextBoolean()
      val data = Array.fill(nf * ch)(rnd.nextInt(256).toByte)
      val wav = AudioCodec.encodeWavBytes(if (ulaw) 7 else 6, 8, ch, 8000, data)
      val st = AudioCodec.statsInternal(wav)
      assert(st != null && st.getLong(2) == nf, s"trial $trial")
      var sl = 0L
      for (i <- 0 until nf) {
        val code = data(i * ch) & 0xFF
        sl += (if (ulaw) AudioCodec.ulawToLinear(code) else AudioCodec.alawToLinear(code))
      }
      assert(st.getLong(3) == sl, s"trial $trial ulaw=$ulaw")
    }
  }

  test("AVI: random dims/frame counts/periods round-trip; random-k sampling composes") {
    val rnd = new scala.util.Random(424242)
    for (trial <- 0 until 25) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(20)
      val nf = 1 + rnd.nextInt(12)
      val us = 1000L + rnd.nextInt(50000)
      val px = Array.fill(nf, h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val avi = VideoCodec.encodeAvi(w, h, us, nf, (t, x, y) => px(t)(y)(x))
      val m = VideoCodec.metaInternal(avi)
      assert(m != null && m.getInt(1) == w && m.getInt(2) == h
        && m.getLong(3) == nf && m.getLong(4) == us, s"trial $trial")
      val st = VideoCodec.statsInternal(avi)
      var sr = 0L
      for (t <- 0 until nf; y <- 0 until h; x <- 0 until w) sr += px(t)(y)(x)._1
      assert(st.getLong(4) == sr, s"trial $trial")
      val k = 1 + rnd.nextInt(5)
      val sampled = VideoCodec.statsInternal(VideoCodec.frameSampleInternal(avi, k))
      assert(sampled.getLong(2) == (nf + k - 1) / k)
      var sr2 = 0L
      for (j <- 0 until (nf + k - 1) / k; y <- 0 until h; x <- 0 until w)
        sr2 += px(j * k)(y)(x)._1
      assert(sampled.getLong(4) == sr2, s"trial $trial k=$k")
    }
  }

  test("JPEG: random block-constant images round-trip exactly across factor mixes") {
    val rnd = new scala.util.Random(1111)
    for (trial <- 0 until 25) {
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(30)
      val gray = rnd.nextBoolean()
      val dri = rnd.nextInt(3) // 0 = off
      def plane(pw: Int, ph: Int): Array[Int] = {
        val bvals = Array.fill(((ph + 7) / 8) * ((pw + 7) / 8))(rnd.nextInt(256))
        Array.tabulate(pw * ph) { i =>
          bvals(((i / pw) / 8) * ((pw + 7) / 8) + (i % pw) / 8)
        }
      }
      if (gray) {
        val p = plane(w, h)
        val dec = JpegCodec.decodePixels(JpegCodec.encode(w, h, Array(p), dri))
        assert(dec != null, s"trial $trial gray ${w}x$h")
        for (i <- 0 until w * h)
          assert((dec.samples(i) & 0xFF) == p(i), s"trial $trial px $i")
      } else {
        val sub420 = rnd.nextBoolean()
        if (sub420) {
          val cw = (w + 1) / 2; val chh = (h + 1) / 2
          // chroma constant per SUB-grid 8×8 block → exact after upsample
          val py = plane(w, h); val pcb = plane(cw, chh); val pcr = plane(cw, chh)
          val dec = JpegCodec.decodePixels(JpegCodec.encode(w, h,
            Array(py, pcb, pcr), dri, Array(2, 1, 1), Array(2, 1, 1)))
          assert(dec != null, s"trial $trial 420 ${w}x$h")
          def c8(x: Double) = math.max(0, math.min(255, math.floor(x + 0.5).toInt))
          for (y <- 0 until h; x <- 0 until w) {
            val cr = pcr((y / 2) * cw + x / 2) - 128.0
            val expR = c8(py(y * w + x) + 1.402 * cr)
            assert((dec.samples((y * w + x) * 3) & 0xFF) == expR, s"trial $trial ($x,$y)")
          }
        } else {
          val py = plane(w, h); val pcb = plane(w, h); val pcr = plane(w, h)
          val dec = JpegCodec.decodePixels(JpegCodec.encode(w, h, Array(py, pcb, pcr), dri))
          assert(dec != null, s"trial $trial 444 ${w}x$h")
          def c8(x: Double) = math.max(0, math.min(255, math.floor(x + 0.5).toInt))
          for (y <- 0 until h; x <- 0 until w) {
            val i = y * w + x
            val expB = c8(py(i) + 1.772 * (pcb(i) - 128.0))
            assert((dec.samples(i * 3 + 2) & 0xFF) == expB, s"trial $trial ($x,$y)")
          }
        }
      }
    }
  }
}
