package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SparkTestSession

class AudioCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def meta(b: Array[Byte]) = Option(AudioCodec.metaInternal(b))
  private def stats(b: Array[Byte]) = Option(AudioCodec.statsInternal(b))

  private def sample(i: Long, c: Int, id: Long): Long =
    java.lang.Math.floorMod(i * (7 + 2 * c) + id * (3 + c), 65536L) - 32768L

  test("WAV encode → meta round-trips: channels, rate, frames, duration") {
    for ((ch, rate, nf) <- Seq((1, 8000, 100), (2, 44100, 37), (4, 22050, 3))) {
      val frames = Array.tabulate(nf * ch)(i => (i * 31).toShort)
      val m = meta(AudioCodec.encodeWav(ch, rate, frames)).get
      assert(m.getUTF8String(0).toString == "pcm16")
      assert(m.getInt(1) == ch && m.getInt(2) == rate)
      assert(m.getLong(3) == nf)
      assert(m.getLong(4) == nf * 1000000L / rate)
    }
  }

  test("synth → stats matches the analytic rule, mono and stereo, negative ids") {
    for ((id, text) <- Seq((0L, "mono doc"), (1L, "stereo doc"), (2L, "m2"),
        (7L, "x" * 50), (-5L, "negative id"), (100L, ""))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val nf = n % 241 + 20
      val ch = java.lang.Math.floorMod(id, 2L).toInt + 1
      val rate = Array(8000, 16000, 22050, 44100)(
        java.lang.Math.floorMod(id, 4L).toInt)
      val st = stats(AudioCodec.synthWav(id, u)).get
      assert(st.getInt(0) == ch && st.getInt(1) == rate && st.getLong(2) == nf)
      var sl = 0L; var sr = 0L; var peak = 0L
      for (i <- 0 until nf) {
        val v0 = sample(i, 0, id); sl += v0; peak = peak.max(math.abs(v0))
        if (ch == 2) { val v1 = sample(i, 1, id); sr += v1; peak = peak.max(math.abs(v1)) }
      }
      assert(st.getLong(3) == sl, s"id=$id")
      if (ch == 2) assert(st.getLong(4) == sr) else assert(st.isNullAt(4))
      assert(st.getInt(5) == peak, s"id=$id")
      // the spliced odd-length LIST chunk didn't derail the meta path
      val m = meta(AudioCodec.synthWav(id, u)).get
      assert(m.getLong(3) == nf && m.getLong(4) == nf * 1000000L / rate)
    }
  }

  test("frame sampling keeps every k-th frame and re-emits a decodable WAV") {
    val u = UTF8String.fromString("decimate this audio")
    val id = 1L // stereo
    val nf = u.numBytes % 241 + 20
    val wav = AudioCodec.synthWav(id, u)
    for (k <- Seq(1, 2, 3, 7, 1000)) {
      val out = AudioCodec.frameSampleInternal(wav, k)
      val st = stats(out).get
      val expN = (nf + k - 1) / k
      assert(st.getLong(2) == expN, s"k=$k")
      var sl = 0L; var sr = 0L
      for (j <- 0 until expN) {
        sl += sample(j.toLong * k, 0, id); sr += sample(j.toLong * k, 1, id)
      }
      assert(st.getLong(3) == sl && st.getLong(4) == sr, s"k=$k")
      assert(st.getInt(1) == stats(wav).get.getInt(1)) // rate preserved
    }
    // k=1 is an exact identity on frames (header canonicalized)
    val same = AudioCodec.frameSampleInternal(wav, 1)
    assert(stats(same).get.getLong(3) == stats(wav).get.getLong(3))
    assert(AudioCodec.frameSampleInternal(wav, 0) == null)
    assert(AudioCodec.frameSampleInternal(wav, -3) == null)
  }

  test("G.711 expansion: CCITT reference values and symmetry") {
    // μ-law (16-bit scale, BIAS 132): 0xFF is exact zero, 0x00/0x80
    // the extreme magnitudes (±(8158<<2)−BIAS = ±32124)
    assert(AudioCodec.ulawToLinear(0xFF) == 0)
    assert(AudioCodec.ulawToLinear(0x00) == -32124)
    assert(AudioCodec.ulawToLinear(0x80) == 32124)
    assert(AudioCodec.ulawToLinear(0x7F) == -0) // smallest negative step
    // μ-law codes with/without sign bit expand to mirrored magnitudes
    for (c <- 0 until 128)
      assert(AudioCodec.ulawToLinear(c) == -AudioCodec.ulawToLinear(c | 0x80))
    // A-law (same scale): 0x55 (after the XOR mask → 0) is the smallest
    // negative step, 0x2A/0xAA the extremes (±504<<6 = ±32256)
    assert(AudioCodec.alawToLinear(0x55) == -8)
    assert(AudioCodec.alawToLinear(0xD5) == 8)
    assert(AudioCodec.alawToLinear(0x2A) == -32256)
    assert(AudioCodec.alawToLinear(0xAA) == 32256)
    for (c <- 0 until 128)
      assert(AudioCodec.alawToLinear(c) == -AudioCodec.alawToLinear(c | 0x80))
    // both expansions are monotone in magnitude within a segment
    for (seg <- 0 until 8; m <- 0 until 15) {
      val a = (seg << 4) | m
      assert(AudioCodec.ulawToLinear(a | 0x80) > AudioCodec.ulawToLinear((a + 1) | 0x80))
    }
  }

  test("G.711 synth → stats matches Scala-side expansion; decimation preserves encoding") {
    for ((id, text) <- Seq((0L, "ulaw mono"), (1L, "alaw mono"),
        (2L, "ulaw stereo!"), (3L, "alaw stereo"), (-6L, "negative ulaw"))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val nf = n % 241 + 20
      val m4 = java.lang.Math.floorMod(id, 4L).toInt
      val ch = m4 / 2 + 1
      val ulaw = java.lang.Math.floorMod(id, 2L) == 0L
      val wav = AudioCodec.synthWavG711(id, u)
      val m = meta(wav).get
      assert(m.getUTF8String(0).toString == (if (ulaw) "ulaw" else "alaw"))
      assert(m.getInt(1) == ch && m.getLong(3) == nf)
      val st = stats(wav).get
      def expand(code: Int) =
        if (ulaw) AudioCodec.ulawToLinear(code) else AudioCodec.alawToLinear(code)
      var sl = 0L; var sr = 0L; var peak = 0L
      for (i <- 0 until nf; c <- 0 until ch) {
        val code = java.lang.Math.floorMod(
          i.toLong * (7 + 2 * c) + id * (3 + c), 256L).toInt
        val v = expand(code)
        if (c == 0) sl += v else sr += v
        peak = peak.max(math.abs(v))
      }
      assert(st.getLong(3) == sl, s"id=$id")
      if (ch == 2) assert(st.getLong(4) == sr) else assert(st.isNullAt(4))
      assert(st.getInt(5) == peak)
      // decimation: every 2nd frame, SAME companded encoding out
      val half = AudioCodec.frameSampleInternal(wav, 2)
      val hm = meta(half).get
      assert(hm.getUTF8String(0).toString == (if (ulaw) "ulaw" else "alaw"))
      assert(hm.getLong(3) == (nf + 1) / 2)
      var sl2 = 0L
      for (j <- 0 until (nf + 1) / 2)
        sl2 += expand(java.lang.Math.floorMod(j.toLong * 2 * 7 + id * 3, 256L).toInt)
      assert(stats(half).get.getLong(3) == sl2)
    }
  }

  test("malformed WAV: truncations, corruptions, random bytes never throw") {
    val rnd = new scala.util.Random(99)
    val valid = AudioCodec.synthWav(3L, UTF8String.fromString("fuzz wav"))
    (0 to valid.length).foreach { n =>
      meta(valid.take(n)); stats(valid.take(n))
      AudioCodec.frameSampleInternal(valid.take(n), 2)
    }
    valid.indices.foreach { i =>
      val c = valid.clone(); c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
      meta(c); stats(c)
    }
    (1 to 500).foreach { _ =>
      val body = new Array[Byte](rnd.nextInt(100)); rnd.nextBytes(body)
      meta(Array[Byte]('R', 'I', 'F', 'F') ++ body)
    }
    // unknown format code, bad bit depth, odd data length → null
    val fmtOff = valid.indexOfSlice("fmt ".getBytes("ASCII"))
    val badFmt = valid.clone(); badFmt(fmtOff + 8) = 2 // ADPCM: unsupported
    assert(stats(badFmt).isEmpty)
    // float32 demands 32 bits — a float header over 16-bit data refuses
    val badFloat = valid.clone(); badFloat(fmtOff + 8) = 3
    assert(stats(badFloat).isEmpty)
    val badBits = valid.clone(); badBits(fmtOff + 22) = 12
    assert(stats(badBits).isEmpty)
    assert(stats(valid).isDefined) // storm didn't poison shared state
  }

  test("expressions: synth → frame-sample → stats is a pure codegen'd projection") {
    val df = Seq((0L, "mono"), (1L, "stereo here"), (2L, "another mono"),
      (3L, "another stereo")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        AudioCodec.audio_pcm_stats(AudioCodec.audio_frame_sample(
          AudioCodec.audio_synth_wav(col("doc_id"), col("text")),
          lit(3))).as("st"))
      .select(col("doc_id"), col("st.channels"), col("st.n_frames"),
        col("st.sum_l"), col("st.peak"))
      .collect()
    assert(out.length == 4)
    val mono = out.find(_.getLong(0) == 0L).get
    val nf0 = ("mono".getBytes("UTF-8").length % 241 + 20 + 2) / 3
    assert(mono.getInt(1) == 1 && mono.getLong(2) == nf0)
    val plan = df.select(AudioCodec.audio_pcm_stats(
        AudioCodec.audio_synth_wav(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"), plan)
  }

  test("SQL surface: registered functions run end-to-end") {
    graft.GraftExtensions.register(spark)
    Seq((5L, "sql audio")).toDF("doc_id", "text").createOrReplaceTempView("adoc")
    val r = spark.sql(
      """SELECT audio_meta(audio_synth_wav(doc_id, text)).n_frames AS nf,
        |       audio_pcm_stats(audio_frame_sample(
        |         audio_synth_wav(doc_id, text), 2)).n_frames AS nh
        |FROM adoc""".stripMargin).collect().head
    val nf = "sql audio".getBytes("UTF-8").length % 241 + 20
    assert(r.getLong(0) == nf && r.getLong(1) == (nf + 1) / 2)
  }

  test("deep PCM matrix: 8/24-bit and float32 decode to the analytic linear rule") {
    // kind by id mod 3: 0→pcm8, 1→pcm24, 2→float32
    for ((id, want) <- Seq((0L, "pcm8"), (1L, "pcm24"), (2L, "float32"),
        (3L, "pcm8"), (4L, "pcm24"), (5L, "float32"), (-1L, "float32"))) {
      val u = UTF8String.fromString(s"deep audio $id")
      val n = u.numBytes
      val nf = n % 97 + 10
      val ch = java.lang.Math.floorMod(id, 2L).toInt + 1
      val wav = AudioCodec.synthWavDeep(id, u)
      val m = Option(AudioCodec.metaInternal(wav)).get
      assert(m.getUTF8String(0).toString == want, s"id=$id")
      assert(m.getInt(1) == ch && m.getLong(3) == nf)
      def expect(i: Int, c: Int): Long = {
        val e = i.toLong * (7 + 2 * c) + id * (3 + c)
        java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 => java.lang.Math.floorMod(e, 256L) - 128
          case 1 => java.lang.Math.floorMod(e, 1L << 24) - (1L << 23)
          case _ =>
            val v = (java.lang.Math.floorMod(e, 131072L) - 65536L) / 65536.0
            math.floor(v * 32767.0 + 0.5).toLong
        }
      }
      var sl = 0L; var sr = 0L; var pk = 0L
      for (i <- 0 until nf; c <- 0 until ch) {
        val v = expect(i, c)
        if (c == 0) sl += v else sr += v
        pk = math.max(pk, math.abs(v))
      }
      val st = Option(AudioCodec.statsInternal(wav)).get
      assert(st.getLong(3) == sl, s"sum_l id=$id")
      if (ch == 2) assert(st.getLong(4) == sr) else assert(st.isNullAt(4))
      assert(st.getInt(5) == pk.toInt, s"peak id=$id")
      // decimation works at every width and keeps the encoding
      val half = AudioCodec.frameSampleInternal(wav, 2)
      val mh = Option(AudioCodec.metaInternal(half)).get
      assert(mh.getUTF8String(0).toString == want)
      assert(mh.getLong(3) == (nf + 1) / 2)
    }
  }

  test("IMA ADPCM: synth decodes to an independent reference recurrence") {
    // independent in-test decoder (reimplemented from the IMA spec)
    def refDecode(id: Long, nblocks: Int): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (b <- 0 until nblocks) {
        var pred = (java.lang.Math.floorMod(id * 31 + b * 17, 65536L) - 32768L).toInt
        var idx = java.lang.Math.floorMod(id * 7 + b * 3, 89L).toInt
        out += pred
        for (s <- 0 until 16) {
          val nib = java.lang.Math.floorMod(s * 5L + b * 11L + id, 16L).toInt
          val step = AudioCodec.AdpcmSteps(idx)
          var diff = step / 8
          if ((nib & 1) != 0) diff += step / 4
          if ((nib & 2) != 0) diff += step / 2
          if ((nib & 4) != 0) diff += step
          pred = math.max(-32768, math.min(32767,
            if ((nib & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx +
            (if ((nib & 7) < 4) -1 else ((nib & 7) - 3) * 2)))
          out += pred
        }
      }
      out.toSeq
    }
    for (id <- Seq(0L, 1L, 5L, 42L, -3L)) {
      val u = UTF8String.fromString(s"adpcm clip $id")
      val nblocks = u.numBytes % 5 + 2
      val wav = AudioCodec.synthWavAdpcm(id, u)
      val w = AudioCodec.parseWav(wav)
      assert(w.format == 17 && w.nFrames == nblocks * 17)
      val got = AudioCodec.decodeAdpcmMono(w).toSeq
      assert(got == refDecode(id, nblocks), s"id=$id")
      val m = Option(AudioCodec.metaInternal(wav)).get
      assert(m.getUTF8String(0).toString == "adpcm")
      val st = Option(AudioCodec.statsInternal(wav)).get
      assert(st.getLong(3) == got.map(_.toLong).sum)
      assert(st.getInt(5) == got.map(math.abs).max)
      assert(st.isNullAt(4), "mono: sum_r null")
    }
  }

  test("IMA ADPCM decimation decodes once and emits linear PCM16") {
    val u = UTF8String.fromString("decimate adpcm")
    val wav = AudioCodec.synthWavAdpcm(9L, u)
    val full = AudioCodec.decodeAdpcmMono(AudioCodec.parseWav(wav))
    val half = AudioCodec.frameSampleInternal(wav, 2)
    val w2 = AudioCodec.parseWav(half)
    assert(w2.format == 1 && w2.bits == 16, "output is plain PCM16")
    assert(w2.nFrames == (full.length + 1) / 2)
    val st = Option(AudioCodec.statsInternal(half)).get
    val expect = full.indices.collect { case i if i % 2 == 0 => full(i).toLong }
    assert(st.getLong(3) == expect.sum)
  }

  test("IMA ADPCM malformed: bad geometry or stereo header refuses") {
    val good = AudioCodec.synthWavAdpcm(1L, UTF8String.fromString("x"))
    val fmtOff = good.indexOfSlice("fmt ".getBytes("ASCII"))
    val stereo = good.clone(); stereo(fmtOff + 10) = 2
    assert(AudioCodec.parseWav(stereo) == null)
    // samplesPerBlock inconsistent with blockAlign
    val badSpb = good.clone(); badSpb(fmtOff + 26) = 99
    assert(AudioCodec.parseWav(badSpb) == null)
    // data not a whole number of blocks
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 5)
    val dataLenOff = good.indexOfSlice("data".getBytes("ASCII")) + 4
    cut(dataLenOff) = (cut.length - dataLenOff - 4).toByte
    assert(AudioCodec.parseWav(cut) == null)
  }

  test("float32: non-finite samples decode to 0, never a throw") {
    val nan = java.lang.Float.floatToIntBits(Float.NaN)
    val inf = java.lang.Float.floatToIntBits(Float.PositiveInfinity)
    val data = new Array[Byte](8)
    for ((bits, o) <- Seq((nan, 0), (inf, 4)))
      for (k <- 0 until 4) data(o + k) = (bits >> (8 * k)).toByte
    val wav = AudioCodec.encodeWavBytes(3, 32, 1, 8000, data)
    val st = Option(AudioCodec.statsInternal(wav)).get
    assert(st.getLong(3) == 0L && st.getInt(5) == 0)
  }

  // ---- energy fingerprint ----

  /** Mono 16-bit WAV from per-frame amplitudes. */
  private def pcm16(amps: Seq[Int]): Array[Byte] = {
    val data = new Array[Byte](amps.length * 2)
    amps.zipWithIndex.foreach { case (a, i) =>
      data(i * 2) = (a & 0xFF).toByte; data(i * 2 + 1) = ((a >> 8) & 0xFF).toByte
    }
    AudioCodec.encodeWavBytes(1, 16, 1, 8000, data)
  }

  test("fingerprint: monotone loudness ramps give all-ones / zeros; flat gives zeros") {
    // 130 frames, 2 per block: rising |amplitude| → every block quieter
    // than the next → all 64 bits set (signed -1)
    assert(AudioCodec.fingerprintInternal(pcm16((1 to 130).map(_ * 10))) == -1L)
    assert(AudioCodec.fingerprintInternal(pcm16((1 to 130).map(i => 1310 - i * 10))) == 0L)
    assert(AudioCodec.fingerprintInternal(pcm16(Seq.fill(130)(500))) == 0L)
  }

  test("fingerprint: level shift preserves the contour bits it doesn't saturate") {
    val shape = (0 until 130).map(i => 100 + 90 * ((i / 2) % 7))
    val a = AudioCodec.fingerprintInternal(pcm16(shape)).longValue()
    val b = AudioCodec.fingerprintInternal(pcm16(shape.map(_ * 3))).longValue()
    assert(a == b) // scaling every amplitude 3x flips no comparisons
    assert(a != 0L && a != -1L) // and the contour is non-trivial
  }

  test("fingerprint: short clips, ADPCM, and garbage are null") {
    assert(AudioCodec.fingerprintInternal(pcm16(Seq.fill(64)(5))) == null)
    // a VALID long ADPCM clip must be null (stateful format), not a
    // degenerate all-zero hash that near-dups everything
    val adpcm = AudioCodec.synthWavAdpcm(3L,
      UTF8String.fromString("x" * 150))
    assert(AudioCodec.statsInternal(adpcm) != null) // clip itself is valid
    assert(AudioCodec.fingerprintInternal(adpcm) == null)
    assert(AudioCodec.fingerprintInternal("RIFFnope".getBytes) == null)
    assert(AudioCodec.fingerprintInternal(null) == null)
  }
}
