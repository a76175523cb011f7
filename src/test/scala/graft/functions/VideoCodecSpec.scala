package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SparkTestSession

class VideoCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def meta(b: Array[Byte]) = Option(VideoCodec.metaInternal(b))
  private def stats(b: Array[Byte]) = Option(VideoCodec.statsInternal(b))

  /** The synth gradient's analytic channel sums over frames tOf(j). */
  private def gradSums(id: Long, w: Int, h: Int, nf: Int,
      tOf: Int => Int): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (j <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val t = tOf(j)
      sr += java.lang.Math.floorMod(x * 13L + y * 17L + t * 19L + id * 3, 256L)
      sg += java.lang.Math.floorMod(x * 7L + y * 11L + t * 23L + id * 2, 256L)
      sb += java.lang.Math.floorMod(x * 3L + y * 5L + t * 29L + id, 256L)
    }
    (sr, sg, sb)
  }

  test("AVI encode → meta round-trips: dims, frame count, frame period") {
    for ((id, text) <- Seq((0L, "clip one"), (1L, "another clip here"),
        (2L, ""), (-7L, "negative id clip"))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h, f) = (n % 21 + 4, n % 13 + 3, n % 17 + 2)
      val us = Array(33333L, 40000L, 16667L, 20000L)(
        java.lang.Math.floorMod(id, 4L).toInt)
      val m = meta(VideoCodec.synthAvi(id, u)).get
      assert(m.getUTF8String(0).toString == "avi")
      assert(m.getInt(1) == w && m.getInt(2) == h)
      assert(m.getLong(3) == f && m.getLong(4) == us)
      assert(m.getLong(5) == f * us)
    }
  }

  test("synth → pixel stats matches the analytic per-frame gradient") {
    for ((id, text) <- Seq((3L, "stats clip"), (11L, "x" * 33), (-2L, "neg"))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h, f) = (n % 21 + 4, n % 13 + 3, n % 17 + 2)
      val st = stats(VideoCodec.synthAvi(id, u)).get
      assert(st.getInt(0) == w && st.getInt(1) == h && st.getLong(2) == f)
      assert(st.getLong(3) == w.toLong * h * f)
      val (sr, sg, sb) = gradSums(id, w, h, f, identity)
      assert((st.getLong(4), st.getLong(5), st.getLong(6)) == ((sr, sg, sb)), s"id=$id")
    }
  }

  test("frame sampling keeps frames 0, k, 2k… and re-emits a decodable AVI") {
    val u = UTF8String.fromString("sample this clip")
    val id = 5L
    val n = u.numBytes
    val (w, h, f) = (n % 21 + 4, n % 13 + 3, n % 17 + 2)
    val avi = VideoCodec.synthAvi(id, u)
    for (k <- Seq(1, 2, 3, 5, 100)) {
      val out = VideoCodec.frameSampleInternal(avi, k)
      val st = stats(out).get
      val expN = (f + k - 1) / k
      assert(st.getLong(2) == expN, s"k=$k")
      val (sr, sg, sb) = gradSums(id, w, h, expN, j => j * k)
      assert((st.getLong(4), st.getLong(5), st.getLong(6)) == ((sr, sg, sb)), s"k=$k")
      // frame period unchanged: pure decimation
      assert(meta(out).get.getLong(4) == meta(avi).get.getLong(4))
    }
    // double sampling composes: every 2nd of every 2nd = every 4th
    val twice = VideoCodec.frameSampleInternal(
      VideoCodec.frameSampleInternal(avi, 2), 2)
    val st4 = stats(twice).get
    val exp4 = ((f + 1) / 2 + 1) / 2
    assert(st4.getLong(2) == exp4)
    val (sr4, _, _) = gradSums(id, w, h, exp4, j => j * 4)
    assert(st4.getLong(4) == sr4)
    assert(VideoCodec.frameSampleInternal(avi, 0) == null)
  }

  test("malformed AVI: truncations, corruptions, random bytes never throw") {
    val rnd = new scala.util.Random(2026)
    val valid = VideoCodec.synthAvi(9L, UTF8String.fromString("fuzz avi"))
    (0 to valid.length).foreach { n =>
      meta(valid.take(n)); stats(valid.take(n))
      VideoCodec.frameSampleInternal(valid.take(n), 2)
    }
    valid.indices.foreach { i =>
      val c = valid.clone(); c(i) = (c(i) ^ (1 + rnd.nextInt(255))).toByte
      meta(c); stats(c)
    }
    (1 to 500).foreach { _ =>
      val body = new Array[Byte](rnd.nextInt(120)); rnd.nextBytes(body)
      meta(Array[Byte]('R', 'I', 'F', 'F') ++ body)
    }
    // a declared frame count that disagrees with the movi list → null
    val badCount = valid.clone()
    // avih payload starts at 12 (RIFF hdr) + 12 (LIST hdrl) + 8 (avih hdr);
    // dwTotalFrames is at payload offset 16
    val totOff = 12 + 12 + 8 + 16
    badCount(totOff) = (badCount(totOff) + 1).toByte
    assert(meta(badCount).isEmpty)
    assert(meta(valid).isDefined) // storm didn't poison shared state
  }

  test("expressions: synth → frame-sample → stats is a pure codegen'd projection") {
    val df = Seq((0L, "v0"), (1L, "clip one"), (2L, "clip two two"),
      (3L, "three")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        VideoCodec.video_pixel_stats(VideoCodec.video_frame_sample(
          VideoCodec.video_synth_avi(col("doc_id"), col("text")),
          lit(2))).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.n_frames"), col("st.sum_r"))
      .collect()
    assert(out.length == 4)
    val n0 = "v0".getBytes("UTF-8").length
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getInt(1) == n0 % 21 + 4)
    assert(r0.getLong(2) == (n0 % 17 + 2 + 1) / 2)
    val plan = df.select(VideoCodec.video_pixel_stats(
        VideoCodec.video_synth_avi(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"), plan)
  }

  test("SQL surface: registered video functions run end-to-end") {
    graft.GraftExtensions.register(spark)
    Seq((4L, "sql video")).toDF("doc_id", "text").createOrReplaceTempView("vdoc")
    val r = spark.sql(
      """SELECT video_meta(video_synth_avi(doc_id, text)).n_frames AS nf,
        |       video_pixel_stats(video_frame_sample(
        |         video_synth_avi(doc_id, text), 3)).n_frames AS ns
        |FROM vdoc""".stripMargin).collect().head
    val f = "sql video".getBytes("UTF-8").length % 17 + 2
    assert(r.getLong(0) == f && r.getLong(1) == (f + 2) / 3)
  }

  /** Analytic MJPEG sums mirroring the oracle rule: block-constant
    * planes, fixed-rounding YCbCr→RGB for color, raw gray samples. */
  private def mjpegSums(id: Long, w: Int, h: Int, nf: Int,
      tOf: Int => Int): (Long, Long, Long) = {
    val gray = java.lang.Math.floorMod(id, 2L) == 0L
    def clamp(v: Double): Long =
      math.max(0L, math.min(255L, math.floor(v + 0.5).toLong))
    var sr = 0L; var sg = 0L; var sb = 0L
    for (j <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val t = tOf(j); val bx = x / 8; val by = y / 8
      if (gray) {
        val gv = java.lang.Math.floorMod(bx * 7L + by * 11L + t * 19L + id, 256L)
        sr += gv; sg += gv; sb += gv
      } else {
        val yv = java.lang.Math.floorMod(bx * 5L + by * 7L + t * 17L + id, 256L).toDouble
        val cb = java.lang.Math.floorMod(bx * 3L + by * 13L + t * 5L + id * 2, 256L) - 128.0
        val cr = java.lang.Math.floorMod(bx * 11L + by * 3L + t * 7L + id * 3, 256L) - 128.0
        sr += clamp(yv + 1.402 * cr)
        sg += clamp(yv - 0.344136 * cb - 0.714136 * cr)
        sb += clamp(yv + 1.772 * cb)
      }
    }
    (sr, sg, sb)
  }

  test("MJPEG: synth → meta/stats runs the real JPEG decode per frame") {
    for ((id, text) <- Seq((0L, "mjpeg gray dri"), (1L, "mjpeg color clip"),
        (3L, "color with restarts!"), (6L, "gray dri again"), (-5L, "neg"))) {
      val u = UTF8String.fromString(text)
      val n = u.numBytes
      val (w, h, f) = (n % 39 + 8, n % 25 + 8, n % 5 + 2)
      val avi = VideoCodec.synthAviMjpeg(id, u)
      val m = meta(avi).get
      assert(m.getUTF8String(0).toString == "avi-mjpeg")
      assert(m.getInt(1) == w && m.getInt(2) == h && m.getLong(3) == f)
      val st = stats(avi).get
      assert(st.getInt(0) == w && st.getInt(1) == h && st.getLong(2) == f)
      val (sr, sg, sb) = mjpegSums(id, w, h, f, identity)
      assert((st.getLong(4), st.getLong(5), st.getLong(6)) == ((sr, sg, sb)),
        s"id=$id")
    }
  }

  test("MJPEG frame sampling copies JPEG bytes verbatim, never transcodes") {
    val u = UTF8String.fromString("sample mjpeg!")
    val id = 7L
    val n = u.numBytes
    val (w, h, f) = (n % 39 + 8, n % 25 + 8, n % 5 + 2)
    val avi = VideoCodec.synthAviMjpeg(id, u)
    val sampled = VideoCodec.frameSampleInternal(avi, 2)
    assert(sampled != null)
    val a = VideoCodec.parseAvi(sampled)
    assert(a.mjpeg && a.frameOffs.length == (f + 1) / 2)
    // byte-identical to the source frames 0, 2, 4…
    val src = VideoCodec.parseAvi(avi)
    for (j <- a.frameOffs.indices) {
      val want = java.util.Arrays.copyOfRange(src.bytes,
        src.frameOffs(j * 2), src.frameOffs(j * 2) + src.frameLens(j * 2))
      val got = java.util.Arrays.copyOfRange(a.bytes,
        a.frameOffs(j), a.frameOffs(j) + a.frameLens(j))
      assert(java.util.Arrays.equals(want, got), s"frame $j")
    }
    val st = stats(sampled).get
    val (sr, sg, sb) = mjpegSums(id, w, h, (f + 1) / 2, _ * 2)
    assert((st.getLong(4), st.getLong(5), st.getLong(6)) == ((sr, sg, sb)))
  }

  test("MJPEG malformed: non-JPEG chunk bytes or dim mismatch are null, not a throw") {
    val good = VideoCodec.synthAviMjpeg(1L, UTF8String.fromString("corrupt me"))
    val a = VideoCodec.parseAvi(good)
    // stomp the first frame's SOI marker: parse refuses the container
    val noSoi = good.clone(); noSoi(a.frameOffs(0)) = 0
    assert(meta(noSoi).isEmpty && stats(noSoi).isEmpty)
    // corrupt deep inside the first frame's entropy data: parse still
    // walks the container but the frame decode fails → stats null
    val badScan = good.clone()
    for (i <- a.frameOffs(0) + 20 until a.frameOffs(0) + a.frameLens(0) - 2)
      badScan(i) = 0x55
    assert(stats(badScan).isEmpty)
  }

  test("frame deltas: exact |change| per transition, static clip is zeros") {
    // 3 frames: constant 10, constant 10 (static), then +5 on every
    // channel of every pixel → deltas [0, 5*3*w*h]
    val w = 6; val h = 4
    val clip = VideoCodec.encodeAvi(w, h, 33333L, 3,
      (t, _, _) => if (t < 2) (10, 10, 10) else (15, 15, 15))
    val d = Option(VideoCodec.frameDeltasInternal(clip)).get
    assert(d.numElements() == 2)
    assert(d.getLong(0) == 0L)
    assert(d.getLong(1) == 5L * 3 * w * h)
  }

  test("frame deltas: MJPEG path decodes; single-frame is []; garbage null") {
    val mj = VideoCodec.synthAviMjpeg(2L, UTF8String.fromString("scene clip"))
    val d = Option(VideoCodec.frameDeltasInternal(mj)).get
    assert(d.numElements() >= 1) // nf = n%5+2 ≥ 2 → ≥ 1 transition
    val one = VideoCodec.encodeAvi(5, 4, 33333L, 1, (_, _, _) => (1, 2, 3))
    assert(Option(VideoCodec.frameDeltasInternal(one)).get.numElements() == 0)
    assert(VideoCodec.frameDeltasInternal("RIFFgarbage!".getBytes) == null)
    assert(VideoCodec.frameDeltasInternal(null) == null)
  }
}
