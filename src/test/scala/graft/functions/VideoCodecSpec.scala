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
}
