package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL video decode for multimodal binary columns: AVI (a RIFF form —
  * the same public container family as WAV) holding uncompressed 24bpp
  * DIB frames (`00db` chunks, bottom-up BGR rows padded to 4 bytes —
  * the BITMAPINFOHEADER pixel layout the BMP path already decodes).
  * Layout: `RIFF 'AVI ' { LIST 'hdrl' { avih, LIST 'strl' { strh,
  * strf } }, LIST 'movi' { 00db ... } }`; `avih` carries
  * µs-per-frame / total frames / dimensions. All byte layouts are
  * public (Microsoft AVI RIFF form, OpenDML); no media library
  * involved. Native Catalyst expressions — a 100 TB scan decodes
  * inside whole-stage codegen as a pure projection.
  *
  * Frame sampling (`video_frame_sample`) is REAL decimation: it keeps
  * frames 0, k, 2k, … and re-emits a valid, decodable AVI — the core
  * video op of a training-data pipeline. Malformed input returns null
  * everywhere (wrong magic, truncated chunks, a frame chunk whose
  * length is not one full DIB, non-24bpp streams).
  */
case class VideoMeta(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = VideoCodec.metaSchema
  override def prettyName: String = "video_meta"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VideoCodec.metaInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoCodec.metaInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

/** Exact integer channel sums over EVERY pixel of EVERY frame — null
  * (never a crash) for malformed or unsupported bytes. */
case class VideoPixelStats(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = VideoCodec.statsSchema
  override def prettyName: String = "video_pixel_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VideoCodec.statsInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoCodec.statsInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoPixelStats =
    copy(child = newChild)
}

/** Per-transition pixel deltas of an AVI clip (array element t−1 =
  * Σ |frame t − frame t−1| over all pixels and channels) — see
  * [[VideoCodec.frameDeltasInternal]]. The decode half of scene-cut
  * detection; the thresholding half stays relational. */
case class VideoFrameDeltas(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "video_frame_deltas"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VideoCodec.frameDeltasInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoCodec.frameDeltasInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoFrameDeltas =
    copy(child = newChild)
}

/** `(avi, k) → avi` keeping frames 0, k, 2k, … — real video frame
  * sampling that re-emits a valid AVI (µs-per-frame unchanged: pure
  * decimation; total-frames patched). */
case class VideoFrameSample(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "video_frame_sample"
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, k: Any): Any =
    VideoCodec.frameSampleInternal(bytes.asInstanceOf[Array[Byte]],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = graft.functions.VideoCodec.frameSampleInternal($b, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VideoFrameSample =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real AVI bytes` — deterministic synthesizer:
  * dims/frame count from the text's byte length, frame period from the
  * id, and pixel (x, y, frame t) channel values fixed affine functions
  * mod 256 — so an external SQL oracle recomputes the decoded sums
  * without parsing a byte. */
case class VideoSynthAvi(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "video_synth_avi"

  override def nullSafeEval(id: Any, text: Any): Any =
    VideoCodec.synthAvi(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.VideoCodec.synthAvi($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VideoSynthAvi =
    copy(left = newLeft, right = newRight)
}

/** [[VideoSynthAvi]]'s deterministic contract over the MJPEG layout:
  * every `00dc` chunk a real baseline JPEG ([[JpegCodec.encode]]),
  * block-constant so the lossy transform round-trips exactly. */
case class VideoSynthMjpeg(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "video_synth_mjpeg"

  override def nullSafeEval(id: Any, text: Any): Any =
    VideoCodec.synthAviMjpeg(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.VideoCodec.synthAviMjpeg($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VideoSynthMjpeg =
    copy(left = newLeft, right = newRight)
}

object VideoCodec {
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),       // "avi"
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", LongType),
    StructField("us_per_frame", LongType),
    StructField("duration_us", LongType)))   // n_frames * us_per_frame

  val statsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", LongType),
    StructField("n_px", LongType),           // width * height * n_frames
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  private val MAX_BYTES = 1 << 28

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "ASCII")

  /** Parsed AVI: `frameOffs(t)`/`frameLens(t)` locate frame t's data —
    * for DIB a bottom-up BGR pixel array (`stride` bytes per row), for
    * MJPEG (`mjpeg = true`) a complete baseline JPEG. */
  final class Avi(val bytes: Array[Byte], val width: Int, val height: Int,
      val usPerFrame: Long, val frameOffs: Array[Int],
      val frameLens: Array[Int], val stride: Int, val mjpeg: Boolean)

  /** RIFF walk: top-level chunks; `LIST/hdrl` must contain `avih`
    * (µs-per-frame, frame count, dims) and is required before
    * `LIST/movi`. The nested `LIST/strl` stream header selects the
    * codec: fccHandler `MJPG` → each `00dc` child is one complete
    * baseline JPEG (variable length, SOI-checked); otherwise each
    * `00db`/`00dc` child must be EXACTLY one uncompressed 24bpp DIB
    * (stride·height bytes). Unknown chunks — `idx1`, `JUNK` — are
    * skipped by length with the RIFF even-byte pad rule. Null on
    * anything malformed. */
  def parseAvi(b: Array[Byte]): Avi = {
    if (b == null || b.length < 12 + 8 + 56) return null
    if (b.length > MAX_BYTES) return null
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return null
    var i = 12
    var width = -1; var height = -1; var usPerFrame = -1L; var declared = -1L
    var frames: scala.collection.mutable.ArrayBuffer[Int] = null
    var lens: scala.collection.mutable.ArrayBuffer[Int] = null
    var stride = -1
    var mjpeg = false
    while (i + 8 <= b.length) {
      val t = tag(b, i)
      val len = leU32(b, i + 4)
      if (len < 0 || len > MAX_BYTES || i + 8 + len > b.length) return null
      if (t == "LIST" && len >= 4) {
        val form = tag(b, i + 8)
        if (form == "hdrl") {
          // scan the list's children for avih and the first video strl
          var j = i + 12
          val end = i + 8 + len.toInt
          while (j + 8 <= end) {
            val ct = tag(b, j)
            val cl = leU32(b, j + 4)
            if (cl < 0 || j + 8 + cl > end) return null
            if (ct == "avih" && width < 0) {
              if (cl < 40) return null
              usPerFrame = leU32(b, j + 8)
              declared = leU32(b, j + 24)
              width = leU32(b, j + 40).toInt
              height = leU32(b, j + 44).toInt
              if (width <= 0 || height <= 0 || width > (1 << 14) ||
                height > (1 << 14) || usPerFrame <= 0) return null
              stride = (width * 3 + 3) & ~3
            } else if (ct == "LIST" && cl >= 4 && tag(b, j + 8) == "strl") {
              // strh: fccType (4) then fccHandler (4)
              var k = j + 12
              val lend = j + 8 + cl.toInt
              while (k + 8 <= lend) {
                val st = tag(b, k)
                val sl = leU32(b, k + 4)
                if (sl < 0 || k + 8 + sl > lend) return null
                if (st == "strh" && sl >= 8 && tag(b, k + 8) == "vids" &&
                  tag(b, k + 12) == "MJPG") mjpeg = true
                k += 8 + sl.toInt + (sl.toInt & 1)
              }
            }
            j += 8 + cl.toInt + (cl.toInt & 1)
          }
          if (width < 0) return null // hdrl without avih
        } else if (form == "movi") {
          if (width < 0) return null // movi before hdrl
          frames = new scala.collection.mutable.ArrayBuffer[Int]
          lens = new scala.collection.mutable.ArrayBuffer[Int]
          var j = i + 12
          val end = i + 8 + len.toInt
          while (j + 8 <= end) {
            val ct = tag(b, j)
            val cl = leU32(b, j + 4)
            if (cl < 0 || j + 8 + cl > end) return null
            if (ct == "00db" || ct == "00dc") {
              if (mjpeg) {
                // variable-length JPEG; demand at least the SOI marker
                if (cl < 4 || (b(j + 8) & 0xFF) != 0xFF ||
                  (b(j + 9) & 0xFF) != 0xD8) return null
              } else if (cl != stride.toLong * height) return null
              frames += j + 8
              lens += cl.toInt
            } // rec lists / audio chunks etc.: skip
            j += 8 + cl.toInt + (cl.toInt & 1)
          }
        }
      }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (frames == null) return null
    // a wrong declared count is corruption, not a preference: refuse
    if (declared >= 0 && declared != frames.length) return null
    new Avi(b, width, height, usPerFrame, frames.toArray, lens.toArray,
      stride, mjpeg)
  }

  def metaInternal(b: Array[Byte]): InternalRow = {
    val a = parseAvi(b)
    if (a == null) return null
    val n = a.frameOffs.length.toLong
    InternalRow(UTF8String.fromString(if (a.mjpeg) "avi-mjpeg" else "avi"),
      a.width, a.height, n, a.usPerFrame, n * a.usPerFrame)
  }

  /** Exact integer channel sums over all frames: DIB frames walk the
    * bottom-up BGR rows, MJPEG frames run the full baseline JPEG
    * entropy decode ([[JpegCodec.decodePixels]]; gray decodes add the
    * sample to all three sums, matching the image-stats contract).
    * A frame whose decode fails or whose dims disagree with `avih`
    * makes the whole cell null — corruption, not a preference. */
  def statsInternal(b: Array[Byte]): InternalRow = {
    val a = parseAvi(b)
    if (a == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var t = 0
    while (t < a.frameOffs.length) {
      if (a.mjpeg) {
        val img = JpegCodec.decodePixels(java.util.Arrays.copyOfRange(
          a.bytes, a.frameOffs(t), a.frameOffs(t) + a.frameLens(t)))
        if (img == null || img.width != a.width || img.height != a.height)
          return null
        var i = 0
        if (img.channels == 1) {
          while (i < img.samples.length) {
            val v = img.samples(i) & 0xFF
            sr += v; sg += v; sb += v; i += 1
          }
        } else {
          while (i < img.samples.length) {
            sr += img.samples(i) & 0xFF
            sg += img.samples(i + 1) & 0xFF
            sb += img.samples(i + 2) & 0xFF
            i += 3
          }
        }
      } else {
        val base = a.frameOffs(t)
        var row = 0
        while (row < a.height) {
          var off = base + row * a.stride
          var x = 0
          while (x < a.width) {
            sb += a.bytes(off) & 0xFF
            sg += a.bytes(off + 1) & 0xFF
            sr += a.bytes(off + 2) & 0xFF
            off += 3
            x += 1
          }
          row += 1
        }
      }
      t += 1
    }
    val n = a.frameOffs.length.toLong
    InternalRow(a.width, a.height, n, a.width.toLong * a.height * n, sr, sg, sb)
  }

  /** Per-transition pixel deltas — the SCENE-CHANGE signal: element
    * t−1 is Σ over pixels and channels of |frame t − frame t−1|, an
    * exact integer. Thresholding (fixed, relative-to-mean, top-k) is
    * left RELATIONAL — explode the array and filter — so one decode
    * pass serves every cut-detection policy. DIB frames diff in place
    * inside the shared buffer; MJPEG frames decode one at a time with
    * only the previous frame's samples held. Null on malformed bytes
    * or a frame-size mismatch; a single-frame clip yields []. */
  def frameDeltasInternal(b: Array[Byte]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val a = parseAvi(b)
    if (a == null) return null
    val nf = a.frameOffs.length
    if (nf < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nf - 1)
    if (a.mjpeg) {
      var prev: Array[Byte] = null
      var prevCh = 0
      var t = 0
      while (t < nf) {
        val img = JpegCodec.decodePixels(java.util.Arrays.copyOfRange(
          a.bytes, a.frameOffs(t), a.frameOffs(t) + a.frameLens(t)))
        if (img == null || img.width != a.width || img.height != a.height)
          return null
        if (t > 0) {
          if (img.channels != prevCh) return null
          var d = 0L
          var i = 0
          // gray frames count the single channel THREE times, matching
          // the DIB path's r+g+b accounting
          val mult = if (img.channels == 1) 3 else 1
          while (i < img.samples.length) {
            d += mult * math.abs((img.samples(i) & 0xFF) - (prev(i) & 0xFF))
            i += 1
          }
          out(t - 1) = d
        }
        prev = img.samples
        prevCh = img.channels
        t += 1
      }
    } else {
      var t = 1
      while (t < nf) {
        val basePrev = a.frameOffs(t - 1)
        val baseCur = a.frameOffs(t)
        var d = 0L
        var row = 0
        while (row < a.height) {
          var op = basePrev + row * a.stride
          var oc = baseCur + row * a.stride
          var x = 0
          while (x < a.width * 3) {
            d += math.abs((a.bytes(oc) & 0xFF) - (a.bytes(op) & 0xFF))
            op += 1; oc += 1; x += 1
          }
          row += 1
        }
        out(t - 1) = d
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def chunk(t: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val out = java.nio.ByteBuffer.allocate(8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(t.getBytes("ASCII")).putInt(data.length).put(data)
    out.array()
  }

  private def list(form: String, children: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + children.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("LIST".getBytes("ASCII")).putInt(4 + children.length)
      .put(form.getBytes("ASCII")).put(children)
    out.array()
  }

  /** Canonical AVI writer: hdrl (avih + one vids/DIB strl), movi of
    * `00db` frames. `frame(t, x, y)` returns logical top-down (r, g, b)
    * for frame t; rows are stored bottom-up per DIB convention. */
  def encodeAvi(width: Int, height: Int, usPerFrame: Long, nFrames: Int,
      frame: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (width * 3 + 3) & ~3
    val frameLen = stride * height
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame.toInt).putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameLen)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("ASCII")).put("DIB ".getBytes("ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame.toInt).putInt(1000000) // scale/rate: rate/scale = fps
      .putInt(0).putInt(nFrames).putInt(frameLen).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameLen).putInt(2835).putInt(2835).putInt(0).putInt(0)

    val strl = list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array()))
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++ strl)
    val movi = {
      val buf = java.nio.ByteBuffer.allocate(nFrames * (8 + frameLen))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var t = 0
      while (t < nFrames) {
        buf.put("00db".getBytes("ASCII")).putInt(frameLen)
        var row = height - 1 // stored bottom-up
        while (row >= 0) {
          var x = 0
          while (x < width) {
            val (r, g, bl) = frame(t, x, row)
            buf.put(bl.toByte).put(g.toByte).put(r.toByte)
            x += 1
          }
          var pad = stride - width * 3
          while (pad > 0) { buf.put(0.toByte); pad -= 1 }
          row -= 1
        }
        t += 1
      }
      list("movi", buf.array())
    }
    val body = hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("ASCII")).put(body)
    out.array()
  }

  /** MJPEG AVI writer: same RIFF skeleton as [[encodeAvi]] but with
    * fccHandler/biCompression `MJPG` and each `00dc` chunk carrying
    * one complete pre-encoded JPEG verbatim — frames are stored
    * compressed, so re-emitting never transcodes. */
  def encodeAviMjpeg(width: Int, height: Int, usPerFrame: Long,
      frames: Array[Array[Byte]]): Array[Byte] = {
    val maxLen = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame.toInt).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(maxLen)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("ASCII")).put("MJPG".getBytes("ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame.toInt).putInt(1000000)
      .putInt(0).putInt(frames.length).putInt(maxLen).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put("MJPG".getBytes("ASCII")).putInt(maxLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val strl = list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array()))
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++ strl)
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("ASCII")).put(body)
    out.array()
  }

  /** Frames 0, k, 2k, … re-encoded as a valid AVI. µs-per-frame is
    * left unchanged — pure decimation (the sampled clip plays k×
    * faster), which is the training-data semantic: keep every k-th
    * frame as an independent sample. MJPEG frames are copied verbatim
    * (no decode, no re-encode — sampling a 100 TB MJPEG corpus moves
    * bytes, not pixels); DIB frames are copied pixel-wise. */
  def frameSampleInternal(b: Array[Byte], k: Int): Array[Byte] = {
    if (k < 1) return null
    val a = parseAvi(b)
    if (a == null) return null
    val n = a.frameOffs.length
    val outN = (n + k - 1) / k
    if (a.mjpeg)
      return encodeAviMjpeg(a.width, a.height, a.usPerFrame,
        Array.tabulate(outN)(t => java.util.Arrays.copyOfRange(a.bytes,
          a.frameOffs(t * k), a.frameOffs(t * k) + a.frameLens(t * k))))
    encodeAvi(a.width, a.height, a.usPerFrame, outN, (t, x, y) => {
      val src = a.frameOffs(t * k) + (a.height - 1 - y) * a.stride + x * 3
      ((a.bytes(src + 2) & 0xFF), (a.bytes(src + 1) & 0xFF), (a.bytes(src) & 0xFF))
    })
  }

  private val PERIODS = Array(33333L, 40000L, 16667L, 20000L)

  /** The deterministic synth rule the `mm_video_*` oracles mirror:
    * w = n%21+4, h = n%13+3, frames = n%17+2 (n = byte length of the
    * text), µs-per-frame cycles 30/25/60/50 fps by id mod 4, and frame
    * t's pixel (x, y) channels are the BMP gradient extended with a
    * frame term: r = floorMod(x·13 + y·17 + t·19 + id·3, 256),
    * g = floorMod(x·7 + y·11 + t·23 + id·2, 256),
    * b = floorMod(x·3 + y·5 + t·29 + id, 256). */
  def synthAvi(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 21 + 4
    val h = n % 13 + 3
    val nf = n % 17 + 2
    val us = PERIODS(java.lang.Math.floorMod(id, 4L).toInt)
    encodeAvi(w, h, us, nf, (t, x, y) => (
      java.lang.Math.floorMod(x * 13L + y * 17L + t * 19L + id * 3, 256L).toInt,
      java.lang.Math.floorMod(x * 7L + y * 11L + t * 23L + id * 2, 256L).toInt,
      java.lang.Math.floorMod(x * 3L + y * 5L + t * 29L + id, 256L).toInt))
  }

  /** Deterministic MJPEG AVI the `mm_mjpeg_*` oracles mirror: dims
    * reuse the still-JPEG rule (w = n%39+8, h = n%25+8), nf = n%5+2
    * frames, µs-per-frame cycles by id mod 4, gray when id is even,
    * restart markers when id%3==0. Frame t's 8×8-block-constant plane
    * values extend the still rule with a frame term:
    * gray `floorMod(bx·7 + by·11 + t·19 + id, 256)`; color
    * Y `floorMod(bx·5 + by·7 + t·17 + id, 256)`,
    * Cb `floorMod(bx·3 + by·13 + t·5 + id·2, 256)`,
    * Cr `floorMod(bx·11 + by·3 + t·7 + id·3, 256)` — block-constant,
    * so the lossy transform round-trips exactly and the oracle's
    * fixed-rounding YCbCr→RGB composes in SQL. */
  def synthAviMjpeg(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 39 + 8
    val h = n % 25 + 8
    val nf = n % 5 + 2
    val us = PERIODS(java.lang.Math.floorMod(id, 4L).toInt)
    val gray = java.lang.Math.floorMod(id, 2L) == 0L
    val dri = if (java.lang.Math.floorMod(id, 3L) == 0L) 2 else 0
    def plane(t: Int, a: Long, bc: Long, tc: Long, coff: Long): Array[Int] =
      Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        java.lang.Math.floorMod(bx * a + by * bc + t * tc + id * coff,
          256L).toInt
      }
    val frames = Array.tabulate(nf) { t =>
      val planes =
        if (gray) Array(plane(t, 7, 11, 19, 1))
        else Array(plane(t, 5, 7, 17, 1), plane(t, 3, 13, 5, 2),
          plane(t, 11, 3, 7, 3))
      JpegCodec.encode(w, h, planes, dri)
    }
    encodeAviMjpeg(w, h, us, frames)
  }

  def video_meta(c: Column): Column =
    GraftSqlBridge.column(VideoMeta(GraftSqlBridge.expression(c)))

  def video_frame_deltas(c: Column): Column =
    GraftSqlBridge.column(VideoFrameDeltas(GraftSqlBridge.expression(c)))

  def video_pixel_stats(c: Column): Column =
    GraftSqlBridge.column(VideoPixelStats(GraftSqlBridge.expression(c)))

  def video_frame_sample(c: Column, k: Column): Column =
    GraftSqlBridge.column(VideoFrameSample(
      GraftSqlBridge.expression(c), GraftSqlBridge.expression(k)))

  def video_synth_avi(id: Column, text: Column): Column =
    GraftSqlBridge.column(VideoSynthAvi(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def video_synth_mjpeg(id: Column, text: Column): Column =
    GraftSqlBridge.column(VideoSynthMjpeg(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))
}
