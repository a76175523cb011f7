package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio decode for multimodal binary columns: RIFF/WAVE 16-bit
  * PCM (the canonical public byte layout — "RIFF" size "WAVE", a
  * `fmt ` chunk with format/channels/rate, a `data` chunk with
  * interleaved little-endian i16 frames; unknown chunks skipped by
  * length with the RIFF even-byte pad rule honored). No audio library
  * involved. Native Catalyst expressions, so a 100 TB scan decodes
  * inside whole-stage codegen as a pure projection — no Exchange, no
  * RDD boundary.
  *
  * Malformed input returns null (wrong magic, truncated chunks, a data
  * chunk shorter than its declared size, non-PCM encodings) — decoder
  * robustness is the common case in crawled training data, and a task
  * crash on one bad payload is the wrong failure mode at scale.
  */
case class AudioMeta(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = AudioCodec.metaSchema
  override def prettyName: String = "audio_meta"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioCodec.metaInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioCodec.metaInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

/** Exact integer per-channel sums + peak over decoded PCM frames —
  * null (never a crash) for malformed or unsupported bytes. */
case class AudioPcmStats(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = AudioCodec.statsSchema
  override def prettyName: String = "audio_pcm_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioCodec.statsInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioCodec.statsInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioPcmStats =
    copy(child = newChild)
}

/** 64-bit perceptual ENERGY fingerprint of a clip — the audio member
  * of the near-dup hash family ([[graft.functions.ImageDhash]] is the
  * image one): per-frame summed |amplitude| across channels is
  * average-pooled into 65 time blocks (frame f → block f·65/n), and
  * bit b = 1 iff block b is quieter than block b+1 — the loudness
  * CONTOUR, which survives level shifts and re-encoding while
  * distinguishing different material. Comparisons cross-multiply
  * integer sums (128-bit via multiplyHigh, no division, no floats) →
  * engine-portable. Works on every [[AudioCodec.parseWav]] format
  * (PCM 8/16/24, float32, G.711); ADPCM, clips under 65 frames, and
  * malformed bytes → null. */
case class AudioFingerprint(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "audio_fingerprint"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioCodec.fingerprintInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fp = ctx.freshName("afp")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $fp = graft.functions.AudioCodec.fingerprintInternal($c);
      ${ev.isNull} = $fp == null;
      ${ev.value} = $fp == null ? -1L : $fp.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
    copy(child = newChild)
}

/** `(wav, k) → wav` keeping every k-th frame (frames 0, k, 2k, …) —
  * the audio analog of video frame sampling: a real decimation that
  * re-emits a valid, decodable WAV at the same sample rate. */
case class AudioFrameSample(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "audio_frame_sample"
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, k: Any): Any =
    AudioCodec.frameSampleInternal(bytes.asInstanceOf[Array[Byte]],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = graft.functions.AudioCodec.frameSampleInternal($b, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioFrameSample =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real G.711 μ-law/A-law WAV bytes` — the
  * companded-telephony twin of [[AudioSynthWav]]: 8-bit code bytes
  * affine in the inputs, expanded to linear by the decoder's CCITT
  * integer formulas, which a SQL oracle reproduces exactly. */
case class AudioSynthG711(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "audio_synth_g711"

  override def nullSafeEval(id: Any, text: Any): Any =
    AudioCodec.synthWavG711(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.AudioCodec.synthWavG711($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioSynthG711 =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real RIFF/WAVE bytes` — deterministic
  * synthesizer for oracle-checked round-trips: frame count from the
  * text's byte length, channel count / sample rate from the id, and
  * sample value for (frame i, channel c) a fixed affine function mod
  * 2^16 shifted to signed — so an external SQL oracle recomputes the
  * decoded sums without parsing a byte. */
case class AudioSynthWav(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "audio_synth_wav"

  override def nullSafeEval(id: Any, text: Any): Any =
    AudioCodec.synthWav(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.AudioCodec.synthWav($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioSynthWav =
    copy(left = newLeft, right = newRight)
}

/** Wider PCM matrix: 8-bit / 24-bit / IEEE-float32 WAV per
  * [[AudioCodec.synthWavDeep]]'s deterministic rule. */
case class AudioSynthDeep(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "audio_synth_deep"

  override def nullSafeEval(id: Any, text: Any): Any =
    AudioCodec.synthWavDeep(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.AudioCodec.synthWavDeep($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioSynthDeep =
    copy(left = newLeft, right = newRight)
}

/** Mono IMA ADPCM WAV per [[AudioCodec.synthWavAdpcm]]'s rule. */
case class AudioSynthAdpcm(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "audio_synth_adpcm"

  override def nullSafeEval(id: Any, text: Any): Any =
    AudioCodec.synthWavAdpcm(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.AudioCodec.synthWavAdpcm($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioSynthAdpcm =
    copy(left = newLeft, right = newRight)
}

object AudioCodec {
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),       // "pcm16"
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_us", LongType)))   // n_frames * 1e6 / rate, floor

  val statsSchema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("sum_l", LongType),
    StructField("sum_r", LongType),          // null for mono
    StructField("peak", IntegerType)))       // max |sample| over all channels

  /** Decode bound: refuse data chunks above 256 MiB so a forged header
    * can't balloon a task. */
  private val MAX_DATA = 1 << 28

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def leI16(b: Array[Byte], i: Int): Int =
    (leU16(b, i) << 16) >> 16 // sign-extend

  private def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "ASCII")

  /** Parsed WAV: `dataOff` starts `nFrames` interleaved frames of
    * `channels × bytesPerSample` bytes. `format` is the fmt-chunk
    * code: 1 = integer PCM (8-bit unsigned / 16-bit / 24-bit signed
    * LE), 3 = IEEE float32, 6 = G.711 A-law, 7 = G.711 μ-law (both
    * 8-bit companded) — all expanded to a LINEAR integer by
    * [[sampleAt]]. Float samples map through the fixed-rounding rule
    * `floor(v·32767 + 0.5)` (clamped, non-finite → 0) so float stats
    * stay exact integers an SQL oracle recomputes. */
  final class Wav(val bytes: Array[Byte], val format: Int, val bits: Int,
      val channels: Int, val sampleRate: Int, val nFrames: Long,
      val dataOff: Int, val blockAlign: Int = 0,
      val samplesPerBlock: Int = 0) {
    val bytesPerSample: Int = bits / 8
    /** Linear sample value of (frame f, channel c). */
    def sampleAt(f: Int, c: Int): Int = {
      val off = dataOff + (f * channels + c) * bytesPerSample
      format match {
        case 1 => bits match {
          case 16 => leI16(bytes, off)
          case 8 => (bytes(off) & 0xFF) - 128 // excess-128 convention
          case _ => // 24-bit signed little-endian
            (((bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
              ((bytes(off + 2) & 0xFF) << 16)) << 8) >> 8
        }
        case 3 =>
          val v = java.lang.Float.intBitsToFloat(leU32(bytes, off).toInt)
          if (!java.lang.Float.isFinite(v)) 0
          else {
            val d = math.floor(v.toDouble * 32767.0 + 0.5)
            if (d > 65536.0) 65536 else if (d < -65536.0) -65536 else d.toInt
          }
        case 7 => AudioCodec.ulawToLinear(bytes(off) & 0xFF)
        case _ => AudioCodec.alawToLinear(bytes(off) & 0xFF)
      }
    }
  }

  /** G.711 μ-law expansion (CCITT reference form — BIAS 0x84):
    * deterministic integer math an SQL oracle mirrors directly. */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (CCITT reference form — XOR 0x55 mask). */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0F) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** RIFF walk: "RIFF" u32size "WAVE", then `tag u32len payload`
    * chunks, each padded to even length. `fmt ` must precede `data`;
    * accepted encodings: format 1 (integer PCM) at 8/16/24 bits,
    * format 3 (IEEE float) at 32 bits, formats 7/6 (G.711 μ-law/A-law)
    * at 8 bits. Returns null on anything malformed — truncated chunks,
    * a data length that overruns the buffer, zero channels, a data
    * size that is not a whole number of frames. */
  def parseWav(b: Array[Byte]): Wav = {
    if (b == null || b.length < 44) return null
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var format = -1
    var blockAlign = -1; var spb = -1
    while (i + 8 <= b.length) {
      val t = tag(b, i)
      val len = leU32(b, i + 4)
      if (len < 0 || len > MAX_DATA || i + 8 + len > b.length) return null
      if (t == "fmt ") {
        if (len < 16) return null
        format = leU16(b, i + 8)
        channels = leU16(b, i + 10)
        rate = leU32(b, i + 12).toInt
        blockAlign = leU16(b, i + 20)
        bits = leU16(b, i + 22)
        val ok = (format == 1 && (bits == 8 || bits == 16 || bits == 24)) ||
          (format == 3 && bits == 32) ||
          ((format == 6 || format == 7) && bits == 8) ||
          (format == 17 && bits == 4)
        if (!ok || channels < 1 || channels > 64 || rate <= 0) return null
        if (format == 17) {
          // IMA ADPCM (MONO — the speech-corpus norm): the fmt
          // extension carries samplesPerBlock, which must agree with
          // the block geometry (4-byte header + 2 nibbles/byte + the
          // header sample itself)
          if (channels != 1 || len < 20 || blockAlign < 5) return null
          spb = leU16(b, i + 26)
          if (spb != (blockAlign - 4) * 2 + 1) return null
        }
      } else if (t == "data") {
        if (channels < 0) return null // fmt must come first
        if (format == 17) {
          if (len % blockAlign != 0) return null
          return new Wav(b, format, bits, channels, rate,
            (len / blockAlign) * spb, i + 8, blockAlign, spb)
        }
        val ba = channels * (bits / 8)
        if (len % ba != 0) return null
        return new Wav(b, format, bits, channels, rate, len / ba, i + 8)
      }
      i += 8 + len.toInt + (len.toInt & 1) // RIFF chunks pad to even
    }
    null
  }

  def metaInternal(b: Array[Byte]): InternalRow = {
    val w = parseWav(b)
    if (w == null) return null
    val fmt = w.format match {
      case 1 => s"pcm${w.bits}"; case 3 => "float32"; case 17 => "adpcm"
      case 7 => "ulaw"; case _ => "alaw"
    }
    InternalRow(UTF8String.fromString(fmt), w.channels, w.sampleRate,
      w.nFrames, w.nFrames * 1000000L / w.sampleRate)
  }

  /** Exact integer sums of the first two channels (sum_r null for
    * mono) + max absolute sample over ALL channels. Channel counts
    * above 2 still decode (peak covers every channel) — the sums just
    * describe the stereo image. */
  def statsInternal(b: Array[Byte]): InternalRow = {
    val w = parseWav(b)
    if (w == null) return null
    if (w.format == 17) {
      // sequential-stateful: no random access, one pass over blocks
      val samples = decodeAdpcmMono(w)
      var sumL = 0L; var peak = 0
      var i = 0
      while (i < samples.length) {
        sumL += samples(i)
        if (math.abs(samples(i)) > peak) peak = math.abs(samples(i))
        i += 1
      }
      return InternalRow(1, w.sampleRate, w.nFrames, sumL, null, peak)
    }
    var sumL = 0L; var sumR = 0L; var peak = 0
    val ch = w.channels
    var f = 0
    while (f < w.nFrames) {
      val l = w.sampleAt(f, 0)
      sumL += l
      if (math.abs(l) > peak) peak = math.abs(l)
      if (ch > 1) {
        val r = w.sampleAt(f, 1)
        sumR += r
        if (math.abs(r) > peak) peak = math.abs(r)
      }
      var c = 2
      while (c < ch) {
        val v = math.abs(w.sampleAt(f, c))
        if (v > peak) peak = v
        c += 1
      }
      f += 1
    }
    InternalRow(ch, w.sampleRate, w.nFrames, sumL,
      if (ch > 1) sumR else null, peak)
  }

  /** IMA/DVI ADPCM step-size table (the public 89-entry table from the
    * IMA Digital Audio Pack recommendation). */
  val AdpcmSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble (sign bit ignored): −1 for magnitudes
    * 0–3, then +2/+4/+6/+8. */
  def adpcmIndexDelta(nibble: Int): Int = {
    val m = nibble & 7
    if (m < 4) -1 else (m - 3) * 2
  }

  /** One IMA ADPCM step: given state (pred, idx) and a nibble, the new
    * (pred, idx). Public reference recurrence — diff accumulates
    * step/8 + conditional step/4, step/2, step; sign bit subtracts. */
  def adpcmStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = AdpcmSteps(idx)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + adpcmIndexDelta(nibble)))
    (p, i)
  }

  /** All samples of a mono IMA ADPCM stream, block by block: each
    * block's 4-byte header carries the initial predictor (itself
    * sample 0 of the block) and step index; nibbles follow low-first
    * two per byte. */
  def decodeAdpcmMono(w: Wav): Array[Int] = {
    val nBlocks = (w.nFrames / w.samplesPerBlock).toInt
    val out = new Array[Int](w.nFrames.toInt)
    var o = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = w.dataOff + blk * w.blockAlign
      var pred = leI16(w.bytes, base)
      var idx = math.max(0, math.min(88, w.bytes(base + 2) & 0xFF))
      out(o) = pred; o += 1
      var j = 4
      while (j < w.blockAlign) {
        val byte = w.bytes(base + j) & 0xFF
        val (p1, i1) = adpcmStep(pred, idx, byte & 0x0F)
        out(o) = p1; o += 1
        val (p2, i2) = adpcmStep(p1, i1, byte >> 4)
        out(o) = p2; o += 1
        pred = p2; idx = i2
        j += 1
      }
      blk += 1
    }
    out
  }

  /** Canonical 44-byte-header WAV writer (fmt before data, even data
    * length by construction at 16 bits). */
  def encodeWav(channels: Int, rate: Int, frames: Array[Short]): Array[Byte] = {
    require(channels >= 1 && frames.length % channels == 0)
    val data = new Array[Byte](frames.length * 2)
    var i = 0
    while (i < frames.length) {
      data(i * 2) = frames(i).toByte
      data(i * 2 + 1) = (frames(i) >> 8).toByte
      i += 1
    }
    encodeWavBytes(1, 16, channels, rate, data)
  }

  /** General WAV writer over raw sample bytes: format 1 (PCM) or 6/7
    * (G.711 A-law/μ-law, one byte per sample). Odd data lengths get
    * the RIFF pad byte. */
  def encodeWavBytes(format: Int, bitsPerSample: Int, channels: Int,
      rate: Int, data: Array[Byte]): Array[Byte] = {
    val bps = bitsPerSample / 8
    val blockAlign = channels * bps
    require(data.length % blockAlign == 0, "partial frame")
    val pad = data.length & 1
    val out = java.nio.ByteBuffer.allocate(44 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(36 + data.length + pad)
      .put("WAVE".getBytes("ASCII"))
    out.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(format.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    out.put("data".getBytes("ASCII")).putInt(data.length).put(data)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  /** Every k-th frame (0, k, 2k, …) re-encoded as a valid WAV at the
    * SAME sample rate and the SAME encoding (PCM16 stays PCM16, G.711
    * stays companded — raw frame bytes are copied, never re-encoded) —
    * decimation without filtering, the exact analog of sampling every
    * k-th video frame. Null for k < 1 or bytes the parser refuses. */
  def frameSampleInternal(b: Array[Byte], k: Int): Array[Byte] = {
    if (k < 1) return null
    val w = parseWav(b)
    if (w == null) return null
    if (w.format == 17) {
      // a stateful companded stream can't copy raw frames: decimating
      // ADPCM decodes once and emits linear PCM16 (documented semantic)
      val samples = decodeAdpcmMono(w)
      val outN = (samples.length + k - 1) / k
      val frames = new Array[Short](outN)
      var i = 0
      while (i < outN) { frames(i) = samples(i * k).toShort; i += 1 }
      return encodeWav(1, w.sampleRate, frames)
    }
    val outFrames = ((w.nFrames + k - 1) / k).toInt
    val blockAlign = w.channels * w.bytesPerSample
    val data = new Array[Byte](outFrames * blockAlign)
    var f = 0
    while (f < outFrames) {
      System.arraycopy(w.bytes, w.dataOff + f * k * blockAlign,
        data, f * blockAlign, blockAlign)
      f += 1
    }
    encodeWavBytes(w.format, w.bytesPerSample * 8, w.channels,
      w.sampleRate, data)
  }

  private val RATES = Array(8000, 16000, 22050, 44100)

  /** The G.711 synth rule the `mm_audio_g711` oracle mirrors: frames
    * from the text length, companded CODE bytes affine mod 256 (the
    * oracle expands them with the same CCITT integer formulas), μ-law
    * on even ids / A-law on odd, mono for id%4 in {0,1} / stereo in
    * {2,3}. Odd byte counts exercise the RIFF data pad. */
  def synthWavG711(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val nf = n % 241 + 20
    val m4 = java.lang.Math.floorMod(id, 4L).toInt
    val ch = m4 / 2 + 1
    val rate = RATES(m4)
    val format = if (java.lang.Math.floorMod(id, 2L) == 0L) 7 else 6
    val data = new Array[Byte](nf * ch)
    var i = 0
    while (i < nf) {
      var c = 0
      while (c < ch) {
        data(i * ch + c) = java.lang.Math.floorMod(
          i.toLong * (7 + 2 * c) + id * (3 + c), 256L).toByte
        c += 1
      }
      i += 1
    }
    encodeWavBytes(format, 8, ch, rate, data)
  }

  /** The deterministic synth rule the `mm_audio_*` oracles mirror:
    * frames = n % 241 + 20 (n = byte length of the text), channels =
    * id mod 2 + 1, rate cycles 8000/16000/22050/44100 by id mod 4, and
    * sample (i, c) = floorMod(i·(7+2c) + id·(3+c), 65536) − 32768. A
    * LIST chunk with an ODD payload precedes fmt/data so the RIFF
    * pad-to-even skip stays production-exercised. */
  def synthWav(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val nf = n % 241 + 20
    val ch = java.lang.Math.floorMod(id, 2L).toInt + 1
    val rate = RATES(java.lang.Math.floorMod(id, 4L).toInt)
    val frames = new Array[Short](nf * ch)
    var i = 0
    while (i < nf) {
      var c = 0
      while (c < ch) {
        frames(i * ch + c) = (java.lang.Math.floorMod(
          i.toLong * (7 + 2 * c) + id * (3 + c), 65536L) - 32768L).toShort
        c += 1
      }
      i += 1
    }
    val canonical = encodeWav(ch, rate, frames)
    // splice an odd-length LIST chunk between "WAVE" and "fmt " and
    // patch the RIFF size: exercises skip-by-length + the pad byte
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0) // 5-byte payload + 1 pad
    val out = new Array[Byte](canonical.length + list.length)
    System.arraycopy(canonical, 0, out, 0, 12)
    System.arraycopy(list, 0, out, 12, list.length)
    System.arraycopy(canonical, 12, out, 12 + list.length, canonical.length - 12)
    val riffLen = out.length - 8
    out(4) = riffLen.toByte; out(5) = (riffLen >> 8).toByte
    out(6) = (riffLen >> 16).toByte; out(7) = (riffLen >> 24).toByte
    out
  }

  /** The mono IMA ADPCM rule the `mm_audio_adpcm` oracle mirrors by
    * unrolling the decoder recurrence in SQL: blockAlign 12 → 8 nibble
    * bytes → 17 samples/block; nblocks = n%5+2; block b's header
    * predictor is `floorMod(id·31 + b·17, 65536) − 32768` (emitted as
    * the block's first sample), header index `floorMod(id·7 + b·3,
    * 89)`, and nibble s (0–15) is `floorMod(s·5 + b·11 + id, 16)`. */
  def synthWavAdpcm(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val nblocks = n % 5 + 2
    val blockAlign = 12
    val spb = (blockAlign - 4) * 2 + 1
    val rate = RATES(java.lang.Math.floorMod(id, 4L).toInt)
    val data = new Array[Byte](nblocks * blockAlign)
    var b = 0
    while (b < nblocks) {
      val base = b * blockAlign
      val pred = java.lang.Math.floorMod(id * 31 + b * 17, 65536L).toInt - 32768
      data(base) = pred.toByte
      data(base + 1) = (pred >> 8).toByte
      data(base + 2) = java.lang.Math.floorMod(id * 7 + b * 3, 89L).toByte
      data(base + 3) = 0
      var j = 0
      while (j < 8) {
        val lo = java.lang.Math.floorMod((2 * j) * 5L + b * 11L + id, 16L).toInt
        val hi = java.lang.Math.floorMod((2 * j + 1) * 5L + b * 11L + id, 16L).toInt
        data(base + 4 + j) = (lo | (hi << 4)).toByte
        j += 1
      }
      b += 1
    }
    val out = java.nio.ByteBuffer.allocate(48 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(40 + data.length)
      .put("WAVE".getBytes("ASCII"))
    out.put("fmt ".getBytes("ASCII")).putInt(20)
      .putShort(17).putShort(1).putInt(rate)
      .putInt(rate * blockAlign / spb).putShort(blockAlign.toShort)
      .putShort(4).putShort(2).putShort(spb.toShort)
    out.put("data".getBytes("ASCII")).putInt(data.length).put(data)
    out.array()
  }

  /** The wider-PCM-matrix rule the `mm_audio_deep` oracle mirrors:
    * depth cycles 8-bit / 24-bit / float32 by id mod 3, channels =
    * id mod 2 + 1, rate by id mod 4, frames = n % 97 + 10. With
    * e = i·(7+2c) + id·(3+c): integer depths store
    * `floorMod(e, 2^bits) − 2^(bits−1)` (8-bit as the excess-128
    * byte); float32 stores `(floorMod(e, 131072) − 65536) / 65536`
    * EXACTLY (≤17 significant bits), which the decoder maps through
    * `floor(v·32767 + 0.5)` — every linear value integer-recomputable
    * in SQL. */
  def synthWavDeep(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val nf = n % 97 + 10
    val ch = java.lang.Math.floorMod(id, 2L).toInt + 1
    val rate = RATES(java.lang.Math.floorMod(id, 4L).toInt)
    val kind = java.lang.Math.floorMod(id, 3L).toInt
    def e(i: Int, c: Int): Long = i.toLong * (7 + 2 * c) + id * (3 + c)
    kind match {
      case 0 =>
        val data = new Array[Byte](nf * ch)
        for (i <- 0 until nf; c <- 0 until ch)
          data(i * ch + c) = java.lang.Math.floorMod(e(i, c), 256L).toByte
        encodeWavBytes(1, 8, ch, rate, data)
      case 1 =>
        val data = new Array[Byte](nf * ch * 3)
        for (i <- 0 until nf; c <- 0 until ch) {
          // signed value in [-2^23, 2^23): its two's-complement low 3
          // bytes ARE the 24-bit LE wire form
          val v = java.lang.Math.floorMod(e(i, c), 1L << 24).toInt - (1 << 23)
          val o = (i * ch + c) * 3
          data(o) = v.toByte; data(o + 1) = (v >> 8).toByte
          data(o + 2) = (v >> 16).toByte
        }
        encodeWavBytes(1, 24, ch, rate, data)
      case _ =>
        val data = new Array[Byte](nf * ch * 4)
        for (i <- 0 until nf; c <- 0 until ch) {
          val m = java.lang.Math.floorMod(e(i, c), 131072L) - 65536L
          val bits = java.lang.Float.floatToIntBits(m.toFloat / 65536.0f)
          val o = (i * ch + c) * 4
          data(o) = bits.toByte; data(o + 1) = (bits >> 8).toByte
          data(o + 2) = (bits >> 16).toByte; data(o + 3) = (bits >> 24).toByte
        }
        encodeWavBytes(3, 32, ch, rate, data)
    }
  }

  /** dHash-style unsigned 128-bit product compare: a·b < c·d for
    * non-negative longs. */
  private def prodLess(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val h1 = java.lang.Math.multiplyHigh(a, b); val l1 = a * b
    val h2 = java.lang.Math.multiplyHigh(c, d); val l2 = c * d
    h1 < h2 || (h1 == h2 && java.lang.Long.compareUnsigned(l1, l2) < 0)
  }

  /** Fingerprint kernel — see [[AudioFingerprint]]. */
  def fingerprintInternal(bytes: Array[Byte]): java.lang.Long = {
    val w = parseWav(bytes)
    if (w == null) return null
    // IMA ADPCM (format 17) is block-stateful — sampleAt's flat
    // per-frame addressing doesn't apply (bytesPerSample = 0 would
    // read one byte forever); the documented contract is null
    if (w.format == 17) return null
    val nf = w.nFrames
    if (nf < 65 || nf > Int.MaxValue) return null
    val n = nf.toInt
    val s = new Array[Long](65)
    val cnt = new Array[Long](65)
    var f = 0
    while (f < n) {
      val blk = (f.toLong * 65 / n).toInt
      var a = 0L
      var c = 0
      while (c < w.channels) {
        a += math.abs(w.sampleAt(f, c).toLong)
        c += 1
      }
      s(blk) += a
      cnt(blk) += 1
      f += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (prodLess(s(b), cnt(b + 1), s(b + 1), cnt(b))) hash |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def audio_meta(c: Column): Column =
    GraftSqlBridge.column(AudioMeta(GraftSqlBridge.expression(c)))

  def audio_pcm_stats(c: Column): Column =
    GraftSqlBridge.column(AudioPcmStats(GraftSqlBridge.expression(c)))

  def audio_fingerprint(c: Column): Column =
    GraftSqlBridge.column(AudioFingerprint(GraftSqlBridge.expression(c)))

  def audio_frame_sample(c: Column, k: Column): Column =
    GraftSqlBridge.column(AudioFrameSample(
      GraftSqlBridge.expression(c), GraftSqlBridge.expression(k)))

  def audio_synth_wav(id: Column, text: Column): Column =
    GraftSqlBridge.column(AudioSynthWav(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def audio_synth_g711(id: Column, text: Column): Column =
    GraftSqlBridge.column(AudioSynthG711(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def audio_synth_deep(id: Column, text: Column): Column =
    GraftSqlBridge.column(AudioSynthDeep(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def audio_synth_adpcm(id: Column, text: Column): Column =
    GraftSqlBridge.column(AudioSynthAdpcm(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))
}
