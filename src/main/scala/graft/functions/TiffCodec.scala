package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL TIFF 6.0 decode/encode for multimodal binary columns — the
  * scanned-document / scientific-imagery container (public layout:
  * Adobe TIFF 6.0 spec). Supported on decode: both byte orders
  * (`II`/`MM`), baseline 8-bit grayscale (photometric 0/1), RGB,
  * palette-color (16-bit ColorMap scaled down), strip organization with
  * any RowsPerStrip, and Compression 1 (none) / 32773 (PackBits RLE).
  * The encoder emits valid single-page TIFFs in either byte order with
  * optional PackBits, so round-trips cross-check against the JDK's
  * independent ImageIO TIFF plugin in specs.
  *
  * Native Catalyst expressions (the [[ImageCodec]] contract): pure
  * projections, malformed input → null, 64 MiB decoded bound. */
case class TiffMeta(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = TiffCodec.metaSchema
  override def prettyName: String = "tiff_meta"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TiffCodec.metaInternal(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TiffCodec.metaInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): TiffMeta =
    copy(child = newChild)
}

/** `(id, utf8 content) → real TIFF bytes` — deterministic synthesizer:
  * dims from the content's byte length; photometric (gray / RGB /
  * palette), byte order, and PackBits-vs-none all cycle by id, so the
  * oracle covers every decode path analytically. */
case class TiffSynth(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tiff_synth"
  override def nullSafeEval(id: Any, text: Any): Any =
    TiffCodec.synthTiff(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TiffCodec.synthTiff($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TiffSynth =
    copy(left = newLeft, right = newRight)
}

object TiffCodec {
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("photometric", IntegerType),
    StructField("compression", IntegerType),
    StructField("big_endian", BooleanType)))

  private val MAX_PIXELS = 1 << 26

  /** Decoded TIFF: row-major top-down RGB, 3 bytes per pixel (gray and
    * palette expand; WhiteIsZero inverts). */
  final class TiffImage(val width: Int, val height: Int,
      val channels: Int, val photometric: Int, val compression: Int,
      val bigEndian: Boolean, val rgb: Array[Byte])

  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  def decode(b: Array[Byte]): TiffImage = {
    if (!isTiff(b)) return null
    val be = b(0) == 'M'
    def u16(i: Int): Int = {
      if (i < 0 || i + 1 >= b.length) return -1
      if (be) ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
      else (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    }
    def u32(i: Int): Long = {
      if (i < 0 || i + 3 >= b.length) return -1L
      if (be) ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
      else (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    }
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val nEntries = u16(ifd.toInt)
    if (nEntries <= 0 || ifd + 2 + nEntries * 12 > b.length) return null
    // tag → (type, count, valueFieldOffset)
    var width = -1; var height = -1; var spp = 1; var bps = 8
    var photometric = -1; var compression = 1; var rowsPerStrip = Int.MaxValue
    var stripOffsets: Array[Long] = null; var stripCounts: Array[Long] = null
    var colorMapOff = -1L; var colorMapCount = 0
    var e = 0
    while (e < nEntries) {
      val off = ifd.toInt + 2 + e * 12
      val tag = u16(off)
      val typ = u16(off + 2)
      val cnt = u32(off + 4)
      if (cnt < 0) return null
      // inline value when it fits in 4 bytes, else it's an offset
      val typeSize = typ match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8; case _ => return null
      }
      val total = typeSize * cnt
      val valOff = if (total <= 4) off + 8 else u32(off + 8).toInt
      def scalar: Long =
        if (typ == 3) u16(valOff).toLong
        else if (typ == 4) u32(valOff)
        else -1L
      def vecAt(k: Int): Long =
        if (typ == 3) u16(valOff + 2 * k).toLong
        else if (typ == 4) u32(valOff + 4 * k)
        else -1L
      tag match {
        case 256 => width = scalar.toInt
        case 257 => height = scalar.toInt
        case 258 =>
          // BitsPerSample: all samples must be 8
          var k = 0
          while (k < cnt) { if (vecAt(k) != 8L) return null; k += 1 }
          bps = 8
        case 259 => compression = scalar.toInt
        case 262 => photometric = scalar.toInt
        case 273 =>
          if (cnt > 65536) return null
          stripOffsets = Array.tabulate(cnt.toInt)(k => vecAt(k))
        case 277 => spp = scalar.toInt
        case 278 => rowsPerStrip = scalar.toInt
        case 279 =>
          if (cnt > 65536) return null
          stripCounts = Array.tabulate(cnt.toInt)(k => vecAt(k))
        case 320 =>
          colorMapOff = valOff.toLong; colorMapCount = cnt.toInt
        case _ => // ignore unknown tags
      }
      e += 1
    }
    if (width <= 0 || height <= 0 || stripOffsets == null ||
      stripCounts == null || stripOffsets.length != stripCounts.length)
      return null
    if (compression != 1 && compression != 32773) return null
    val channels = photometric match {
      case 0 | 1 => if (spp != 1) return null else 1
      case 2 => if (spp != 3) return null else 3
      case 3 => if (spp != 1 || colorMapOff < 0) return null else 1
      case _ => return null
    }
    if (width.toLong * height * 3 > MAX_PIXELS) return null
    if (rowsPerStrip <= 0) return null
    // palette: 3 * 2^bps 16-bit entries, planar R then G then B
    var palette: Array[Int] = null
    if (photometric == 3) {
      if (colorMapCount != 3 * 256) return null
      palette = Array.tabulate(colorMapCount) { k =>
        val v = u16(colorMapOff.toInt + 2 * k)
        if (v < 0) return null
        v >> 8 // 16-bit map → 8-bit samples (the usual v*255/65535 ≈ v>>8)
      }
    }
    // assemble raw sample bytes strip by strip
    val raw = new Array[Byte](width * height * spp)
    var rawN = 0
    var s = 0
    while (s < stripOffsets.length) {
      val so = stripOffsets(s).toInt
      val sc = stripCounts(s).toInt
      if (so < 0 || sc < 0 || so + sc > b.length) return null
      if (compression == 1) {
        if (rawN + sc > raw.length) return null
        System.arraycopy(b, so, raw, rawN, sc)
        rawN += sc
      } else {
        // PackBits: n in [0,127] → copy n+1 literal; n in [-127,-1] →
        // repeat next byte 1-n times; -128 → noop
        var i = so
        val end = so + sc
        while (i < end) {
          val n = b(i).toInt
          i += 1
          if (n >= 0) {
            if (i + n + 1 > end || rawN + n + 1 > raw.length) return null
            System.arraycopy(b, i, raw, rawN, n + 1)
            i += n + 1; rawN += n + 1
          } else if (n != -128) {
            if (i >= end || rawN + (1 - n) > raw.length) return null
            java.util.Arrays.fill(raw, rawN, rawN + 1 - n, b(i))
            i += 1; rawN += 1 - n
          }
        }
      }
      s += 1
    }
    if (rawN != raw.length) return null
    // expand to RGB
    val rgb = new Array[Byte](width * height * 3)
    var p = 0
    while (p < width * height) {
      photometric match {
        case 0 => // WhiteIsZero: invert
          val v = (255 - (raw(p) & 0xFF)).toByte
          rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
        case 1 =>
          val v = raw(p)
          rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
        case 2 =>
          rgb(p * 3) = raw(p * 3); rgb(p * 3 + 1) = raw(p * 3 + 1)
          rgb(p * 3 + 2) = raw(p * 3 + 2)
        case 3 =>
          val ix = raw(p) & 0xFF
          rgb(p * 3) = palette(ix).toByte
          rgb(p * 3 + 1) = palette(256 + ix).toByte
          rgb(p * 3 + 2) = palette(512 + ix).toByte
      }
      p += 1
    }
    new TiffImage(width, height, channels, photometric, compression, be, rgb)
  }

  /** PackBits RLE encode (TIFF 6.0 §9): runs ≥ 2 become repeat packets,
    * literals batch up to 128. */
  private[functions] def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      // find run length at i
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128)
        run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal stretch: until a run of ≥3 starts (2-byte runs are
        // cheaper folded into literals) or 128 reached
        val start = i
        var j = i + 1
        var done = false
        while (!done && j < data.length && j - start < 128) {
          var r = 1
          while (j + r < data.length && data(j + r) == data(j) && r < 3) r += 1
          if (r >= 3) done = true else j += 1
        }
        val n = j - start
        out.write(n - 1)
        out.write(data, start, n)
        i = j
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- encode

  /** Single-page 8-bit TIFF: `photometric` 1 (gray, `samples` = w*h),
    * 2 (RGB, w*h*3) or 3 (palette indices + a 256-entry `colorMap` of
    * (r,g,b) bytes scaled up to the 16-bit map); strips of
    * `rowsPerStrip`; PackBits when `packbits`. */
  def encodeTiff(w: Int, h: Int, photometric: Int, samples: Array[Byte],
      colorMap: Array[Byte], bigEndian: Boolean, packbits: Boolean,
      rowsPerStrip: Int = 4): Array[Byte] = {
    val spp = if (photometric == 2) 3 else 1
    require(samples.length == w * h * spp, "sample length mismatch")
    require(photometric != 3 || (colorMap != null && colorMap.length == 768),
      "palette needs a 256-entry RGB color map")
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = Array.tabulate(nStrips) { s =>
      val r0 = s * rowsPerStrip
      val rows = math.min(rowsPerStrip, h - r0)
      val chunk = java.util.Arrays.copyOfRange(samples,
        r0 * w * spp, (r0 + rows) * w * spp)
      if (packbits) packBits(chunk) else chunk
    }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      else { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit =
      if (bigEndian) {
        out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      } else {
        out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
      }
    // layout: header(8) | strip data | [bps vector][colormap][strip
    // offset/count vectors] | IFD
    if (bigEndian) { out.write('M'); out.write('M'); out.write(0); out.write(42) }
    else { out.write('I'); out.write('I'); out.write(42); out.write(0) }
    val stripDataStart = 8L
    val stripOffsets = new Array[Long](nStrips)
    var acc = stripDataStart
    for (s <- 0 until nStrips) { stripOffsets(s) = acc; acc += strips(s).length }
    if ((acc & 1) == 1) acc += 1 // word-align auxiliary data
    val bpsOff = acc
    val needBpsVector = spp == 3
    if (needBpsVector) acc += 6
    val cmOff = acc
    if (photometric == 3) acc += 768 * 2
    val soOff = acc
    val needStripVectors = nStrips > 1
    if (needStripVectors) acc += nStrips * 8 // two u32 vectors
    val ifdOff = acc
    w32(ifdOff) // header's IFD pointer
    for (s <- strips) out.write(s, 0, s.length)
    if (((stripDataStart + strips.map(_.length.toLong).sum) & 1) == 1)
      out.write(0)
    if (needBpsVector) { w16(8); w16(8); w16(8) }
    if (photometric == 3) {
      // planar 16-bit map as v*257 (= v<<8|v): BOTH the >>8 read and
      // the v16*255/65535 read (ImageIO) recover v exactly
      for (c <- 0 until 3; k <- 0 until 256)
        w16((colorMap(k * 3 + c) & 0xFF) * 257)
    }
    if (needStripVectors) {
      for (s <- 0 until nStrips) w32(stripOffsets(s))
      for (s <- 0 until nStrips) w32(strips(s).length.toLong)
    }
    // IFD
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    // (tag, type, count, value) — value is inline or an offset
    entries += ((256, 3, 1L, w.toLong))
    entries += ((257, 3, 1L, h.toLong))
    if (needBpsVector) entries += ((258, 3, 3L, bpsOff))
    else entries += ((258, 3, 1L, 8L))
    entries += ((259, 3, 1L, if (packbits) 32773L else 1L))
    entries += ((262, 3, 1L, photometric.toLong))
    if (needStripVectors) entries += ((273, 4, nStrips.toLong, soOff))
    else entries += ((273, 4, 1L, stripOffsets(0)))
    entries += ((277, 3, 1L, spp.toLong))
    entries += ((278, 3, 1L, rowsPerStrip.toLong))
    if (needStripVectors)
      entries += ((279, 4, nStrips.toLong, soOff + nStrips * 4))
    else entries += ((279, 4, 1L, strips(0).length.toLong))
    if (photometric == 3) entries += ((320, 3, 768L, cmOff))
    w16(entries.length)
    for ((tag, typ, cnt, v) <- entries.sortBy(_._1)) {
      w16(tag); w16(typ); w32(cnt)
      // inline SHORT scalars sit in the value field's first two bytes
      if (typ == 3 && cnt == 1L) { w16(v.toInt); w16(0) } else w32(v)
    }
    w32(0L) // no next IFD
    out.toByteArray
  }

  // ----------------------------------------------------------------- stats

  def metaInternal(b: Array[Byte]): InternalRow = {
    val t = decode(b)
    if (t == null) null
    else InternalRow(t.width, t.height, t.channels, t.photometric,
      t.compression, t.bigEndian)
  }

  /** [[ImageCodec.pixelStatsInternal]]-schema stats over the expanded
    * RGB canvas (gray replicates; WhiteIsZero already inverted). */
  def pixelStats(b: Array[Byte]): InternalRow = {
    val t = decode(b)
    if (t == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < t.rgb.length) {
      sr += t.rgb(i) & 0xFF; sg += t.rgb(i + 1) & 0xFF; sb += t.rgb(i + 2) & 0xFF
      i += 3
    }
    InternalRow(t.width, t.height, t.width.toLong * t.height, sr, sg, sb, null)
  }

  // ------------------------------------------------------------ synthesis

  /** Deterministic TIFF the oracle mirrors: w = n%19+4, h = n%9+3
    * (n = content byte length); photometric cycles gray(1)/RGB(2)/
    * palette(3) by floorMod(id,3); big-endian on odd ids; PackBits when
    * floorMod(id,2)=0. Gray sample = (x*3+y*5+id) fm 256; RGB channel
    * c = (x*(3+2c)+y*(5+c)+id*(1+c)) fm 256; palette index =
    * (x*3+y*5+id) fm 256 through map[k] = ((k*31+id) fm 256,
    * (k*57+id*2) fm 256, (k*89+id*3) fm 256). */
  def synthTiff(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 19 + 4
    val h = n % 9 + 3
    val pm = java.lang.Math.floorMod(id, 3L).toInt + 1
    val be = java.lang.Math.floorMod(id, 2L) == 1L
    val pb = java.lang.Math.floorMod(id, 2L) == 0L
    val samples = pm match {
      case 2 =>
        val s = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              s((y * w + x) * 3 + c) = java.lang.Math.floorMod(
                x * (3 + 2 * c) + y * (5 + c) + id * (1 + c), 256L).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        s
      case _ =>
        val s = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            s(y * w + x) =
              java.lang.Math.floorMod(x * 3 + y * 5 + id, 256L).toByte
            x += 1
          }
          y += 1
        }
        s
    }
    val cmap =
      if (pm == 3) Array.tabulate(768) { i =>
        val k = i / 3
        (i % 3) match {
          case 0 => java.lang.Math.floorMod(k * 31 + id, 256L).toByte
          case 1 => java.lang.Math.floorMod(k * 57 + id * 2, 256L).toByte
          case _ => java.lang.Math.floorMod(k * 89 + id * 3, 256L).toByte
        }
      }
      else null
    encodeTiff(w, h, pm, samples, cmap, be, pb)
  }

  // ---------------------------------------------------------- Column API

  def tiff_meta(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(TiffMeta(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))
  def tiff_synth(id: Column, text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(TiffSynth(
      org.apache.spark.sql.GraftSqlBridge.expression(id),
      org.apache.spark.sql.GraftSqlBridge.expression(text)))
}
