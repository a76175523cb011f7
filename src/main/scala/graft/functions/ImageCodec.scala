package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image-format decode for multimodal binary columns: JPEG header
  * (segment walk to SOF0/SOF2 — dimensions, sample precision, component
  * count, baseline/progressive), PNG header (signature + CRC-verified
  * IHDR — dimensions, bit depth, color type), and FULL PNG pixel decode
  * (IDAT concatenation → zlib inflate via the JDK's
  * `java.util.zip.Inflater` → all five scanline unfilters per RFC 2083
  * §6 — None/Sub/Up/Average/Paeth). All byte layouts are public
  * (JPEG: ITU-T T.81 §B.2; PNG: RFC 2083); no image library
  * involved — DEFLATE ships in the JDK. Native Catalyst expressions, so
  * a 100 TB scan decodes inside whole-stage codegen as a pure
  * projection — no Exchange, no RDD boundary, column pruning intact.
  *
  * Malformed input returns null (truncated bytes, wrong magic, a JPEG
  * with no SOF frame, a PNG whose IHDR CRC fails) — decoder-robustness
  * is the common case in crawled training data, and a task crash on one
  * bad payload is the wrong failure mode at scale.
  */
case class ImageMeta(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType)
  override def dataType: DataType = ImageCodec.metaSchema
  override def prettyName: String = "image_meta"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.decodeMetaInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageCodec.decodeMetaInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

/** `(id, utf8 content) → real JPEG or PNG header bytes` — deterministic
  * synthesizer for oracle-checked round-trips: every parameter derives
  * from (id, octet_length(content)), so an external SQL oracle can
  * recompute the expected metadata without parsing a byte. */
case class ImageSynth(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // the analyzer inserts implicit casts (an INT literal id widens to
  // LONG on BOTH eval paths — the interpreted path would otherwise
  // ClassCastException where codegen silently widens)
  override def inputTypes: Seq[DataType] =
    Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthFromDoc(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthFromDoc($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynth =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → 24bpp gradient BMP` — the pixel-carrying twin
  * of [[ImageSynth]]; every pixel value is a fixed affine function of
  * (x, y, id) mod 256 so SQL oracles recompute it analytically. */
case class ImageSynthBmp(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_bmp"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthBmp(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthBmp($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthBmp =
    copy(left = newLeft, right = newRight)
}

/** REAL pixel decode: exact integer channel sums over a 24bpp BMP —
  * null (never a crash) for malformed or unsupported bytes. */
case class ImagePixelStats(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ImageCodec.pixelStatsSchema
  override def prettyName: String = "image_pixel_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.pixelStatsInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageCodec.pixelStatsInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImagePixelStats =
    copy(child = newChild)
}

/** 64-bit perceptual DIFFERENCE hash (dHash) of an image — the
  * multimodal twin of SimHash: near-identical images land within a
  * few bits, so near-duplicate IMAGE detection rides the same banded
  * bucket-join machinery as text ([[graft.operators.Multimodal
  * .imageNearDupPairs]]). The classic 9×8 recipe: average-pool the
  * grayscale (r+g+b, no luma weights — integer-exact) into 8 rows ×
  * 9 columns (pixel (x,y) → cell (y·8/h, x·9/w)), then bit (cy,cx) =
  * 1 iff cell (cy,cx) is darker than its right neighbor — compared
  * by cross-multiplied integer sums, so unequal cell sizes never
  * need a division. Supports every full-pixel decoder here (JPEG,
  * PNG at any depth/color type, BMP); GIF/TIFF and undersized
  * (w < 9 or h < 8) images → null. Deterministic pure-integer math →
  * engine-portable, oracle-checkable. */
case class ImageDhash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "image_dhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.dhashInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dh = ctx.freshName("dh")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $dh = graft.functions.ImageCodec.dhashInternal($c);
      ${ev.isNull} = $dh == null;
      ${ev.value} = $dh == null ? -1L : $dh.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDhash =
    copy(child = newChild)
}

/** 64-bit perceptual DCT hash (pHash) — the frequency-domain sibling of
  * [[ImageDhash]]: dHash compares neighboring cells (edge structure),
  * pHash thresholds the low-frequency DCT coefficients against their
  * median, so it survives uniform brightness shifts and mild blur that
  * flip dHash bits. Same banded bucket-join near-dup machinery applies.
  * Pure fixed-point integer math against a shared cosine table
  * ([[ImageCodec.phashInternal]]) — deterministic, engine-portable,
  * oracle-checkable. Null for undecodable bytes, GIF/TIFF, or images
  * under the 16×8 pooling grid. */
case class ImagePhash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "image_phash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.phashInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.freshName("ph")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $ph = graft.functions.ImageCodec.phashInternal($c);
      ${ev.isNull} = $ph == null;
      ${ev.value} = $ph == null ? -1L : $ph.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImagePhash =
    copy(child = newChild)
}

/** `(id, utf8 content) → real 8-bit PNG with pixels` — the PNG twin of
  * [[ImageSynthBmp]]: a fully decodable zlib-compressed PNG whose
  * sample values are fixed affine functions of (x, y, channel, id) mod
  * 256, so SQL oracles recompute channel sums analytically. Scanline
  * filters cycle through all five RFC 2083 types (offset by id) and the
  * stream splits across two IDAT chunks, so every decode path stays
  * production-exercised. */
case class ImageSynthPng(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_png"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthPngPixels(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthPngPixels($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthPng =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real Adam7-INTERLACED PNG` — same pixel rule
  * as [[ImageSynthPng]] carried through the seven-pass wire layout
  * (per-pass scanline filtering, empty passes at tiny dims). */
case class ImageSynthPngI7(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_png_i7"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthPngInterlaced(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthPngInterlaced($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthPngI7 =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real SUB-BYTE gray PNG (depth 1/2/4)` — raw
  * code values affine mod 2^depth, MSB-first bit packing, Adam7 on
  * even ids, so both bit-depth unpacking and the interlace interact
  * under oracle check. */
case class ImageSynthPngTiny(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_png_tiny"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthPngTiny(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthPngTiny($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthPngTiny =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real palette PNG (color type 3)` — the
  * indexed-color twin of [[ImageSynthPng]]: a PLTE-backed image whose
  * palette entries AND pixel indices are fixed affine functions of the
  * inputs, so SQL oracles recompute the expanded RGB sums by composing
  * the two rules. */
case class ImageSynthPngPal(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_png_pal"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthPngPalette(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthPngPalette($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthPngPal =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real 16-bit PNG` — the deep-sample twin of
  * [[ImageSynthPng]]: gray or RGB by id parity, two big-endian bytes
  * per sample, values a fixed affine function mod 2^16 so SQL oracles
  * recompute the full-range channel sums analytically. */
case class ImageSynthPng16(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_png16"

  override def nullSafeEval(id: Any, text: Any): Any =
    ImageCodec.synthPng16(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.ImageCodec.synthPng16($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthPng16 =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real baseline JPEG with pixels` — a
  * BLOCK-CONSTANT image (see [[JpegCodec]]'s exactness note: constant
  * 8×8 blocks survive the DCT round-trip exactly under a flat
  * quantization table), gray or YCbCr by id parity, restart markers on
  * ids divisible by 3 — so the `mm_jpeg_pixel_stats` oracle recomputes
  * the decoded sums analytically while the decoder exercises real
  * Huffman/stuffing/restart machinery. */
case class ImageSynthJpegPx(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_jpeg_px"

  override def nullSafeEval(id: Any, text: Any): Any =
    JpegCodec.synthJpegPixels(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.JpegCodec.synthJpegPixels($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthJpegPx =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real 4:2:0 baseline JPEG` — the
  * chroma-subsampled twin of [[ImageSynthJpegPx]] (the layout most
  * real JPEGs ship): Y blocks constant on the full grid, chroma blocks
  * constant on the subsampled grid, so replicate-upsampling decode is
  * exact and the oracle stays analytic. */
case class ImageSynthJpeg420(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_jpeg420"

  override def nullSafeEval(id: Any, text: Any): Any =
    JpegCodec.synthJpeg420(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.JpegCodec.synthJpeg420($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthJpeg420 =
    copy(left = newLeft, right = newRight)
}

/** `(id, utf8 content) → real PROGRESSIVE (SOF2) JPEG` — the
  * multi-scan twin of [[ImageSynthJpegPx]]: DC-first/DC-refinement and
  * per-band AC-first/AC-refinement scans with successive approximation
  * (Al=1 → 0) and EOBn runs, block-constant so the decode is exact and
  * the `mm_jpeg_progressive` oracle stays analytic; 4:2:0 chroma on
  * every fifth color id, restart markers on ids divisible by 3. */
case class ImageSynthJpegProg(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_synth_jpeg_prog"

  override def nullSafeEval(id: Any, text: Any): Any =
    JpegCodec.synthJpegProg(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.JpegCodec.synthJpegProg($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ImageSynthJpegProg =
    copy(left = newLeft, right = newRight)
}

/** REAL nearest-neighbor resize: 24bpp BMP → BMP, 8/16-bit PNG →
  * PNG (gray/RGB/gray+alpha/RGBA at either depth, palette input
  * expanded to truecolor output), or baseline JPEG → lossless PNG —
  * full decode, resample, re-encode.
  * Null for malformed input or out-of-range target dims. */
case class ImageResizeNn(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "image_resize_nn"
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any, w: Any, h: Any): Any =
    ImageCodec.resizeNnInternal(bytes.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h) => s"""
      ${ev.value} = graft.functions.ImageCodec.resizeNnInternal($b, $w, $h);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ImageResizeNn =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ImageCodec {
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("channels", IntegerType),
    StructField("color_type", IntegerType),   // PNG only; null for JPEG
    StructField("progressive", BooleanType))) // JPEG only; null for PNG

  private val PNG_SIG =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  // ---------------------------------------------------------------- decode

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** JPEG/PNG sniff + header parse → InternalRow(metaSchema) or null. */
  def decodeMetaInternal(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 4) null
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) decodeJpeg(bytes)
    else if (bytes.length >= 8 && bytes.take(8).sameElements(PNG_SIG)) decodePng(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') {
      val bmp = parseBmp(bytes)
      if (bmp == null) null
      else InternalRow(UTF8String.fromString("bmp"), bmp.width, bmp.height,
        24, 3, null, null) // bit_depth = bits per pixel (24bpp-only path)
    } else if (GifCodec.isGif(bytes)) {
      val gif = GifCodec.decode(bytes)
      if (gif == null) null
      else InternalRow(UTF8String.fromString("gif"), gif.width, gif.height,
        8, 3, null, null) // palette indices expand to 8-bit RGB
    } else if (TiffCodec.isTiff(bytes)) {
      val t = TiffCodec.decode(bytes)
      if (t == null) null
      else InternalRow(UTF8String.fromString("tiff"), t.width, t.height,
        8, t.channels, null, null)
    } else null
  }

  /** Segment walk (ITU-T T.81 §B.2): each marked segment after SOI is
    * `FF <marker> <u16 length incl itself>`; payload bytes may contain
    * 0xFF, so segments are SKIPPED BY LENGTH, never scanned. Standalone
    * markers (TEM, RSTn) carry no length. Stops at the first SOF frame
    * header (C0-CF minus C4/C8/CC, which are DHT/JPG/DAC). */
  private def decodeJpeg(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null // lost sync: corrupt stream
      var m = b(i + 1) & 0xFF
      // fill bytes: any number of 0xFF may pad before the marker code
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF }
      i += 2
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        // TEM / RSTn: standalone, no length field
      } else if (m == 0xD9 || m == 0xDA) {
        return null // EOI or SOS before any SOF: no frame header present
      } else {
        if (i + 1 >= b.length) return null
        val segLen = u16(b, i)
        if (segLen < 2 || i + segLen > b.length) return null
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (segLen < 8) return null
          val precision = b(i + 2) & 0xFF
          val height = u16(b, i + 3)
          val width = u16(b, i + 5)
          val ncomp = b(i + 7) & 0xFF
          val progressive = m == 0xC2 || m == 0xC6 || m == 0xCA || m == 0xCE
          return InternalRow(UTF8String.fromString("jpeg"), width, height,
            precision, ncomp, null, progressive)
        }
        i += segLen
      }
    }
    null
  }

  /** PNG (RFC 2083): 8-byte signature, then chunks of
    * `u32 length | 4-byte type | data | u32 CRC32(type+data)`. IHDR must
    * be first; its CRC is verified before any field is trusted. Channel
    * count derives from the color type (0 gray→1, 2 rgb→3, 3 palette→1,
    * 4 gray+alpha→2, 6 rgba→4). */
  private def decodePng(b: Array[Byte]): InternalRow = {
    if (b.length < 8 + 8 + 13 + 4) return null
    if (u32(b, 8) != 13L) return null
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return null
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13)
    if (crc.getValue != u32(b, 29)) return null
    val width = u32(b, 16)
    val height = u32(b, 20)
    if (width <= 0 || width > Int.MaxValue || height <= 0 || height > Int.MaxValue)
      return null
    val bitDepth = b(24) & 0xFF
    val colorType = b(25) & 0xFF
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return null
    }
    InternalRow(UTF8String.fromString("png"), width.toInt, height.toInt,
      bitDepth, channels, colorType, null)
  }

  // ------------------------------------------------------ PNG pixel codec
  //
  // FULL 8-bit PNG decode with no image library: PNG's compression is
  // DEFLATE in a zlib wrapper (RFC 1950/1951), and `java.util.zip
  // .Inflater` ships in every JDK — so the only format work is chunk
  // walking, scanline unfiltering (the five filters of RFC 2083 §6),
  // and sample layout. Supported: bit depths 8 and 16, color types 0
  // (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), and 3 (palette, 8-bit,
  // expanded through PLTE), interlace 0. Sub-byte depths and Adam7
  // return null — robustness, not a crash.

  /** Decoded PNG: `samples` is row-major top-down, `channels` samples
    * per pixel, one byte per sample at depth 8 / two big-endian bytes
    * at depth 16 (`bitDepth` says which). */
  final class PngImage(val width: Int, val height: Int,
      val channels: Int, val colorType: Int, val samples: Array[Byte],
      val bitDepth: Int = 8)

  /** Max decoded sample bytes (64 MiB) — an inflate bound so a
    * crafted tiny payload can't balloon a task's memory. */
  private val MAX_SAMPLES = 1 << 26

  def decodePngPixels(b: Array[Byte]): PngImage = {
    if (b == null || b.length < 8 + 8 + 13 + 4) return null
    if (!b.take(8).sameElements(PNG_SIG)) return null
    // IHDR must be first (same checks as the header path)
    if (u32(b, 8) != 13L) return null
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return null
    val ihdrCrc = new java.util.zip.CRC32
    ihdrCrc.update(b, 12, 4 + 13)
    if (ihdrCrc.getValue != u32(b, 29)) return null
    val w = u32(b, 16)
    val h = u32(b, 20)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    val bitDepth = b(24) & 0xFF
    val colorType = b(25) & 0xFF
    // RFC 2083 §2: gray allows 1/2/4/8/16, palette 1/2/4/8, the rest 8/16
    val depthOk = colorType match {
      case 0 => Seq(1, 2, 4, 8, 16).contains(bitDepth)
      case 3 => Seq(1, 2, 4, 8).contains(bitDepth)
      case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
      case _ => false
    }
    if (!depthOk) return null
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => 1 // palette: one index per pixel; expanded via PLTE below
    }
    if ((b(26) & 0xFF) != 0 || (b(27) & 0xFF) != 0)
      return null // compression/filter method: only 0 defined
    val interlace = b(28) & 0xFF
    if (interlace != 0 && interlace != 1) return null // 0 = none, 1 = Adam7
    val width = w.toInt; val height = h.toInt
    val bps = math.max(1, bitDepth / 8) // bytes per UNPACKED sample
    def packedRow(px: Int): Long = (px.toLong * ch * bitDepth + 7) / 8
    val rowBytes = packedRow(width)
    // expected inflated size: one filter byte per scanline; Adam7
    // scanlines are per-PASS rows (empty passes contribute nothing)
    val rawLen =
      if (interlace == 0) (rowBytes + 1) * height
      else {
        var total = 0L
        var p = 0
        while (p < 7) {
          val (pw, ph) = adam7Dims(width, height, p)
          if (pw > 0 && ph > 0) total += (packedRow(pw) + 1) * ph
          p += 1
        }
        total
      }
    if (rawLen <= 0 || rawLen > MAX_SAMPLES) return null
    if (width.toLong * height * ch * bps > MAX_SAMPLES) return null
    if (colorType == 3 && width.toLong * height * 3 > MAX_SAMPLES) return null

    // chunk walk: concatenate every IDAT payload (CRC-verified), grab
    // PLTE for the palette path, stop at IEND; ancillary chunks skipped
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var i = 8 + 8 + 13 + 4
    var sawEnd = false
    while (!sawEnd) {
      if (i + 8 > b.length) return null
      val len = u32(b, i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > b.length) return null
      val typ = new String(b, i + 4, 4, "ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(b, i + 4, 4 + len.toInt)
      if (crc.getValue != u32(b, i + 8 + len.toInt)) return null
      typ match {
        case "IDAT" => idat.write(b, i + 8, len.toInt)
        case "PLTE" =>
          // must precede IDAT; 1-256 3-byte entries (RFC 2083 §4.1.2)
          if (idat.size > 0 || len == 0 || len % 3 != 0 || len > 768) return null
          plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len.toInt)
        case "IEND" => sawEnd = true
        case _ => // ancillary: skip
      }
      i += 12 + len.toInt
    }
    if (colorType == 3 && plte == null) return null // palette image needs PLTE
    val comp = idat.toByteArray
    if (comp.isEmpty) return null

    // zlib inflate to the exact expected size
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = try inf.inflate(raw, off, raw.length - off) catch {
          case _: java.util.zip.DataFormatException => return null
        }
        // Any zero-progress iteration is terminal: with all input set and
        // output space free, 0 means truncated input OR a preset-dictionary
        // stream (FDICT set → needsDictionary, needsInput stays false) —
        // looping again would spin forever on a crafted payload.
        if (n == 0) return null
        off += n
      }
      if (off != raw.length) return null
    } finally inf.end()

    // unfilter (RFC 2083 §6.1): byte-wise with bpp = whole bytes per
    // pixel (min 1 — sub-byte depths filter on packed bytes) — the
    // same code serves every depth, and each Adam7 pass is its own
    // filter context (prior row = previous row OF THE PASS). Sub-byte
    // rows unpack to one RAW code byte per sample after unfiltering.
    val bpp = math.max(1, ch * bitDepth / 8)
    val sampleBytes = ch * bps // unpacked bytes per pixel
    var out: Array[Byte] = null
    if (interlace == 0) {
      val stride = rowBytes.toInt
      val packed = new Array[Byte](stride * height)
      if (!unfilterRows(raw, 0, packed, stride, height, bpp)) return null
      out =
        if (bitDepth >= 8) packed
        else unpackRows(packed, stride, height, width, bitDepth)
    } else {
      out = new Array[Byte](width * height * sampleBytes)
      var rawOff = 0
      var p = 0
      while (p < 7) {
        val (pw, ph) = adam7Dims(width, height, p)
        if (pw > 0 && ph > 0) {
          val passStride = packedRow(pw).toInt
          val packed = new Array[Byte](passStride * ph)
          if (!unfilterRows(raw, rawOff, packed, passStride, ph, bpp)) return null
          rawOff += (passStride + 1) * ph
          val pass =
            if (bitDepth >= 8) packed
            else unpackRows(packed, passStride, ph, pw, bitDepth)
          // scatter pass pixels to their Adam7 positions
          val (x0, y0, dx, dy) = ADAM7(p)
          var j = 0
          while (j < ph) {
            val fy = y0 + j * dy
            var i = 0
            while (i < pw) {
              System.arraycopy(pass, (j * pw + i) * sampleBytes,
                out, (fy * width + x0 + i * dx) * sampleBytes, sampleBytes)
              i += 1
            }
            j += 1
          }
        }
        p += 1
      }
    }
    if (colorType == 3) {
      // expand palette indices to RGB; an index past the palette end is
      // corruption (RFC 2083 §4.1.2), not a clampable value
      val entries = plte.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var p = 0
      while (p < out.length) {
        val idx = out(p) & 0xFF
        if (idx >= entries) return null
        rgb(p * 3) = plte(idx * 3)
        rgb(p * 3 + 1) = plte(idx * 3 + 1)
        rgb(p * 3 + 2) = plte(idx * 3 + 2)
        p += 1
      }
      return new PngImage(width, height, 3, colorType, rgb)
    }
    new PngImage(width, height, ch, colorType, out, bitDepth)
  }

  /** Adam7 pass table: (x0, y0, dx, dy) per pass (RFC 2083 §2.6). */
  private val ADAM7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Pixel dims of Adam7 pass `p` for a w×h image (0 when empty). */
  private def adam7Dims(w: Int, h: Int, p: Int): (Int, Int) = {
    val (x0, y0, dx, dy) = ADAM7(p)
    (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
  }

  /** Unfilter `nRows` contiguous scanlines (each `1 + rowBytes` in
    * `raw` starting at `rawOff`) into `out` (stride `rowBytes`).
    * False on an undefined filter type or short input. */
  private def unfilterRows(raw: Array[Byte], rawOff: Int, out: Array[Byte],
      rowBytes: Int, nRows: Int, bpp: Int): Boolean = {
    if (rawOff + (rowBytes + 1).toLong * nRows > raw.length) return false
    var y = 0
    while (y < nRows) {
      val filter = raw(rawOff + y * (rowBytes + 1)) & 0xFF
      val src = rawOff + y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      val prior = dst - rowBytes
      filter match {
        case 0 => System.arraycopy(raw, src, out, dst, rowBytes)
        case 1 => // Sub
          var x = 0
          while (x < rowBytes) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + left).toByte
            x += 1
          }
        case 2 => // Up
          var x = 0
          while (x < rowBytes) {
            val up = if (y > 0) out(prior + x) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + up).toByte
            x += 1
          }
        case 3 => // Average
          var x = 0
          while (x < rowBytes) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            val up = if (y > 0) out(prior + x) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < rowBytes) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            val up = if (y > 0) out(prior + x) & 0xFF else 0
            val ul = if (y > 0 && x >= bpp) out(prior + x - bpp) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + paeth(left, up, ul)).toByte
            x += 1
          }
        case _ => return false
      }
      y += 1
    }
    true
  }

  /** Unpack `nRows` rows of MSB-first `depth`-bit samples (depth 1, 2
    * or 4; `rowBytes` packed bytes per row) into one byte per sample
    * carrying the RAW code value (0..2^depth−1 — native-range
    * semantics, same contract as the 16-bit path's 0..65535 sums). */
  private def unpackRows(packed: Array[Byte], rowBytes: Int, nRows: Int,
      widthPx: Int, depth: Int): Array[Byte] = {
    val out = new Array[Byte](widthPx * nRows)
    val perByte = 8 / depth
    val mask = (1 << depth) - 1
    var y = 0
    while (y < nRows) {
      var x = 0
      while (x < widthPx) {
        val b = packed(y * rowBytes + x / perByte) & 0xFF
        val shift = 8 - depth * (x % perByte + 1)
        out(y * widthPx + x) = ((b >> shift) & mask).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Pack one-byte-per-sample raw values into MSB-first `depth`-bit
    * rows (the inverse of [[unpackRows]]); values must fit the depth. */
  private def packRows(samples: Array[Byte], widthPx: Int, nRows: Int,
      depth: Int): Array[Byte] = {
    val rowBytes = (widthPx * depth + 7) / 8
    val out = new Array[Byte](rowBytes * nRows)
    val perByte = 8 / depth
    var y = 0
    while (y < nRows) {
      var x = 0
      while (x < widthPx) {
        val v = samples(y * widthPx + x) & 0xFF
        require(v < (1 << depth), s"value $v exceeds $depth-bit depth")
        val shift = 8 - depth * (x % perByte + 1)
        val idx = y * rowBytes + x / perByte
        out(idx) = (out(idx) | (v << shift)).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Paeth predictor (RFC 2083 §6.6) — exact integer form. */
  private def paeth(a: Int, bUp: Int, c: Int): Int = {
    val p = a + bUp - c
    val pa = math.abs(p - a); val pb = math.abs(p - bUp); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) bUp else c
  }

  /** Encode raw top-down samples as a real zlib-compressed PNG. Each
    * scanline's filter type comes from `filterOf(y)` — the synthesizer
    * cycles all five so decode round-trips exercise every unfilter;
    * production re-encode (resize output) uses filter 0. The
    * compressed stream is split across two IDAT chunks when it is
    * long enough, so multi-IDAT concatenation stays a tested path. */
  /** Filter `nRows` contiguous rows of `samples` (stride `rowBytes`)
    * into filter-byte-prefixed scanlines; `filterOfRow` picks the
    * per-row filter type (floor-modded into 0-4). */
  private def filterRows(samples: Array[Byte], rowBytes: Int, nRows: Int,
      bpp: Int, filterOfRow: Int => Int): Array[Byte] = {
    val raw = new Array[Byte]((rowBytes + 1) * nRows)
    var y = 0
    while (y < nRows) {
      val f = java.lang.Math.floorMod(filterOfRow(y), 5)
      raw(y * (rowBytes + 1)) = f.toByte
      val src = y * rowBytes
      val dst = y * (rowBytes + 1) + 1
      val prior = src - rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = samples(src + x) & 0xFF
        val left = if (x >= bpp) samples(src + x - bpp) & 0xFF else 0
        val up = if (y > 0) samples(prior + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) samples(prior + x - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 => paeth(left, up, ul)
        }
        raw(dst + x) = (cur - pred).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  def encodePng(width: Int, height: Int, colorType: Int,
      samples: Array[Byte], filterOf: Int => Int,
      palette: Array[Byte] = null, bitDepth: Int = 8,
      interlaced: Boolean = false): Array[Byte] = {
    val subByteOk = (colorType == 0 || colorType == 3) &&
      (bitDepth == 1 || bitDepth == 2 || bitDepth == 4)
    require(bitDepth == 8 || bitDepth == 16 || subByteOk, s"bitDepth $bitDepth")
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case 3 =>
        require(palette != null && palette.length > 0 &&
          palette.length % 3 == 0 && palette.length <= 768,
          "colorType 3 needs a 1-256 entry RGB palette")
        1 // samples are palette indices
      case _ => throw new IllegalArgumentException(s"colorType $colorType")
    }
    val bps = math.max(1, bitDepth / 8)
    val stride = width * ch * bps // UNPACKED stride (1 byte per raw sample)
    require(samples.length == stride * height, "sample length mismatch")
    val bpp = math.max(1, ch * bitDepth / 8)
    // sub-byte depths pack raw sample bytes into bit rows BEFORE the
    // filter pass (filters operate on the packed bytes, bpp = 1)
    def packIfSub(px: Array[Byte], widthPx: Int, nRows: Int): Array[Byte] =
      if (bitDepth >= 8) px else packRows(px, widthPx, nRows, bitDepth)
    def packedRowB(px: Int): Int = ((px.toLong * ch * bitDepth + 7) / 8).toInt
    val raw: Array[Byte] =
      if (!interlaced)
        filterRows(packIfSub(samples, width, height),
          packedRowB(width), height, bpp, filterOf)
      else {
        // Adam7: gather each pass's pixels contiguous, filter the pass
        // as its own sub-image (filter type keyed by the FINAL row so
        // decode coverage still cycles), concatenate in pass order
        val sb = ch * bps
        val buf = new java.io.ByteArrayOutputStream()
        var p = 0
        while (p < 7) {
          val (pw, ph) = adam7Dims(width, height, p)
          if (pw > 0 && ph > 0) {
            val (x0, y0, dx, dy) = ADAM7(p)
            val pass = new Array[Byte](pw * ph * sb)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                System.arraycopy(samples,
                  ((y0 + j * dy) * width + x0 + i * dx) * sb,
                  pass, (j * pw + i) * sb, sb)
                i += 1
              }
              j += 1
            }
            buf.write(filterRows(packIfSub(pass, pw, ph),
              packedRowB(pw), ph, bpp, j => filterOf(y0 + j * dy)))
          }
          p += 1
        }
        buf.toByteArray
      }
    // zlib deflate (Deflater default = zlib wrapper, per RFC 1950)
    val def_ = new java.util.zip.Deflater()
    val comp = try {
      def_.setInput(raw); def_.finish()
      val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
      val tmp = new Array[Byte](8192)
      while (!def_.finished()) {
        val n = def_.deflate(tmp)
        buf.write(tmp, 0, n)
      }
      buf.toByteArray
    } finally def_.end()

    def chunk(typ: String, data: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + len)
      out.putInt(len).put(typ.getBytes("ASCII")).put(data, off, len)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("ASCII")); crc.update(data, off, len)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put((if (interlaced) 1 else 0).toByte).array()
    val idats =
      if (comp.length >= 32) {
        val mid = comp.length / 2
        chunk("IDAT", comp, 0, mid) ++ chunk("IDAT", comp, mid, comp.length - mid)
      } else chunk("IDAT", comp, 0, comp.length)
    val plteChunk =
      if (colorType == 3) chunk("PLTE", palette, 0, palette.length)
      else Array.emptyByteArray
    PNG_SIG ++ chunk("IHDR", ihdr, 0, 13) ++ plteChunk ++ idats ++
      chunk("IEND", Array.emptyByteArray, 0, 0)
  }

  // ----------------------------------------------------------------- synth

  /** Minimal structurally-valid JPEG header stream: SOI, APP0/JFIF, a
    * COM segment whose payload contains marker-lookalike 0xFF bytes
    * (exercising skip-by-length), a DQT, the SOF0/SOF2 frame header,
    * EOI. */
  def synthJpeg(width: Int, height: Int, channels: Int,
      progressive: Boolean): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(64 + 3 * channels)
    out.put(0xFF.toByte).put(0xD8.toByte) // SOI
    // APP0 "JFIF": version 1.1, no density, no thumbnail
    out.put(0xFF.toByte).put(0xE0.toByte).putShort(16)
      .put("JFIF".getBytes("ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte).put(0.toByte)
      .putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    // COM with embedded fake markers — a naive FF-scan would derail here
    val com = Array[Byte](0xFF.toByte, 0xC0.toByte, 0xFF.toByte,
      0xD9.toByte, 0x00, 0xFF.toByte)
    out.put(0xFF.toByte).put(0xFE.toByte).putShort((2 + com.length).toShort).put(com)
    // DQT stub: table 0, 8 zero coefficients (decoder skips by length)
    out.put(0xFF.toByte).put(0xDB.toByte).putShort(11).put(0.toByte)
      .put(new Array[Byte](8))
    // SOF0 (baseline) / SOF2 (progressive)
    out.put(0xFF.toByte).put(if (progressive) 0xC2.toByte else 0xC0.toByte)
      .putShort((8 + 3 * channels).toShort)
      .put(8.toByte).putShort(height.toShort).putShort(width.toShort)
      .put(channels.toByte)
    var c = 0
    while (c < channels) {
      out.put((c + 1).toByte).put(0x11.toByte).put(0.toByte); c += 1
    }
    out.put(0xFF.toByte).put(0xD9.toByte) // EOI
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  /** Signature + CRC-correct IHDR + a filler IDAT + IEND. */
  def synthPng(width: Int, height: Int, bitDepth: Int,
      colorType: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    PNG_SIG ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array[Byte](0x78, 0x01, 0x00, 0x00)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** The deterministic synth rule the `mm_decode_image` oracle mirrors:
    * even ids are JPEG, odd are PNG; every parameter is a fixed function
    * of (id, byte length of the text). */
  def synthFromDoc(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    if (id % 2 == 0) {
      val w = n % 317 + 1
      val h = n % 211 + 1
      val ch = if (id % 6 == 0) 1 else 3
      synthJpeg(w, h, ch, progressive = id % 4 == 0)
    } else {
      val w = n % 509 + 1
      val h = n % 331 + 1
      val ct = Array(0, 2, 3, 4, 6)(java.lang.Math.floorMod(id, 5L).toInt)
      val bd = if (id % 3 == 0 && ct != 3) 16 else 8
      synthPng(w, h, bd, ct)
    }
  }

  def image_meta(c: Column): Column =
    GraftSqlBridge.column(ImageMeta(GraftSqlBridge.expression(c)))

  def image_synth(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynth(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  // ------------------------------------------------------- BMP pixel path
  //
  // The REAL pixel kernels (decode → stats / nearest-neighbor resize)
  // work on 24-bit uncompressed BMP (Windows BITMAPINFOHEADER — a public
  // byte layout simple enough to carry real pixels with no image
  // library): 14-byte file header, 40-byte info header, BGR rows padded
  // to 4 bytes, bottom-up when height is positive. PNG rides the full
  // decode above (inflate + unfilter, all depths/color types, Adam7);
  // JPEG — baseline AND progressive (SOF0/SOF2) — rides JpegCodec's
  // entropy decode. All pixel paths carry exact integer oracles.

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def leS32(b: Array[Byte], i: Int): Int = leU32(b, i).toInt

  /** Parsed 24bpp BMP: logical top-down pixel accessor. Returns null on
    * anything but an uncompressed BITMAPINFOHEADER 24-bit file whose
    * pixel array is fully present. */
  private final class Bmp(val bytes: Array[Byte], val width: Int,
      val height: Int, pixelOff: Int, bottomUp: Boolean, stride: Int) {
    /** Byte index of the BLUE sample of logical (x, y), y top-down. */
    def at(x: Int, y: Int): Int = {
      val row = if (bottomUp) height - 1 - y else y
      pixelOff + row * stride + x * 3
    }
  }

  private def parseBmp(b: Array[Byte]): Bmp = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val pixelOff = leU32(b, 10)
    val hdrSize = leU32(b, 14)
    if (hdrSize < 40) return null // BITMAPCOREHEADER etc. not supported
    val w = leS32(b, 18)
    val hRaw = leS32(b, 22)
    if (leU16(b, 26) != 1) return null          // planes
    if (leU16(b, 28) != 24) return null         // 24bpp only
    if (leU32(b, 30) != 0L) return null         // BI_RGB (uncompressed)
    val bottomUp = hRaw >= 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || w > (1 << 20) || h > (1 << 20)) return null
    val stride = (w * 3 + 3) & ~3
    if (pixelOff < 54 || pixelOff + stride.toLong * h > b.length) return null
    new Bmp(b, w, h, pixelOff.toInt, bottomUp, stride)
  }

  val pixelStatsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("sum_a", LongType))) // null unless the source has alpha

  /** Exact integer channel sums over every pixel — integers so an
    * external oracle matches bit-for-bit with no float rounding pact.
    * Sniffs the payload: 24bpp BMP or 8-bit PNG (gray/RGB/gray+alpha/
    * RGBA — FULL decode through inflate + unfilter). Grayscale
    * replicates into r=g=b so downstream logic is channel-uniform. */
  /** Grayscale accessor over any full-pixel decoder here (JPEG, PNG at
    * any depth/color type, BMP): `g(x, y)` = r+g+b (gray replicated ×3
    * so channel counts never skew the scale). Null for undecodable
    * bytes or formats without a pixel path (GIF/TIFF). Shared preamble
    * of the perceptual hashes. */
  private final class GrayView(val w: Int, val h: Int,
      val g: (Int, Int) => Long)

  private def grayView(bytes: Array[Byte]): GrayView = {
    if (bytes == null || bytes.length < 2) return null
    if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) {
      val img = JpegCodec.decodePixels(bytes)
      if (img == null) return null
      val w = img.width
      val s = img.samples
      val gray: (Int, Int) => Long =
        if (img.channels == 1) (x, y) => 3L * (s(y * w + x) & 0xFF)
        else (x, y) => {
          val i = (y * w + x) * 3
          (s(i) & 0xFF).toLong + (s(i + 1) & 0xFF) + (s(i + 2) & 0xFF)
        }
      new GrayView(w, img.height, gray)
    } else if (bytes.length >= 8 && bytes.take(8).sameElements(PNG_SIG)) {
      val png = decodePngPixels(bytes)
      if (png == null) return null
      val w = png.width
      val s = png.samples
      val bps = if (png.bitDepth == 16) 2 else 1
      def at(i: Int): Long =
        if (bps == 1) (s(i) & 0xFF).toLong
        else ((s(i * 2) & 0xFFL) << 8) | (s(i * 2 + 1) & 0xFFL)
      val gray: (Int, Int) => Long = png.channels match {
        case 1 => (x, y) => 3L * at(y * w + x)
        case 2 => (x, y) => 3L * at((y * w + x) * 2)
        case 3 => (x, y) => {
          val i = (y * w + x) * 3; at(i) + at(i + 1) + at(i + 2)
        }
        case _ => (x, y) => {
          val i = (y * w + x) * 4; at(i) + at(i + 1) + at(i + 2)
        }
      }
      new GrayView(w, png.height, gray)
    } else {
      val bmp = parseBmp(bytes)
      if (bmp == null) return null
      val gray: (Int, Int) => Long = (x, y) => {
        val i = bmp.at(x, y)
        (bmp.bytes(i) & 0xFF).toLong + (bmp.bytes(i + 1) & 0xFF) +
          (bmp.bytes(i + 2) & 0xFF)
      }
      new GrayView(bmp.width, bmp.height, gray)
    }
  }

  /** dHash kernel — see [[ImageDhash]]. Null (not a throw) for
    * undecodable bytes, GIF/TIFF, or images under the 9×8 grid. */
  def dhashInternal(bytes: Array[Byte]): java.lang.Long = {
    val gv = grayView(bytes)
    if (gv == null) return null
    val w = gv.w; val h = gv.h; val gray = gv.g
    if (w < 9 || h < 8) return null
    val s = new Array[Long](72)
    val n = new Array[Long](72)
    var y = 0
    while (y < h) {
      val row = (y * 8 / h) * 9
      var x = 0
      while (x < w) {
        val idx = row + x * 9 / w
        s(idx) += gray(x, y)
        n(idx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val a = cy * 9 + cx
        // darker-than-right-neighbor, unequal cell sizes handled by
        // cross-multiplication (pure integer, no division)
        if (s(a) * n(a + 1) < s(a + 1) * n(a)) hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Fixed-point DCT constants for [[phashInternal]] — shared with the
    * SQL oracle generator so both engines multiply the SAME integer
    * cosine table (a float DCT would be bit-unstable across libm
    * implementations; a hash whose low bits depend on the host's cos()
    * cannot anchor a distributed dedup join). Grid 16×8, 8×8 output,
    * weights `round(cos((2i+1)·k·π/(2N)) · 4096)`. */
  val PHASH_W = 16
  val PHASH_H = 8
  val PHASH_SCALE = 4096L
  val phashCosX: Array[Array[Long]] = Array.tabulate(PHASH_W, 8)((x, u) =>
    Math.round(Math.cos((2 * x + 1) * u * Math.PI / (2 * PHASH_W)) * PHASH_SCALE))
  val phashCosY: Array[Array[Long]] = Array.tabulate(PHASH_H, 8)((y, v) =>
    Math.round(Math.cos((2 * y + 1) * v * Math.PI / (2 * PHASH_H)) * PHASH_SCALE))

  /** pHash kernel — see [[ImagePhash]]. Average-pool the grayscale into
    * a 16×8 grid (cell value = floor(sum·64 / count) — the ×64 keeps
    * six fractional bits through the integer division), run a SEPARABLE
    * fixed-point DCT-II (row pass then column pass against the shared
    * integer cosine tables — all intermediates bounded well inside
    * int64), take the 8×8 low-frequency block, and set bit v·8+u
    * (1..63; DC position stays 0) iff its coefficient exceeds the
    * median of the 63 AC coefficients (= the 32nd smallest — strict
    * `>`, so ties break identically everywhere). Null for undecodable
    * bytes or images under the 16×8 grid. */
  def phashInternal(bytes: Array[Byte]): java.lang.Long = {
    val gv = grayView(bytes)
    if (gv == null) return null
    val w = gv.w; val h = gv.h; val gray = gv.g
    if (w < PHASH_W || h < PHASH_H) return null
    val s = new Array[Long](PHASH_W * PHASH_H)
    val n = new Array[Long](PHASH_W * PHASH_H)
    var y = 0
    while (y < h) {
      val row = (y * PHASH_H / h) * PHASH_W
      var x = 0
      while (x < w) {
        val idx = row + x * PHASH_W / w
        s(idx) += gray(x, y)
        n(idx) += 1
        x += 1
      }
      y += 1
    }
    // g ≤ 765·64 ≈ 4.9e4; row pass ≤ 16·4.9e4·4096 ≈ 3.2e9;
    // column pass ≤ 8·3.2e9·4096 ≈ 1.1e14 — no overflow anywhere
    val g = new Array[Long](PHASH_W * PHASH_H)
    var i = 0
    while (i < g.length) { g(i) = s(i) * 64 / n(i); i += 1 }
    val r = new Array[Long](8 * PHASH_H) // r(u·H + cy)
    var cy = 0
    while (cy < PHASH_H) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var x = 0
        while (x < PHASH_W) {
          acc += g(cy * PHASH_W + x) * phashCosX(x)(u)
          x += 1
        }
        r(u * PHASH_H + cy) = acc
        u += 1
      }
      cy += 1
    }
    val coef = new Array[Long](64) // coef(v·8 + u)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var yy = 0
        while (yy < PHASH_H) {
          acc += r(u * PHASH_H + yy) * phashCosY(yy)(v)
          yy += 1
        }
        coef(v * 8 + u) = acc
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val median = ac(31)
    var hash = 0L
    i = 1
    while (i < 64) {
      if (coef(i) > median) hash |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def pixelStatsInternal(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 2) return null
    if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) {
      // JPEG (baseline or progressive): full entropy decode, gray replicated
      val img = JpegCodec.decodePixels(bytes)
      if (img == null) return null
      var sr = 0L; var sg = 0L; var sb = 0L
      val s = img.samples
      if (img.channels == 1) {
        var i = 0
        while (i < s.length) {
          val v = (s(i) & 0xFF).toLong; sr += v; sg += v; sb += v; i += 1
        }
      } else {
        var i = 0
        while (i < s.length) {
          sr += s(i) & 0xFF; sg += s(i + 1) & 0xFF; sb += s(i + 2) & 0xFF
          i += 3
        }
      }
      return InternalRow(img.width, img.height,
        img.width.toLong * img.height, sr, sg, sb, null)
    }
    if (bytes.length >= 8 && bytes.take(8).sameElements(PNG_SIG)) {
      val png = decodePngPixels(bytes)
      if (png == null) return null
      var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
      val s = png.samples
      val ch = png.channels
      val bps = if (png.bitDepth == 16) 2 else 1
      // sample accessor: one byte below depth 16 (sub-byte depths are
      // already unpacked to RAW code values), big-endian u16 at 16 —
      // sums are over the NATIVE sample range (0..2^depth−1)
      def at(i: Int): Long =
        if (bps == 1) (s(i) & 0xFF).toLong
        else ((s(i * 2) & 0xFFL) << 8) | (s(i * 2 + 1) & 0xFFL)
      val nSamples = s.length / bps
      var i = 0
      while (i < nSamples) {
        ch match {
          case 1 =>
            val v = at(i); sr += v; sg += v; sb += v
          case 2 =>
            val v = at(i); sr += v; sg += v; sb += v
            sa += at(i + 1)
          case 3 =>
            sr += at(i); sg += at(i + 1); sb += at(i + 2)
          case _ =>
            sr += at(i); sg += at(i + 1); sb += at(i + 2)
            sa += at(i + 3)
        }
        i += ch
      }
      val hasAlpha = ch == 2 || ch == 4
      return InternalRow(png.width, png.height,
        png.width.toLong * png.height, sr, sg, sb,
        if (hasAlpha) sa else null)
    }
    if (GifCodec.isGif(bytes)) return GifCodec.pixelStats(bytes)
    if (TiffCodec.isTiff(bytes)) return TiffCodec.pixelStats(bytes)
    val bmp = parseBmp(bytes)
    if (bmp == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < bmp.height) {
      var x = 0
      while (x < bmp.width) {
        val i = bmp.at(x, y)
        sb += bmp.bytes(i) & 0xFF
        sg += bmp.bytes(i + 1) & 0xFF
        sr += bmp.bytes(i + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    InternalRow(bmp.width, bmp.height, bmp.width.toLong * bmp.height,
      sr, sg, sb, null)
  }

  private def writeBmp(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val size = 54 + stride * h
    val out = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h) // positive height: bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // first stored row is logical bottom
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, row)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      row -= 1
    }
    out.array()
  }

  /** Deterministic gradient BMP the `mm_image_resize` oracle mirrors:
    * dims from the text's byte length, channel values are fixed affine
    * functions of (x, y, id) taken mod 256 with FLOOR semantics
    * (`floorMod`, always in [0, 255]) — sign-following `%` would wrap
    * negative ids through `.toByte` into values the oracle's own
    * sign-following `%` doesn't produce. SQL mirrors must write
    * `((expr) % 256 + 256) % 256`. */
  def synthBmp(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 37 + 4
    val h = n % 23 + 3
    writeBmp(w, h, (x, y) => (
      java.lang.Math.floorMod(x * 13 + y * 17 + id * 3, 256L).toInt,
      java.lang.Math.floorMod(x * 7 + y * 11 + id * 2, 256L).toInt,
      java.lang.Math.floorMod(x * 3 + y * 5 + id, 256L).toInt))
  }

  /** REAL nearest-neighbor resize: source pixel of output (x, y) is
    * (floor(x·srcW/outW), floor(y·srcH/outH)) in logical top-down
    * space — up- and down-scaling both work. Output format matches the
    * input: 24bpp BMP → BMP, decodable 8-bit PNG → PNG (re-encoded via
    * [[encodePng]], filter 0); null for anything the decoders refuse. */
  def resizeNnInternal(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    if (outW <= 0 || outH <= 0 || outW > (1 << 14) || outH > (1 << 14)) return null
    if (bytes != null && bytes.length >= 2 &&
        (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) {
      // JPEG input: full decode, NN resample, re-emit LOSSLESSLY as PNG
      // (a JPEG re-encode would quantize a second time; the resize
      // output should carry exactly the resampled pixels)
      val img = JpegCodec.decodePixels(bytes)
      if (img == null) return null
      val ch = img.channels
      if (outW.toLong * outH * ch > MAX_SAMPLES) return null
      val out = new Array[Byte](outW * outH * ch)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * img.height / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * img.width / outW).toInt
          val s = (sy * img.width + sx) * ch
          val d = (y * outW + x) * ch
          var c = 0
          while (c < ch) { out(d + c) = img.samples(s + c); c += 1 }
          x += 1
        }
        y += 1
      }
      return encodePng(outW, outH, if (ch == 1) 0 else 2, out, _ => 0)
    }
    if (bytes != null && bytes.length >= 8 && bytes.take(8).sameElements(PNG_SIG)) {
      val png = decodePngPixels(bytes)
      if (png == null) return null
      val pxBytes = png.channels * (if (png.bitDepth == 16) 2 else 1)
      if (outW.toLong * outH * pxBytes > MAX_SAMPLES) return null
      val out = new Array[Byte](outW * outH * pxBytes)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * png.height / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * png.width / outW).toInt
          val s = (sy * png.width + sx) * pxBytes
          val d = (y * outW + x) * pxBytes
          var c = 0
          while (c < pxBytes) { out(d + c) = png.samples(s + c); c += 1 }
          x += 1
        }
        y += 1
      }
      // palette input resizes to truecolor output (indices were already
      // expanded to RGB; re-quantizing to a palette would lose pixels);
      // depth is preserved (16-bit in → 16-bit out)
      val outCt = if (png.colorType == 3) 2 else png.colorType
      return encodePng(outW, outH, outCt, out, _ => 0, null, png.bitDepth)
    }
    val bmp = parseBmp(bytes)
    if (bmp == null) return null
    writeBmp(outW, outH, (x, y) => {
      val sx = (x.toLong * bmp.width / outW).toInt
      val sy = (y.toLong * bmp.height / outH).toInt
      val i = bmp.at(sx, sy)
      ((bmp.bytes(i + 2) & 0xFF), (bmp.bytes(i + 1) & 0xFF), (bmp.bytes(i) & 0xFF))
    })
  }

  /** Deterministic pixel-carrying PNG the `mm_png_*` oracles mirror:
    * dims from the text's byte length, color type cycles gray / RGB /
    * gray+alpha / RGBA by id, and sample value for channel slot c is
    * `floorMod(x·(3+2c) + y·(5+2c) + id·(c+1), 256)` — the same FLOOR
    * contract as [[synthBmp]], so SQL mirrors write
    * `((expr) % 256 + 256) % 256`. Filters cycle all five types. */
  def synthPngPixels(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 29 + 4
    val h = n % 19 + 3
    val ct = Array(0, 2, 4, 6)(java.lang.Math.floorMod(id, 4L).toInt)
    val ch = ct match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
    val samples = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          samples((y * w + x) * ch + c) = java.lang.Math.floorMod(
            x.toLong * (3 + 2 * c) + y.toLong * (5 + 2 * c) + id * (c + 1),
            256L).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(w, h, ct, samples,
      yy => java.lang.Math.floorMod(yy + id, 5L).toInt)
  }

  /** Deterministic PALETTE PNG (color type 3) the `mm_png_palette`
    * oracle mirrors: palette entry e is
    * `(floorMod(e·5 + id·7, 256), floorMod(e·11 + id·3, 256),
    * floorMod(e·13 + id, 256))` and pixel (x, y) holds index
    * `floorMod(x·3 + y·5 + id, paletteSize)` with paletteSize =
    * floorMod(id, 15) + 2 — so SQL oracles compose the two affine
    * rules and never touch a byte. Filters cycle all five types. */
  def synthPngPalette(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 31 + 4
    val h = n % 17 + 3
    val entries = java.lang.Math.floorMod(id, 15L).toInt + 2
    val plte = new Array[Byte](entries * 3)
    var e = 0
    while (e < entries) {
      plte(e * 3) = java.lang.Math.floorMod(e * 5L + id * 7, 256L).toByte
      plte(e * 3 + 1) = java.lang.Math.floorMod(e * 11L + id * 3, 256L).toByte
      plte(e * 3 + 2) = java.lang.Math.floorMod(e * 13L + id, 256L).toByte
      e += 1
    }
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        idx(y * w + x) =
          java.lang.Math.floorMod(x * 3L + y * 5L + id, entries.toLong).toByte
        x += 1
      }
      y += 1
    }
    encodePng(w, h, 3, idx,
      yy => java.lang.Math.floorMod(yy + id, 5L).toInt, plte)
  }

  /** The Adam7-INTERLACED twin of [[synthPngPixels]] — same per-pixel
    * affine value rule (interlacing only reorders scanlines on the
    * wire, so the `mm_png_interlaced` oracle is the same formula), but
    * dims go down to 1×1 so EMPTY passes stay exercised. */
  def synthPngInterlaced(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 27 + 1
    val h = n % 21 + 1
    val ct = Array(0, 2, 4, 6)(java.lang.Math.floorMod(id, 4L).toInt)
    val ch = ct match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
    val samples = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          samples((y * w + x) * ch + c) = java.lang.Math.floorMod(
            x.toLong * (3 + 2 * c) + y.toLong * (5 + 2 * c) + id * (c + 1),
            256L).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(w, h, ct, samples,
      yy => java.lang.Math.floorMod(yy + id, 5L).toInt, null, 8,
      interlaced = true)
  }

  def image_synth_png(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthPng(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  /** SUB-BYTE gray PNG (depth cycling 1/2/4 by id, Adam7 on even
    * ids): raw code value `floorMod(x·3 + y·5 + id, 2^depth)` per
    * pixel — the `mm_png_tiny` oracle mirrors the same rule. */
  def synthPngTiny(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 33 + 1
    val h = n % 19 + 1
    val depth = Array(1, 2, 4)(java.lang.Math.floorMod(id, 3L).toInt)
    val maxv = 1 << depth
    val samples = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        samples(y * w + x) =
          java.lang.Math.floorMod(x * 3L + y * 5L + id, maxv.toLong).toByte
        x += 1
      }
      y += 1
    }
    encodePng(w, h, 0, samples,
      yy => java.lang.Math.floorMod(yy + id, 5L).toInt, null, depth,
      interlaced = java.lang.Math.floorMod(id, 2L) == 0L)
  }

  def image_synth_png_i7(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthPngI7(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_synth_png_tiny(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthPngTiny(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  /** Deterministic 16-BIT PNG (gray or RGB by id parity) the
    * `mm_png_deep` oracle mirrors: sample (x, y, channel c) is
    * `floorMod(x·(31+2c) + y·(47+2c) + id·(c+1), 65536)` stored
    * big-endian per the PNG network byte order. */
  def synthPng16(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 23 + 4
    val h = n % 15 + 3
    val ct = if (java.lang.Math.floorMod(id, 2L) == 0L) 0 else 2
    val ch = if (ct == 0) 1 else 3
    val samples = new Array[Byte](w * h * ch * 2)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          val v = java.lang.Math.floorMod(
            x.toLong * (31 + 2 * c) + y.toLong * (47 + 2 * c) + id * (c + 1),
            65536L).toInt
          val o = ((y * w + x) * ch + c) * 2
          samples(o) = (v >> 8).toByte
          samples(o + 1) = v.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(w, h, ct, samples,
      yy => java.lang.Math.floorMod(yy + id, 5L).toInt, null, 16)
  }

  def image_synth_png_pal(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthPngPal(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_synth_png16(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthPng16(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_synth_jpeg_px(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthJpegPx(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_synth_jpeg_prog(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthJpegProg(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_synth_jpeg420(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthJpeg420(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_synth_bmp(id: Column, text: Column): Column =
    GraftSqlBridge.column(ImageSynthBmp(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))

  def image_pixel_stats(c: Column): Column =
    GraftSqlBridge.column(ImagePixelStats(GraftSqlBridge.expression(c)))

  def image_dhash(c: Column): Column =
    GraftSqlBridge.column(ImageDhash(GraftSqlBridge.expression(c)))

  def image_phash(c: Column): Column =
    GraftSqlBridge.column(ImagePhash(GraftSqlBridge.expression(c)))

  def image_resize_nn(c: Column, w: Column, h: Column): Column =
    GraftSqlBridge.column(ImageResizeNn(GraftSqlBridge.expression(c),
      GraftSqlBridge.expression(w), GraftSqlBridge.expression(h)))
}
