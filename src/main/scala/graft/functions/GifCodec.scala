package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL GIF decode/encode for multimodal binary columns — the last
  * widely-crawled image container missing from the format matrix
  * (BMP/PNG/JPEG exist). Everything is the public GIF89a layout
  * (CompuServe GIF89a spec; LZW per its Appendix F): header + logical
  * screen descriptor, global/local color tables, graphic control
  * extensions (transparency + disposal), sub-rectangle frames composed
  * onto the logical screen, interlaced row order, and the variable-width
  * LSB-first LZW code stream — decode AND a real dictionary-building
  * encoder, so frame sampling re-emits a valid GIF. No image library:
  * GIF's LZW is ~100 lines of integer code.
  *
  * Native Catalyst expressions (same contract as [[ImageCodec]]): pure
  * projections inside whole-stage codegen, malformed input → null, a
  * 64 MiB decoded-pixel bound so a crafted tiny payload can't balloon
  * task memory.
  */
case class GifMeta(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = GifCodec.metaSchema
  override def prettyName: String = "gif_meta"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GifCodec.metaInternal(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifCodec.metaInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): GifMeta =
    copy(child = newChild)
}

/** `(id, utf8 content) → real animated GIF bytes` — deterministic
  * synthesizer for oracle-checked round-trips: dims from the content's
  * byte length, an 8-entry global color table and per-pixel indices
  * affine in (x, y, frame, id) with floor-mod semantics, 1–3 frames,
  * alternate frames interlaced (wire order only — decoded pixels are
  * identical, so the oracle needs no interlace arithmetic). */
case class GifSynth(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gif_synth"
  override def nullSafeEval(id: Any, text: Any): Any =
    GifCodec.synthGif(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GifCodec.synthGif($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GifSynth =
    copy(left = newLeft, right = newRight)
}

/** `(gif bytes, k) → gif bytes` holding every k-th composed frame
  * (frames 0, k, 2k, …) — the animation analog of
  * [[VideoCodec]]'s frame sampling, re-emitting a VALID GIF through the
  * real LZW encoder. Frames are re-encoded against the global color
  * table when one covers every frame; otherwise each sampled frame
  * gets a local color table rebuilt from its composed pixels (null if
  * a composed frame exceeds 256 distinct colors — not representable as
  * a single GIF frame). */
case class GifFrameSample(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gif_frame_sample"
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any, k: Any): Any =
    GifCodec.frameSample(bytes.asInstanceOf[Array[Byte]], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = graft.functions.GifCodec.frameSample($b, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GifFrameSample =
    copy(left = newLeft, right = newRight)
}

object GifCodec {
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("palette_size", IntegerType),
    StructField("interlaced", BooleanType))) // true if ANY frame is

  /** Max total composed pixel bytes (64 MiB) across all frames — same
    * decompression-bomb bound as the PNG path. */
  private val MAX_PIXELS = 1 << 26

  /** Decoded GIF: per-frame COMPOSED canvas snapshots (w*h RGB bytes
    * each, top-down), plus the index-space view kept only when every
    * frame draws from the global color table with no transparency —
    * the exact-re-encode fast path. */
  final class GifImage(val width: Int, val height: Int,
      val palette: Array[Byte],            // GCT rgb triples (may be empty)
      val frames: Array[Array[Byte]],      // composed RGB, w*h*3 each
      val indexFrames: Array[Array[Byte]], // composed GCT indices, or null
      val anyInterlaced: Boolean)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  // ---------------------------------------------------------------- decode

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Full decode → composed frames; null on any malformation (bad
    * magic, truncated block, LZW code out of range, frame rect outside
    * the logical screen, pixel bound exceeded, no frames). */
  def decode(b: Array[Byte]): GifImage = {
    if (!isGif(b) || b.length < 13) return null
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w <= 0 || h <= 0) return null
    if (w.toLong * h * 3 > MAX_PIXELS) return null
    val packed = b(10) & 0xFF
    val bg = b(11) & 0xFF
    var i = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > b.length) return null
      gct = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
      i += 3 * n
    }
    // canvas state: RGB composed + (optionally) GCT-index composed
    val canvas = new Array[Byte](w * h * 3)
    var idxCanvas: Array[Byte] = new Array[Byte](w * h)
    val bgIdx = if (gct != null && bg * 3 + 2 < gct.length) bg else 0
    // restore-to-background, restricted to a sub-rectangle (the full
    // canvas at init; the frame rect for disposal method 2)
    def fillBackground(rx: Int, ry: Int, rw: Int, rh: Int): Unit = {
      if (gct != null) {
        var y = ry
        while (y < ry + rh) {
          var x = rx
          while (x < rx + rw) {
            val p = y * w + x
            canvas(p * 3) = gct(bgIdx * 3)
            canvas(p * 3 + 1) = gct(bgIdx * 3 + 1)
            canvas(p * 3 + 2) = gct(bgIdx * 3 + 2)
            if (idxCanvas != null) idxCanvas(p) = bgIdx.toByte
            x += 1
          }
          y += 1
        }
      }
    }
    fillBackground(0, 0, w, h)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val idxFrames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var anyInterlaced = false
    var transparentIdx = -1  // from the pending GCE, -1 = none
    var disposal = 0
    var totalPx = 0L      // LZW-decoded frame-rect pixels
    var storedBytes = 0L  // composed-canvas snapshot bytes actually kept
    while (i < b.length) {
      (b(i) & 0xFF) match {
        case 0x3B => // trailer
          if (frames.isEmpty) return null
          return new GifImage(w, h, if (gct == null) Array.emptyByteArray else gct,
            frames.toArray,
            if (idxCanvas != null) idxFrames.toArray else null, anyInterlaced)
        case 0x21 => // extension: label + sub-blocks
          if (i + 1 >= b.length) return null
          val label = b(i + 1) & 0xFF
          i += 2
          if (label == 0xF9) { // graphic control: one 4-byte sub-block
            if (i >= b.length || (b(i) & 0xFF) != 4 || i + 5 >= b.length)
              return null
            val gp = b(i + 1) & 0xFF
            disposal = (gp >> 2) & 7
            transparentIdx = if ((gp & 1) != 0) b(i + 4) & 0xFF else -1
            i += 5
          }
          // skip (remaining) sub-blocks to the 0x00 terminator
          var bs = if (i < b.length) b(i) & 0xFF else return null
          while (bs != 0) {
            i += 1 + bs
            if (i >= b.length) return null
            bs = b(i) & 0xFF
          }
          i += 1
        case 0x2C => // image descriptor
          if (i + 10 > b.length) return null
          val fx = u16le(b, i + 1); val fy = u16le(b, i + 3)
          val fw = u16le(b, i + 5); val fh = u16le(b, i + 7)
          val fp = b(i + 9) & 0xFF
          i += 10
          if (fw <= 0 || fh <= 0 || fx + fw > w || fy + fh > h) return null
          var pal = gct
          var localPal = false
          if ((fp & 0x80) != 0) {
            val n = 2 << (fp & 7)
            if (i + 3 * n > b.length) return null
            pal = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
            i += 3 * n
            localPal = true
          }
          if (pal == null) return null
          val interlaced = (fp & 0x40) != 0
          anyInterlaced ||= interlaced
          totalPx += fw.toLong * fh
          if (totalPx * 3 > MAX_PIXELS) return null
          if (i >= b.length) return null
          val mcs = b(i) & 0xFF
          i += 1
          if (mcs < 2 || mcs > 11) return null
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var bs = if (i < b.length) b(i) & 0xFF else return null
          while (bs != 0) {
            if (i + 1 + bs > b.length) return null
            data.write(b, i + 1, bs)
            i += 1 + bs
            if (i >= b.length) return null
            bs = b(i) & 0xFF
          }
          i += 1
          val indices = lzwDecode(data.toByteArray, mcs, fw * fh)
          if (indices == null) return null
          // interlace: wire rows land on passes 8k/8k+4/4k+2/2k+1
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](fh)
              var r = 0
              var pass = 0
              val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
              while (pass < 4) {
                var y = starts(pass)
                while (y < fh) { order(r) = y; r += 1; y += steps(pass) }
                pass += 1
              }
              wire => order(wire)
            }
          // compose onto the canvas (disposal handled after snapshot);
          // disposal 3 = restore-previous needs the pre-draw canvas
          val preDraw = if (disposal == 3) canvas.clone() else null
          val preDrawIdx =
            if (disposal == 3 && idxCanvas != null) idxCanvas.clone() else null
          val maxIdx = pal.length / 3
          var wireRow = 0
          while (wireRow < fh) {
            val y = rowOf(wireRow)
            var x = 0
            while (x < fw) {
              val ix = indices(wireRow * fw + x) & 0xFF
              if (ix != transparentIdx) {
                if (ix >= maxIdx) return null
                val p = (fy + y) * w + (fx + x)
                canvas(p * 3) = pal(ix * 3)
                canvas(p * 3 + 1) = pal(ix * 3 + 1)
                canvas(p * 3 + 2) = pal(ix * 3 + 2)
                if (idxCanvas != null) idxCanvas(p) = ix.toByte
              }
              x += 1
            }
            wireRow += 1
          }
          // the index-space view survives only GCT-drawn opaque frames
          if (localPal || transparentIdx >= 0) idxCanvas = null
          // bomb guard on what decode actually ALLOCATES: each stored
          // frame is a full w*h*3 canvas clone (+ w*h index clone) no
          // matter how small the frame rect, so a tiny GIF with a big
          // logical screen and thousands of 1x1 frames must trip here
          storedBytes += w.toLong * h * 3 +
            (if (idxCanvas != null) w.toLong * h else 0L)
          if (storedBytes > MAX_PIXELS) return null
          frames += canvas.clone()
          if (idxCanvas != null) idxFrames += idxCanvas.clone()
          if (disposal == 2) fillBackground(fx, fy, fw, fh)
          else if (disposal == 3 && preDraw != null) {
            System.arraycopy(preDraw, 0, canvas, 0, canvas.length)
            if (idxCanvas != null && preDrawIdx != null)
              System.arraycopy(preDrawIdx, 0, idxCanvas, 0, idxCanvas.length)
          }
          transparentIdx = -1
          disposal = 0
        case _ => return null
      }
    }
    null // ran off the end without a trailer
  }

  /** GIF LZW decode: variable-width LSB-first codes, CLEAR = 2^mcs,
    * EOI = CLEAR+1, table capped at 4096. Width growth is the spec's
    * "late change" as giflib implements it: the decoder shadows the
    * encoder's next-free-slot (which runs ONE ahead of the decoder's
    * own table, since the first post-clear code adds no entry) and
    * widens when that shadow exceeds 2^width — shadow ≡ next+1 here.
    * Returns exactly `expected` indices or null. */
  private[functions] def lzwDecode(data: Array[Byte], mcs: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outN = 0
    var next = eoi + 1
    var width = mcs + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var pos = 0
    val stack = new Array[Byte](4096)
    while (outN < expected) {
      while (nbits < width) {
        if (pos >= data.length) return null
        acc |= (data(pos) & 0xFFL) << nbits
        nbits += 8; pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (code == clear) {
        next = eoi + 1; width = mcs + 1; prev = -1
      } else if (code == eoi) {
        return null // EOI before the frame's pixels completed
      } else if (prev == -1) {
        // first code after clear: must be a literal
        if (code >= clear) return null
        out(outN) = code.toByte; outN += 1
        if (width < 12 && next + 1 > (1 << width)) width += 1
        prev = code
      } else {
        if (code > next || code == 4096) return null
        var sp = 0
        // KwKwK: code == next names the entry being defined —
        // expansion(prev) + firstChar(prev)
        var c = if (code == next) prev else code
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = c.toByte
        val extra = if (code == next) 1 else 0
        if (outN + sp + 1 + extra > expected) return null
        out(outN) = first; outN += 1
        var k = sp - 1
        while (k >= 0) { out(outN) = stack(k); outN += 1; k -= 1 }
        if (extra == 1) { out(outN) = first; outN += 1 }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
        }
        if (width < 12 && next + 1 > (1 << width)) width += 1
        prev = code
      }
    }
    out
  }

  /** Real LZW encoder (dictionary up to 4096, emits CLEAR + reset when
    * full) — the exact inverse of [[lzwDecode]]: width widens after a
    * table add makes the next free slot exceed 2^width. */
  private[functions] def lzwEncode(indices: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var width = mcs + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8
      }
    }
    // (prefixCode << 8 | byte) → code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    var cur = -1
    var i = 0
    while (i < indices.length) {
      val ch = indices(i) & 0xFF
      if (ch >= clear)
        throw new IllegalArgumentException(s"index $ch needs > $mcs bits")
      if (cur == -1) cur = ch
      else {
        val key = (cur << 8) | ch
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
            if (width < 12 && next > (1 << width)) width += 1
          } else {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1; width = mcs + 1
          }
          cur = ch
        }
      }
      i += 1
    }
    if (cur != -1) emit(cur)
    emit(eoi)
    if (nbits > 0) out.write((acc & 0xFF).toInt)
    out.toByteArray
  }

  // ---------------------------------------------------------------- encode

  /** Write a complete GIF89a: logical screen + GCT (padded to a power
    * of two), then one full-canvas frame per entry of `frames` (index
    * bytes, row-major), LZW-compressed; `interlaceOf(f)` selects wire
    * row order per frame. */
  def encodeGif(w: Int, h: Int, palette: Array[Byte],
      frames: Array[Array[Byte]], interlaceOf: Int => Boolean): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.nonEmpty, "palette rgb triples")
    val nColors = palette.length / 3
    var bits = 1
    while ((1 << bits) < nColors) bits += 1
    if (bits > 8) throw new IllegalArgumentException("palette > 256")
    val mcs = math.max(2, bits)
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    w16(w); w16(h)
    // GCT present, color resolution = bits, GCT size = 2^(s+1) entries
    val sizeField = { var s = 0; while ((2 << s) < (1 << bits)) s += 1; s }
    out.write(0x80 | ((bits - 1) << 4) | sizeField)
    out.write(0); out.write(0) // bg index, aspect
    out.write(palette, 0, palette.length)
    var pad = (2 << sizeField) * 3 - palette.length
    while (pad > 0) { out.write(0); pad -= 1 }
    var f = 0
    while (f < frames.length) {
      val idx = frames(f)
      require(idx.length == w * h, s"frame $f: ${idx.length} != ${w * h}")
      out.write(0x2C); w16(0); w16(0); w16(w); w16(h)
      val interlaced = interlaceOf(f)
      out.write(if (interlaced) 0x40 else 0x00)
      out.write(mcs)
      val wire =
        if (!interlaced) idx
        else {
          val o = new Array[Byte](idx.length)
          var r = 0
          val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
          var pass = 0
          while (pass < 4) {
            var y = starts(pass)
            while (y < h) {
              System.arraycopy(idx, y * w, o, r * w, w); r += 1; y += steps(pass)
            }
            pass += 1
          }
          o
        }
      val lzw = lzwEncode(wire, mcs)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3B)
    out.toByteArray
  }

  // ----------------------------------------------------------------- stats

  /** (width, height, n_frames, palette_size, interlaced) or null. */
  def metaInternal(b: Array[Byte]): InternalRow = {
    val g = decode(b)
    if (g == null) null
    else InternalRow(g.width, g.height, g.frames.length,
      g.palette.length / 3, g.anyInterlaced)
  }

  /** Channel sums over ALL composed frames — the GIF branch of
    * [[ImageCodec.pixelStatsInternal]]'s schema: n_px counts pixels
    * across frames, sum_a is null (GIF has no alpha channel; a
    * transparent pixel shows the prior canvas). */
  def pixelStats(b: Array[Byte]): InternalRow = {
    val g = decode(b)
    if (g == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var f = 0
    while (f < g.frames.length) {
      val fr = g.frames(f)
      var i = 0
      while (i < fr.length) {
        sr += fr(i) & 0xFF; sg += fr(i + 1) & 0xFF; sb += fr(i + 2) & 0xFF
        i += 3
      }
      f += 1
    }
    InternalRow(g.width, g.height,
      g.width.toLong * g.height * g.frames.length, sr, sg, sb, null)
  }

  /** Every k-th composed frame re-encoded as a valid GIF (see
    * [[GifFrameSample]]); null for invalid input or k < 1. */
  def frameSample(b: Array[Byte], k: Int): Array[Byte] = {
    if (k < 1) return null
    val g = decode(b)
    if (g == null) return null
    val keep = g.frames.indices.filter(_ % k == 0).toArray
    if (g.indexFrames != null && g.palette.nonEmpty) {
      // exact path: original GCT indices survive composition
      encodeGif(g.width, g.height, g.palette,
        keep.map(g.indexFrames(_)), _ => false)
    } else {
      // rebuild a palette per sampled GIF from the composed RGB frames
      val colorIdx = new java.util.LinkedHashMap[Integer, Integer]()
      keep.foreach { fi =>
        val fr = g.frames(fi)
        var i = 0
        while (i < fr.length) {
          val c = ((fr(i) & 0xFF) << 16) | ((fr(i + 1) & 0xFF) << 8) |
            (fr(i + 2) & 0xFF)
          if (!colorIdx.containsKey(c)) {
            if (colorIdx.size == 256) return null
            colorIdx.put(c, colorIdx.size)
          }
          i += 3
        }
      }
      val pal = new Array[Byte](colorIdx.size * 3)
      colorIdx.forEach { (c, j) =>
        pal(j * 3) = ((c >> 16) & 0xFF).toByte
        pal(j * 3 + 1) = ((c >> 8) & 0xFF).toByte
        pal(j * 3 + 2) = (c & 0xFF).toByte
      }
      val idxFrames = keep.map { fi =>
        val fr = g.frames(fi)
        val ix = new Array[Byte](fr.length / 3)
        var i = 0
        while (i < ix.length) {
          val c = ((fr(i * 3) & 0xFF) << 16) | ((fr(i * 3 + 1) & 0xFF) << 8) |
            (fr(i * 3 + 2) & 0xFF)
          ix(i) = colorIdx.get(c).intValue().toByte
          i += 1
        }
        ix
      }
      encodeGif(g.width, g.height, pal, idxFrames, _ => false)
    }
  }

  // ------------------------------------------------------------ synthesis

  /** Deterministic animated GIF the oracle mirrors analytically:
    * w = n%21+4, h = n%11+3 (n = content byte length),
    * frames = floorMod(id,3)+1, an 8-color GCT with
    * pal[j] = ((j*31+id) fm 256, (j*57+id*2) fm 256, (j*89+id*3) fm 256),
    * index(x,y,f) = floorMod(x*3 + y*5 + f*7 + id, 8). Frames are
    * full-canvas; frame f is interlaced when floorMod(id+f,2)=1 (wire
    * order only — composition is unaffected). */
  def synthGif(id: Long, text: UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 21 + 4
    val h = n % 11 + 3
    val nf = java.lang.Math.floorMod(id, 3L).toInt + 1
    val pal = new Array[Byte](24)
    var j = 0
    while (j < 8) {
      pal(j * 3) = java.lang.Math.floorMod(j * 31 + id, 256L).toByte
      pal(j * 3 + 1) = java.lang.Math.floorMod(j * 57 + id * 2, 256L).toByte
      pal(j * 3 + 2) = java.lang.Math.floorMod(j * 89 + id * 3, 256L).toByte
      j += 1
    }
    val frames = Array.tabulate(nf) { f =>
      val ix = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          ix(y * w + x) =
            java.lang.Math.floorMod(x * 3 + y * 5 + f * 7 + id, 8L).toByte
          x += 1
        }
        y += 1
      }
      ix
    }
    encodeGif(w, h, pal, frames,
      f => java.lang.Math.floorMod(id + f, 2L) == 1L)
  }

  // ---------------------------------------------------------- Column API

  def gif_meta(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(GifMeta(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))
  def gif_synth(id: Column, text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(GifSynth(
      org.apache.spark.sql.GraftSqlBridge.expression(id),
      org.apache.spark.sql.GraftSqlBridge.expression(text)))
  def gif_frame_sample(c: Column, k: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(GifFrameSample(
      org.apache.spark.sql.GraftSqlBridge.expression(c),
      org.apache.spark.sql.GraftSqlBridge.expression(k)))
}
