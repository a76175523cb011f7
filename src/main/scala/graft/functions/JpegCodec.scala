package graft.functions

/** BASELINE JPEG entropy codec — the real thing, no image library:
  * marker segment walk, DQT quantization tables, DHT Huffman tables
  * (read from the stream, so ANY baseline 4:4:4 / grayscale JPEG
  * decodes, not just this repo's), byte-stuffed entropy-coded data,
  * restart markers, DC DPCM + AC run/size decoding through the zigzag,
  * dequantization, a double-precision IDCT per 8×8 block, and JFIF
  * YCbCr→RGB with a FIXED deterministic rounding (`floor(x + 0.5)`,
  * clamped) so an external SQL oracle can reproduce the conversion
  * bit-for-bit. All byte layouts are public (ITU-T T.81; JFIF 1.02).
  *
  * Scope: sequential baseline (SOF0) AND progressive (SOF2 — multi-
  * scan spectral selection + successive approximation, DC/AC first and
  * refinement scans, EOBn end-of-band runs), 8-bit samples, 1
  * component (grayscale) or 3 components (YCbCr) with any
  * sampling-factor mix in {1,2}² — 4:4:4, 4:2:2, 4:2:0, 4:4:0;
  * subsampled chroma is replicate-upsampled. Arithmetic-coded,
  * lossless, hierarchical, 12-bit, and factor-4 streams return null —
  * robustness, not a crash; the header path
  * ([[ImageCodec.decodeMetaInternal]]) still reports their dimensions.
  *
  * Exactness: JPEG is lossy in general, but a block-constant image
  * (every 8×8 block one value) survives the DCT→quantize→IDCT
  * round-trip EXACTLY under a flat (all-ones) quantization table: the
  * forward transform of a constant block is a lone DC coefficient
  * 8·(v−128) (every AC basis sums to zero), and the inverse recovers v
  * precisely. The [[synthJpegPixels]] generator exploits this so the
  * `mm_jpeg_pixel_stats` gate is hash-exact against an analytic SQL
  * oracle while the decoder stays fully general — arbitrary-content
  * round-trips are spec-bounded (|error| ≤ 1 per sample at flat
  * quantization) instead.
  */
object JpegCodec {

  /** Decoded image: 1 (gray) or 3 (RGB) interleaved byte samples. */
  final class Image(val width: Int, val height: Int, val channels: Int,
      val samples: Array[Byte])

  private val MAX_DIM = 1 << 14

  /** natural block index → zigzag position (inverse of [[ZIGZAG]]). */
  private lazy val ZIG_OF: Array[Int] = {
    val inv = new Array[Int](64)
    var z = 0
    while (z < 64) { inv(ZIGZAG(z)) = z; z += 1 }
    inv
  }

  /** zigzag position → natural block index (row-major). */
  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT/FDCT basis: cos((2x+1)uπ/16) with the C(0)=1/√2 normalization
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val CNORM: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ------------------------------------------------------------ Huffman

  /** Canonical JPEG Huffman table (T.81 Annex C): `bits(i)` codes of
    * length i+1, symbol values in canonical order. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** −1 on invalid code / exhausted input. */
    def decode(r: BitReader): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        val bit = r.nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        len += 1
        if (maxcode(len) >= 0 && code <= maxcode(len))
          return vals(valptr(len) + code - mincode(len))
      }
      -1
    }
  }

  /** MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    * any real marker ends the stream (callers handle RSTn
    * explicitly at aligned restart boundaries). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xFF
          if (m != 0x00) { pos -= 1; return -1 } // a marker: rewind to FF
          pos += 1 // stuffed zero: the data byte is 0xFF
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val bit = nextBit(); if (bit < 0) return Int.MinValue
        v = (v << 1) | bit; i += 1
      }
      v
    }
    def align(): Unit = cnt = 0
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ------------------------------------------------------------- decode

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** Full baseline decode → [[Image]] (gray or RGB) or null. */
  def decodePixels(b: Array[Byte]): Image = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var dri = 0
    var width = 0; var height = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compTq: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var progressive = false
    var coefs: Array[Array[Int]] = null // per comp, zigzag per block (SOF2)
    var mcusX = 0; var mcusY = 0
    var scansDone = 0
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      var m = b(i + 1) & 0xFF
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF }
      i += 2
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        // standalone
      } else if (m == 0xD9) {
        // EOI: for progressive, all accumulated scans are complete here;
        // for baseline (single-scan) reaching EOI means no SOS was seen
        if (progressive && scansDone > 0)
          return finishProgressive(width, height, nComp, compTq, compH,
            compV, mcusX, mcusY, quant, coefs)
        return null
      } else {
        if (i + 1 >= b.length) return null
        val segLen = u16(b, i)
        if (segLen < 2 || i + segLen > b.length) return null
        m match {
          case 0xDB => // DQT: one or more (PqTq, 64/128 bytes) entries
            var j = i + 2
            while (j < i + segLen) {
              val pq = (b(j) & 0xF0) >> 4
              val tq = b(j) & 0x0F
              if (tq > 3) return null
              if (pq != 0) return null // 8-bit tables only (baseline)
              if (j + 1 + 64 > i + segLen) return null
              quant(tq) = Array.tabulate(64)(k => b(j + 1 + k) & 0xFF)
              j += 65
            }
          case 0xC4 => // DHT: one or more (TcTh, 16 counts, vals) entries
            var j = i + 2
            while (j < i + segLen) {
              val tc = (b(j) & 0xF0) >> 4
              val th = b(j) & 0x0F
              if (tc > 1 || th > 3) return null
              if (j + 17 > i + segLen) return null
              val bits = Array.tabulate(16)(k => b(j + 1 + k) & 0xFF)
              val nv = bits.sum
              if (nv == 0 || nv > 256 || j + 17 + nv > i + segLen) return null
              val vals = Array.tabulate(nv)(k => b(j + 17 + k) & 0xFF)
              if (tc == 0) huffDc(th) = new Huff(bits, vals)
              else huffAc(th) = new Huff(bits, vals)
              j += 17 + nv
            }
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            progressive = m == 0xC2
            if (segLen < 8) return null
            if ((b(i + 2) & 0xFF) != 8) return null // 8-bit samples
            height = u16(b, i + 3); width = u16(b, i + 5)
            nComp = b(i + 7) & 0xFF
            if (width <= 0 || height <= 0 || width > MAX_DIM || height > MAX_DIM)
              return null
            if (nComp != 1 && nComp != 3) return null
            if (segLen < 8 + 3 * nComp) return null
            compId = new Array[Int](nComp)
            compTq = new Array[Int](nComp)
            compH = new Array[Int](nComp)
            compV = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = b(i + 8 + 3 * c) & 0xFF
              val samp = b(i + 9 + 3 * c) & 0xFF
              compH(c) = (samp >> 4) & 0xF
              compV(c) = samp & 0xF
              // factors 1 and 2 cover 4:4:4 / 4:2:2 / 4:2:0 / 4:4:0
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
                return null
              compTq(c) = b(i + 10 + 3 * c) & 0xFF
              if (compTq(c) > 3) return null
              c += 1
            }
            if (nComp == 1) { compH(0) = 1; compV(0) = 1 } // single-comp scan: 1 block/MCU
            if (progressive) {
              // multi-scan: buffer every coefficient until EOI
              val hmax = compH.max
              val vmax = compV.max
              mcusX = (width + 8 * hmax - 1) / (8 * hmax)
              mcusY = (height + 8 * vmax - 1) / (8 * vmax)
              var totalBlocks = 0L
              var c2 = 0
              while (c2 < nComp) {
                totalBlocks += mcusX.toLong * mcusY * compH(c2) * compV(c2)
                c2 += 1
              }
              if (totalBlocks * 64 > (1 << 28)) return null
              coefs = Array.tabulate(nComp)(cc =>
                new Array[Int](mcusX * compH(cc) * mcusY * compV(cc) * 64))
            }
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return null // non-baseline/-progressive frame: out of the pixel path
          case 0xDD => // DRI
            if (segLen < 4) return null
            dri = u16(b, i + 2)
          case 0xDA => // SOS → entropy decode
            if (nComp == 0) return null // SOS before SOF
            if (segLen < 3) return null
            val ns = b(i + 2) & 0xFF
            if (!progressive) {
              if (ns != nComp || segLen < 3 + 2 * ns + 3) return null
              val dcSel = new Array[Int](nComp)
              val acSel = new Array[Int](nComp)
              var c = 0
              while (c < ns) {
                val cs = b(i + 3 + 2 * c) & 0xFF
                val idx = compId.indexOf(cs)
                if (idx < 0) return null
                dcSel(idx) = (b(i + 4 + 2 * c) & 0xF0) >> 4
                acSel(idx) = b(i + 4 + 2 * c) & 0x0F
                if (dcSel(idx) > 3 || acSel(idx) > 3) return null
                c += 1
              }
              return decodeScan(b, i + segLen, width, height, nComp,
                compTq, compH, compV, dcSel, acSel, quant, huffDc, huffAc, dri)
            }
            // progressive scan: any 1..nComp component subset, spectral
            // selection [Ss, Se], successive approximation Ah → Al
            if (ns < 1 || ns > nComp || segLen < 3 + 2 * ns + 3) return null
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = b(i + 3 + 2 * c) & 0xFF
              val idx = compId.indexOf(cs)
              if (idx < 0) return null
              scanComp(c) = idx
              scanDc(c) = (b(i + 4 + 2 * c) & 0xF0) >> 4
              scanAc(c) = b(i + 4 + 2 * c) & 0x0F
              if (scanDc(c) > 3 || scanAc(c) > 3) return null
              c += 1
            }
            val ss = b(i + 3 + 2 * ns) & 0xFF
            val se = b(i + 4 + 2 * ns) & 0xFF
            val ahal = b(i + 5 + 2 * ns) & 0xFF
            val ah = (ahal >> 4) & 0xF
            val al = ahal & 0xF
            if (ss > 63 || se > 63 || se < ss) return null
            if (ss == 0 && se != 0) return null // DC scan is exactly [0, 0]
            if (ss > 0 && ns != 1) return null  // AC scans: one component
            val nxt = decodeProgScan(b, i + segLen, width, height, nComp,
              compH, compV, mcusX, mcusY, coefs, scanComp, scanDc, scanAc,
              ss, se, ah, al, huffDc, huffAc, dri)
            if (nxt < 0) return null
            scansDone += 1
            i = nxt - segLen // the shared loop tail re-adds segLen
          case _ => // APPn / COM / unknown: skip
        }
        i += segLen
      }
    }
    null
  }

  /** Interleaved-scan decode for ANY factor mix in {1,2}² — 4:4:4,
    * 4:2:2, 4:2:0, 4:4:0. Each MCU carries hc×vc blocks per component;
    * subsampled components are upsampled to full resolution by sample
    * replication (`x·hc/hmax`, `y·vc/vmax` — the deterministic nearest
    * rule an oracle can mirror). */
  private def decodeScan(b: Array[Byte], start: Int, width: Int, height: Int,
      nComp: Int, compTq: Array[Int], compH: Array[Int], compV: Array[Int],
      dcSel: Array[Int], acSel: Array[Int],
      quant: Array[Array[Int]], huffDc: Array[Huff], huffAc: Array[Huff],
      dri: Int): Image = {
    var c = 0
    while (c < nComp) {
      if (quant(compTq(c)) == null) return null
      if (huffDc(dcSel(c)) == null || huffAc(acSel(c)) == null) return null
      c += 1
    }
    val hmax = compH.max
    val vmax = compV.max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    var totalBlocks = 0L
    c = 0
    while (c < nComp) {
      totalBlocks += mcusX.toLong * mcusY * compH(c) * compV(c); c += 1
    }
    if (totalBlocks * 64 > (1 << 28)) return null
    val compBw = Array.tabulate(nComp)(cc => mcusX * compH(cc))
    val planes = Array.tabulate(nComp)(cc =>
      new Array[Int](compBw(cc) * 8 * mcusY * compV(cc) * 8))
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val idctTmp = new Array[Double](64)
    val r = new BitReader(b, start)
    var mcu = 0
    val nMcu = mcusX * mcusY
    var rstIdx = 0
    while (mcu < nMcu) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        // aligned RSTn between restart intervals; resets DC prediction
        r.align()
        if (r.pos + 1 >= b.length) return null
        if ((b(r.pos) & 0xFF) != 0xFF ||
          (b(r.pos + 1) & 0xFF) != (0xD0 + rstIdx)) return null
        r.pos += 2
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var comp = 0
      while (comp < nComp) {
        var v0 = 0
        while (v0 < compV(comp)) {
          var u0 = 0
          while (u0 < compH(comp)) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val s = huffDc(dcSel(comp)).decode(r)
            if (s < 0 || s > 11) return null
            val diffBits = r.receive(s)
            if (diffBits == Int.MinValue) return null
            pred(comp) += extend(diffBits, s)
            coef(0) = pred(comp)
            // AC
            var k = 1
            var done = false
            while (k < 64 && !done) {
              val rs = huffAc(acSel(comp)).decode(r)
              if (rs < 0) return null
              val run = (rs >> 4) & 0xF
              val size = rs & 0xF
              if (size == 0) {
                if (rs == 0x00) done = true      // EOB
                else if (rs == 0xF0) k += 16     // ZRL
                else return null
              } else {
                k += run
                if (k > 63) return null
                val vb = r.receive(size)
                if (vb == Int.MinValue) return null
                coef(k) = extend(vb, size)
                k += 1
              }
            }
            idctBlockToPlane(coef, 0, quant(compTq(comp)), block, idctTmp,
              planes(comp), compBw(comp) * 8,
              mx * compH(comp) + u0, my * compV(comp) + v0)
            u0 += 1
          }
          v0 += 1
        }
        comp += 1
      }
      mcu += 1
    }
    renderImage(width, height, nComp, compH, compV, compBw, planes)
  }

  /** Dequantize one zigzag-order coefficient block (at `off` in `coef`)
    * through the zigzag, then a SEPARABLE IDCT (column pass into `tmp`,
    * row pass out — 8× fewer multiplies than the direct double sum;
    * same double-precision result class, so block-constant exactness is
    * unchanged) into `plane` at block position (`bx`, `by`). */
  private def idctBlockToPlane(coef: Array[Int], off: Int, q: Array[Int],
      block: Array[Double], tmp: Array[Double],
      plane: Array[Int], rowW: Int, bx: Int, by: Int): Unit = {
    var z = 0
    while (z < 64) { block(ZIGZAG(z)) = coef(off + z).toDouble * q(z); z += 1 }
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          sum += CNORM(v) * block(v * 8 + u) * COS(y)(v)
          v += 1
        }
        tmp(u * 8 + y) = sum
        y += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var uu = 0
        while (uu < 8) {
          sum += CNORM(uu) * tmp(uu * 8 + y) * COS(x)(uu)
          uu += 1
        }
        val px = math.floor(sum / 4.0 + 128.0 + 0.5).toInt
        plane((by * 8 + y) * rowW + bx * 8 + x) =
          if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** Crop + replicate-upsample + color-convert decoded sample planes. */
  private def renderImage(width: Int, height: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compBw: Array[Int],
      planes: Array[Array[Int]]): Image = {
    val hmax = compH.max
    val vmax = compV.max
    if (nComp == 1) {
      val rowW = compBw(0) * 8
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * rowW + x).toByte
          x += 1
        }
        y += 1
      }
      new Image(width, height, 1, out)
    } else {
      val rowY = compBw(0) * 8
      val rowCb = compBw(1) * 8
      val rowCr = compBw(2) * 8
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val yCb = y * compV(1) / vmax
        val yCr = y * compV(2) / vmax
        val yY = y * compV(0) / vmax
        var x = 0
        while (x < width) {
          val yy = planes(0)(yY * rowY + x * compH(0) / hmax).toDouble
          val cb = planes(1)(yCb * rowCb + x * compH(1) / hmax).toDouble - 128.0
          val cr = planes(2)(yCr * rowCr + x * compH(2) / hmax).toDouble - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp8(yy + 1.402 * cr)
          out(o + 1) = clamp8(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp8(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      new Image(width, height, 3, out)
    }
  }

  /** One progressive (SOF2) scan — T.81 §G.2 control flow. Mutates the
    * per-component zigzag coefficient buffers and returns the byte
    * offset of the marker following the scan's entropy data, or -1 on
    * malformed input.
    *
    * Four scan kinds: DC first (Ah=0 — Huffman DPCM at reduced
    * precision, value << Al), DC refinement (one raw bit per block ORs
    * in 1<<Al), AC first (single component, run/size at reduced
    * precision plus EOBn end-of-band runs), AC refinement (correction
    * bits for every already-nonzero coefficient, threaded between
    * newly-nonzero insertions and through EOB runs). Restart markers
    * reset DC predictors, the EOB run, and bit alignment every `dri`
    * MCUs (interleaved) or blocks (single-component scans). */
  private def decodeProgScan(b: Array[Byte], start: Int, width: Int,
      height: Int, nComp: Int, compH: Array[Int], compV: Array[Int],
      mcusX: Int, mcusY: Int, coefs: Array[Array[Int]],
      scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      huffDc: Array[Huff], huffAc: Array[Huff], dri: Int): Int = {
    val r = new BitReader(b, start)
    val hmax = compH.max
    val vmax = compV.max
    val nsc = scanComp.length
    var eobrun = 0
    val pred = new Array[Int](nsc)
    var rstIdx = 0

    def restart(): Boolean = {
      r.align()
      if (r.pos + 1 >= b.length) return false
      if ((b(r.pos) & 0xFF) != 0xFF ||
        (b(r.pos + 1) & 0xFF) != (0xD0 + rstIdx)) return false
      r.pos += 2
      rstIdx = (rstIdx + 1) % 8
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
      true
    }

    def dcFirst(arr: Array[Int], off: Int, c: Int, huff: Huff): Boolean = {
      val s = huff.decode(r)
      if (s < 0 || s > 11) return false
      val diffBits = r.receive(s)
      if (diffBits == Int.MinValue) return false
      pred(c) += extend(diffBits, s)
      arr(off) = pred(c) << al
      true
    }

    def dcRefine(arr: Array[Int], off: Int): Boolean = {
      val bit = r.nextBit()
      if (bit < 0) return false
      if (bit == 1) arr(off) |= (1 << al)
      true
    }

    def acFirst(arr: Array[Int], off: Int, huff: Huff): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = huff.decode(r)
        if (rs < 0) return false
        val run = (rs >> 4) & 0xF
        val size = rs & 0xF
        if (size != 0) {
          k += run
          if (k > se) return false
          val vb = r.receive(size)
          if (vb == Int.MinValue) return false
          arr(off + k) = extend(vb, size) << al
          k += 1
        } else if (run == 15) {
          k += 16 // ZRL
        } else {
          // EOBn: run of (1 << run) + extra blocks ending here — this
          // block is the first member, so one is consumed immediately
          eobrun = (1 << run) - 1
          if (run != 0) {
            val extra = r.receive(run)
            if (extra == Int.MinValue) return false
            eobrun += extra
          }
          k = se + 1
        }
      }
      true
    }

    def acRefine(arr: Array[Int], off: Int, huff: Huff): Boolean = {
      val p1 = 1 << al
      val m1 = -(1 << al)
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = huff.decode(r)
          if (rs < 0) return false
          var run = (rs >> 4) & 0xF
          val size = rs & 0xF
          var newnz = 0
          if (size != 0) {
            if (size != 1) return false // refinement codes 1-bit magnitudes
            val bit = r.nextBit()
            if (bit < 0) return false
            newnz = if (bit == 1) p1 else m1
          } else if (run < 15) {
            // EOBn INCLUDES this block; its remaining already-nonzero
            // coefficients still take correction bits (handled below)
            eobrun = 1 << run
            if (run != 0) {
              val extra = r.receive(run)
              if (extra == Int.MinValue) return false
              eobrun += extra
            }
            ended = true
          } // run == 15, size == 0: ZRL — skip 16 zero-history coeffs
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              val cv = arr(off + k)
              if (cv != 0) {
                // already-nonzero history: correction bit, run unaffected
                val bit = r.nextBit()
                if (bit < 0) return false
                if (bit == 1 && (cv & p1) == 0)
                  arr(off + k) = cv + (if (cv >= 0) p1 else m1)
                k += 1
              } else if (run == 0) {
                if (newnz != 0) arr(off + k) = newnz
                k += 1
                placed = true
              } else {
                run -= 1
                k += 1
              }
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val cv = arr(off + k)
          if (cv != 0) {
            val bit = r.nextBit()
            if (bit < 0) return false
            if (bit == 1 && (cv & p1) == 0)
              arr(off + k) = cv + (if (cv >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    if (ss == 0 && ah == 0) {
      var c = 0
      while (c < nsc) {
        if (huffDc(scanDc(c)) == null) return -1
        c += 1
      }
    }
    if (ss > 0 && huffAc(scanAc(0)) == null) return -1

    if (nsc > 1) {
      // interleaved DC scan over the frame's MCU structure
      val nMcu = mcusX * mcusY
      var mcu = 0
      while (mcu < nMcu) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0 && !restart()) return -1
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var c = 0
        while (c < nsc) {
          val comp = scanComp(c)
          val bwPad = mcusX * compH(comp)
          var v0 = 0
          while (v0 < compV(comp)) {
            var u0 = 0
            while (u0 < compH(comp)) {
              val off = ((my * compV(comp) + v0) * bwPad +
                mx * compH(comp) + u0) * 64
              val ok =
                if (ah == 0) dcFirst(coefs(comp), off, c, huffDc(scanDc(c)))
                else dcRefine(coefs(comp), off)
              if (!ok) return -1
              u0 += 1
            }
            v0 += 1
          }
          c += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan: raster over the component's OWN block
      // grid (ceil(compDim/8), NOT the MCU-padded grid), restart
      // interval counted in blocks
      val comp = scanComp(0)
      val cw = (width * compH(comp) + hmax - 1) / hmax
      val chh = (height * compV(comp) + vmax - 1) / vmax
      val bw = (cw + 7) / 8
      val bh = (chh + 7) / 8
      val bwPad = mcusX * compH(comp)
      val arr = coefs(comp)
      val huff = if (ss == 0) huffDc(scanDc(0)) else huffAc(scanAc(0))
      var blk = 0
      val nBlk = bw * bh
      while (blk < nBlk) {
        if (dri > 0 && blk > 0 && blk % dri == 0 && !restart()) return -1
        val off = ((blk / bw) * bwPad + blk % bw) * 64
        val ok =
          if (ss == 0 && ah == 0) dcFirst(arr, off, 0, huff)
          else if (ss == 0) dcRefine(arr, off)
          else if (ah == 0) acFirst(arr, off, huff)
          else acRefine(arr, off, huff)
        if (!ok) return -1
        blk += 1
      }
    }

    // locate the marker ending this scan's entropy data
    r.align()
    var p = r.pos
    def seekMarker(): Unit =
      while (p + 1 < b.length &&
        !((b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) != 0x00)) p += 1
    seekMarker()
    while (p + 1 < b.length &&
        (b(p + 1) & 0xFF) >= 0xD0 && (b(p + 1) & 0xFF) <= 0xD7) {
      p += 2 // stray trailing restart marker: skip
      seekMarker()
    }
    if (p + 1 >= b.length) return -1
    p
  }

  /** Progressive finish at EOI: dequantize + IDCT every buffered block,
    * then the shared crop/upsample/color-convert. */
  private def finishProgressive(width: Int, height: Int, nComp: Int,
      compTq: Array[Int], compH: Array[Int], compV: Array[Int],
      mcusX: Int, mcusY: Int, quant: Array[Array[Int]],
      coefs: Array[Array[Int]]): Image = {
    var c = 0
    while (c < nComp) {
      if (quant(compTq(c)) == null) return null
      c += 1
    }
    val compBw = Array.tabulate(nComp)(cc => mcusX * compH(cc))
    val planes = Array.tabulate(nComp)(cc =>
      new Array[Int](compBw(cc) * 8 * mcusY * compV(cc) * 8))
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    c = 0
    while (c < nComp) {
      val bw = compBw(c)
      val bh = mcusY * compV(c)
      val q = quant(compTq(c))
      val arr = coefs(c)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          idctBlockToPlane(arr, (by * bw + bx) * 64, q, block, tmp,
            planes(c), bw * 8, bx, by)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    renderImage(width, height, nComp, compH, compV, compBw, planes)
  }

  /** The FIXED output rounding the SQL oracle mirrors:
    * `clamp(floor(x + 0.5), 0, 255)`. */
  private def clamp8(x: Double): Byte = {
    val v = math.floor(x + 0.5).toInt
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte
  }

  // ------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((bits >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = while (cnt != 0) put(1, 1)
  }

  /** Simple VALID canonical tables (emitted in DHT, so any conformant
    * decoder — including this file's — reads them back): 12 DC
    * categories at 4 bits; at 8 bits the 2+16×12 run/size AC symbols
    * plus the 14 progressive EOBn symbols (n<<4, n=1..14) — 208 codes,
    * well under the 255 eight-bit max, so no all-ones code. */
  private val DC_BITS = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DC_VALS = Array.tabulate(12)(identity)
  private val AC_VALS: Array[Int] = {
    val buf = collection.mutable.ArrayBuffer[Int](0x00, 0xF0) // EOB, ZRL
    for (run <- 0 to 15; size <- 1 to 12) buf += ((run << 4) | size)
    for (n <- 1 to 14) buf += (n << 4) // progressive EOBn
    buf.toArray // 208 symbols
  }
  private val AC_BITS = Array(0, 0, 0, 0, 0, 0, 0, 208, 0, 0, 0, 0, 0, 0, 0, 0)

  private def canonicalCodes(bits: Array[Int]): Array[(Int, Int)] = {
    // (code, length) per symbol in canonical order
    val out = collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var code = 0
    var l = 1
    while (l <= 16) {
      var k = 0
      while (k < bits(l - 1)) { out += ((code, l)); code += 1; k += 1 }
      code <<= 1
      l += 1
    }
    out.toArray
  }
  private val DC_CODE = canonicalCodes(DC_BITS) // index by category
  private val AC_CODE: Map[Int, (Int, Int)] =
    AC_VALS.zip(canonicalCodes(AC_BITS)).toMap

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Sample the 8×8 block at block position (`bx`, `by`) from `plane`
    * (replicating the last row/column past edges), forward-DCT it
    * (separable: row pass into `tmp`, column pass out), round, flat
    * quantization, and write ZIGZAG-order coefficients into `coefOut`
    * — ONE implementation shared by the baseline and progressive
    * encoders, so both emit identical coefficients for the same planes
    * (the progressive-vs-baseline decode parity spec leans on this). */
  private def fdctBlock(plane: Array[Int], pw: Int, ph: Int, bx: Int, by: Int,
      block: Array[Double], tmp: Array[Double], coefOut: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, pw - 1)
        block(y * 8 + x) = plane(sy * pw + sx).toDouble - 128.0
        x += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 8) {
        var sum = 0.0
        var xx = 0
        while (xx < 8) {
          sum += block(yy * 8 + xx) * COS(xx)(u)
          xx += 1
        }
        tmp(u * 8 + yy) = sum
        yy += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var sum = 0.0
        var yy = 0
        while (yy < 8) {
          sum += tmp(uu * 8 + yy) * COS(yy)(v)
          yy += 1
        }
        val f = 0.25 * CNORM(uu) * CNORM(v) * sum
        coefOut(ZIG_OF(v * 8 + uu)) = math.round(f).toInt
        uu += 1
      }
      v += 1
    }
  }

  /** Encode planes (values 0..255; 1 = gray, 3 = YCbCr) as a baseline
    * JFIF stream with a FLAT quantization table. `fH`/`fV` give
    * per-component sampling factors (all-1s when omitted — 4:4:4);
    * subsampled components pass planes at their REDUCED dimensions
    * (`ceil(dim·f/fmax)`). `dri` > 0 emits a DRI segment and RSTn
    * markers every `dri` MCUs — the restart path stays
    * production-exercised. */
  def encode(width: Int, height: Int, planes: Array[Array[Int]],
      dri: Int = 0, fH: Array[Int] = null, fV: Array[Int] = null): Array[Byte] = {
    val nComp = planes.length
    require(nComp == 1 || nComp == 3, "1 or 3 planes")
    val sh = if (fH == null) Array.fill(nComp)(1) else fH
    val sv = if (fV == null) Array.fill(nComp)(1) else fV
    require(sh.length == nComp && sv.length == nComp, "factor arity")
    require(sh.forall(f => f == 1 || f == 2) && sv.forall(f => f == 1 || f == 2),
      "factors in {1,2}")
    val hmax = sh.max; val vmax = sv.max
    val pw = Array.tabulate(nComp)(c => (width * sh(c) + hmax - 1) / hmax)
    val ph = Array.tabulate(nComp)(c => (height * sv(c) + vmax - 1) / vmax)
    (0 until nComp).foreach(c =>
      require(planes(c).length == pw(c) * ph(c), s"plane $c size"))
    val out = new java.io.ByteArrayOutputStream()
    def word(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8) // SOI
    // APP0 JFIF
    marker(0xE0); word(16)
    out.write("JFIF".getBytes("ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); word(1); word(1)
    out.write(0); out.write(0)
    // DQT: table 0, flat
    marker(0xDB); word(2 + 65); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    // DHT: DC table 0 + AC table 0
    marker(0xC4); word(2 + (17 + DC_VALS.length) + (17 + AC_VALS.length))
    out.write(0x00); DC_BITS.foreach(out.write); DC_VALS.foreach(out.write)
    out.write(0x10); AC_BITS.foreach(out.write); AC_VALS.foreach(out.write)
    // SOF0
    marker(0xC0); word(8 + 3 * nComp)
    out.write(8); word(height); word(width); out.write(nComp)
    var c = 0
    while (c < nComp) {
      out.write(c + 1); out.write((sh(c) << 4) | sv(c)); out.write(0); c += 1
    }
    if (dri > 0) { marker(0xDD); word(4); word(dri) }
    // SOS
    marker(0xDA); word(6 + 2 * nComp)
    out.write(nComp)
    c = 0
    while (c < nComp) { out.write(c + 1); out.write(0x00); c += 1 }
    out.write(0); out.write(63); out.write(0)

    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val pred = new Array[Int](nComp)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val fdctTmp = new Array[Double](64)
    var w = new BitWriter(out)
    var rstIdx = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        w.flushWithOnes()
        marker(0xD0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
        w = new BitWriter(out)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      c = 0
      while (c < nComp) {
       var v0 = 0
       while (v0 < sv(c)) {
        var u0 = 0
        while (u0 < sh(c)) {
        fdctBlock(planes(c), pw(c), ph(c), mx * sh(c) + u0, my * sv(c) + v0,
          block, fdctTmp, coef)
        val diff = coef(0) - pred(c)
        pred(c) = coef(0)
        val s = category(diff)
        val (dcCode, dcLen) = DC_CODE(s)
        w.put(dcCode, dcLen)
        if (s > 0)
          w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC with run-lengths
        var k = 1
        var run = 0
        while (k < 64) {
          val a = coef(k)
          if (a == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = AC_CODE(0xF0); w.put(zc, zl); run -= 16 }
            val sz = category(a)
            val (acC, acL) = AC_CODE((run << 4) | sz)
            w.put(acC, acL)
            w.put(if (a < 0) a + (1 << sz) - 1 else a, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = AC_CODE(0x00); w.put(ec, el) }
        u0 += 1
        }
        v0 += 1
       }
       c += 1
      }
      mcu += 1
    }
    w.flushWithOnes()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Encode planes as a PROGRESSIVE (SOF2) JFIF stream with a flat
    * quantization table and a realistic four-stage scan script:
    *   1. DC, all components interleaved, Ah=0 Al=1
    *   2. per component: AC bands Ss=1..5 then Ss=6..63, Ah=0 Al=1
    *   3. DC refinement, interleaved, Ah=1 Al=0
    *   4. per component: AC refinement of both bands, Ah=1 Al=0
    * — exercising spectral selection, successive approximation on DC
    * and AC, EOBn end-of-band runs, and refinement correction bits
    * (T.81 §G; the buffered-correction-bit control flow follows the
    * classic jcphuff structure). Coefficients come from the SAME
    * [[fdctBlock]] as [[encode]], so decoding this stream yields
    * pixels BIT-IDENTICAL to decoding the baseline stream of the same
    * planes. `dri` > 0 emits DRI + RSTn in every scan (MCU units when
    * interleaved, block units in single-component scans). */
  def encodeProgressive(width: Int, height: Int, planes: Array[Array[Int]],
      dri: Int = 0, fH: Array[Int] = null, fV: Array[Int] = null): Array[Byte] = {
    val nComp = planes.length
    require(nComp == 1 || nComp == 3, "1 or 3 planes")
    val sh = if (fH == null) Array.fill(nComp)(1) else fH
    val sv = if (fV == null) Array.fill(nComp)(1) else fV
    require(sh.length == nComp && sv.length == nComp, "factor arity")
    require(sh.forall(f => f == 1 || f == 2) && sv.forall(f => f == 1 || f == 2),
      "factors in {1,2}")
    val hmax = sh.max; val vmax = sv.max
    val pw = Array.tabulate(nComp)(c => (width * sh(c) + hmax - 1) / hmax)
    val ph = Array.tabulate(nComp)(c => (height * sv(c) + vmax - 1) / vmax)
    (0 until nComp).foreach(c =>
      require(planes(c).length == pw(c) * ph(c), s"plane $c size"))
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val bwPad = Array.tabulate(nComp)(c => mcusX * sh(c))
    val bhPad = Array.tabulate(nComp)(c => mcusY * sv(c))

    // every coefficient block up front (padded MCU grid, zigzag order)
    val blockD = new Array[Double](64)
    val tmpD = new Array[Double](64)
    val coefs = Array.tabulate(nComp) { c =>
      val arr = new Array[Int](bwPad(c) * bhPad(c) * 64)
      val cbuf = new Array[Int](64)
      var by = 0
      while (by < bhPad(c)) {
        var bx = 0
        while (bx < bwPad(c)) {
          fdctBlock(planes(c), pw(c), ph(c), bx, by, blockD, tmpD, cbuf)
          System.arraycopy(cbuf, 0, arr, (by * bwPad(c) + bx) * 64, 64)
          bx += 1
        }
        by += 1
      }
      arr
    }

    val out = new java.io.ByteArrayOutputStream()
    def word(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8) // SOI
    marker(0xE0); word(16)
    out.write("JFIF".getBytes("ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); word(1); word(1)
    out.write(0); out.write(0)
    marker(0xDB); word(2 + 65); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    marker(0xC4); word(2 + (17 + DC_VALS.length) + (17 + AC_VALS.length))
    out.write(0x00); DC_BITS.foreach(out.write); DC_VALS.foreach(out.write)
    out.write(0x10); AC_BITS.foreach(out.write); AC_VALS.foreach(out.write)
    marker(0xC2) // SOF2: progressive
    word(8 + 3 * nComp)
    out.write(8); word(height); word(width); out.write(nComp)
    var c0 = 0
    while (c0 < nComp) {
      out.write(c0 + 1); out.write((sh(c0) << 4) | sv(c0)); out.write(0)
      c0 += 1
    }
    if (dri > 0) { marker(0xDD); word(4); word(dri) }

    def sosHeader(comps: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xDA); word(6 + 2 * comps.length)
      out.write(comps.length)
      comps.foreach { c => out.write(c + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    // ---- stage 1/3: DC scans, all components interleaved ----
    def dcScan(refine: Boolean, al: Int): Unit = {
      sosHeader(Array.range(0, nComp), 0, 0, if (refine) al + 1 else 0, al)
      var w = new BitWriter(out)
      val pred = new Array[Int](nComp)
      var rstIdx = 0
      val nMcu = mcusX * mcusY
      var mcu = 0
      while (mcu < nMcu) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          w.flushWithOnes()
          marker(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
          w = new BitWriter(out)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var c = 0
        while (c < nComp) {
          var v0 = 0
          while (v0 < sv(c)) {
            var u0 = 0
            while (u0 < sh(c)) {
              val off = ((my * sv(c) + v0) * bwPad(c) + mx * sh(c) + u0) * 64
              if (refine) {
                w.put((coefs(c)(off) >> al) & 1, 1)
              } else {
                val dc = coefs(c)(off) >> al // arithmetic point transform
                val diff = dc - pred(c)
                pred(c) = dc
                val s = category(diff)
                val (code, len) = DC_CODE(s)
                w.put(code, len)
                if (s > 0)
                  w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
              }
              u0 += 1
            }
            v0 += 1
          }
          c += 1
        }
        mcu += 1
      }
      w.flushWithOnes()
    }

    // ---- stage 2/4: AC scans, one component, one band ----
    def acScan(c: Int, ss: Int, se: Int, refine: Boolean, al: Int): Unit = {
      sosHeader(Array(c), ss, se, if (refine) al + 1 else 0, al)
      var w = new BitWriter(out)
      val arr = coefs(c)
      val bw = ((width * sh(c) + hmax - 1) / hmax + 7) / 8
      val bh = ((height * sv(c) + vmax - 1) / vmax + 7) / 8
      var eobrun = 0
      // refine only: buffered correction bits — the first `be` belong to
      // the open EOB run (flushed with its EOBn symbol), the rest to the
      // CURRENT block (flushed after the next coefficient symbol — the
      // decoder reads them while traversing toward that coefficient)
      val bits = collection.mutable.ArrayBuffer.empty[Int]
      var be = 0
      var rstIdx = 0
      def flushEobrun(): Unit = {
        if (eobrun > 0) {
          var t = eobrun; var nbits = 0
          while ({ t >>= 1; t != 0 }) nbits += 1
          val (code, len) = AC_CODE(nbits << 4)
          w.put(code, len)
          if (nbits > 0) w.put(eobrun & ((1 << nbits) - 1), nbits)
          eobrun = 0
          var idx = 0
          while (idx < be) { w.put(bits(idx), 1); idx += 1 }
          bits.remove(0, be)
          be = 0
        }
      }
      def emitBlockBits(): Unit = { // the current block's bits (past be)
        var idx = be
        while (idx < bits.length) { w.put(bits(idx), 1); idx += 1 }
        bits.remove(be, bits.length - be)
      }
      var blk = 0
      val nBlk = bw * bh
      val absv = new Array[Int](64)
      while (blk < nBlk) {
        if (dri > 0 && blk > 0 && blk % dri == 0) {
          flushEobrun()
          w.flushWithOnes()
          marker(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          w = new BitWriter(out)
        }
        val off = ((blk / bw) * bwPad(c) + blk % bw) * 64
        if (!refine) {
          var r = 0
          var k = ss
          while (k <= se) {
            var temp = arr(off + k)
            var temp2 = 0
            if (temp < 0) { temp = -temp; temp >>= al; temp2 = ~temp }
            else { temp >>= al; temp2 = temp }
            if (temp == 0) r += 1
            else {
              flushEobrun()
              while (r > 15) {
                val (zc, zl) = AC_CODE(0xF0); w.put(zc, zl); r -= 16
              }
              val nbits = category(temp)
              val (code, len) = AC_CODE((r << 4) | nbits)
              w.put(code, len)
              w.put(temp2 & ((1 << nbits) - 1), nbits)
              r = 0
            }
            k += 1
          }
          if (r > 0) {
            eobrun += 1
            if (eobrun == 0x7FFF) flushEobrun()
          }
        } else {
          // refinement: jcphuff's buffered-correction-bit walk
          var eobIdx = ss - 1 // index of the last NEWLY-nonzero coef
          var k = ss
          while (k <= se) {
            var t = arr(off + k)
            if (t < 0) t = -t
            t >>= al
            absv(k) = t
            if (t == 1) eobIdx = k
            k += 1
          }
          var r = 0
          k = ss
          while (k <= se) {
            val temp = absv(k)
            if (temp == 0) r += 1
            else {
              while (r > 15 && k <= eobIdx) {
                flushEobrun()
                val (zc, zl) = AC_CODE(0xF0); w.put(zc, zl); r -= 16
                emitBlockBits()
              }
              if (temp > 1) {
                bits += (absv(k) & 1) // next bit of the shifted magnitude
              } else {
                flushEobrun()
                val (code, len) = AC_CODE((r << 4) | 1)
                w.put(code, len)
                w.put(if (arr(off + k) < 0) 0 else 1, 1)
                emitBlockBits()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || bits.length > be) {
            eobrun += 1
            be = bits.length // this block's bits join the EOB-run prefix
            if (eobrun == 0x7FFF || bits.length > 900) flushEobrun()
          }
        }
        blk += 1
      }
      flushEobrun()
      w.flushWithOnes()
    }

    dcScan(refine = false, al = 1)
    var c = 0
    while (c < nComp) {
      acScan(c, 1, 5, refine = false, al = 1)
      acScan(c, 6, 63, refine = false, al = 1)
      c += 1
    }
    dcScan(refine = true, al = 0)
    c = 0
    while (c < nComp) {
      acScan(c, 1, 5, refine = true, al = 0)
      acScan(c, 6, 63, refine = true, al = 0)
      c += 1
    }
    marker(0xD9) // EOI
    out.toByteArray
  }

  // -------------------------------------------------------------- synth

  /** Deterministic BLOCK-CONSTANT baseline JPEG the `mm_jpeg_*` oracle
    * mirrors exactly (see the exactness note in the header): dims from
    * the text's byte length (NOT multiples of 8, so partial edge
    * blocks stay exercised), gray vs YCbCr by id parity, every 8×8
    * block's value affine in (blockX, blockY, id), restart markers
    * every 2 MCUs when id % 3 == 0. */
  /** The 4:2:0 twin of [[synthJpegPixels]]: Y constant per full-grid
    * 8×8 block, chroma constant per SUBSAMPLED-grid 8×8 block (16×16
    * at full resolution) — so decode (replicate-upsample) is exact and
    * the oracle indexes chroma blocks by (x/16, y/16). */
  def synthJpeg420(id: Long, text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 37 + 8
    val h = n % 23 + 8
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val dri = if (java.lang.Math.floorMod(id, 3L) == 0L) 2 else 0
    val py = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      java.lang.Math.floorMod(bx * 5L + by * 7L + id, 256L).toInt
    }
    def sub(a: Long, bcoef: Long, coff: Long): Array[Int] =
      Array.tabulate(cw * ch) { i =>
        val bx = (i % cw) / 8; val by = (i / cw) / 8
        java.lang.Math.floorMod(bx * a + by * bcoef + id * coff, 256L).toInt
      }
    encode(w, h, Array(py, sub(3, 13, 2), sub(11, 3, 3)), dri,
      Array(2, 1, 1), Array(2, 1, 1))
  }

  /** PROGRESSIVE twin of [[synthJpegPixels]]: block-constant planes
    * (exact under flat quantization) through [[encodeProgressive]]'s
    * multi-scan script — gray vs YCbCr by id parity, 4:2:0 chroma on
    * id % 5 == 0 color images (chroma then constant per 16×16 full-res
    * block), restart markers on id % 3 == 0. The `mm_jpeg_progressive`
    * oracle recomputes every pixel analytically, exactly as the
    * baseline JPEG gates do. */
  def synthJpegProg(id: Long, text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 35 + 8
    val h = n % 27 + 8
    val gray = java.lang.Math.floorMod(id, 2L) == 0L
    val sub = !gray && java.lang.Math.floorMod(id, 5L) == 0L
    val dri = if (java.lang.Math.floorMod(id, 3L) == 0L) 2 else 0
    def plane(pw: Int, phh: Int, a: Long, bcoef: Long, coff: Long): Array[Int] =
      Array.tabulate(pw * phh) { i =>
        val bx = (i % pw) / 8; val by = (i / pw) / 8
        java.lang.Math.floorMod(bx * a + by * bcoef + id * coff, 256L).toInt
      }
    if (gray)
      encodeProgressive(w, h, Array(plane(w, h, 7, 11, 1)), dri)
    else if (sub) {
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      encodeProgressive(w, h, Array(
        plane(w, h, 5, 7, 1), plane(cw, ch, 3, 13, 2), plane(cw, ch, 11, 3, 3)),
        dri, Array(2, 1, 1), Array(2, 1, 1))
    } else
      encodeProgressive(w, h, Array(
        plane(w, h, 5, 7, 1), plane(w, h, 3, 13, 2), plane(w, h, 11, 3, 3)), dri)
  }

  def synthJpegPixels(id: Long, text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val n = text.numBytes
    val w = n % 39 + 8
    val h = n % 25 + 8
    val gray = java.lang.Math.floorMod(id, 2L) == 0L
    val dri = if (java.lang.Math.floorMod(id, 3L) == 0L) 2 else 0
    def plane(a: Long, bcoef: Long, coff: Long): Array[Int] =
      Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        java.lang.Math.floorMod(bx * a + by * bcoef + id * coff, 256L).toInt
      }
    val planes =
      if (gray) Array(plane(7, 11, 1))
      else Array(plane(5, 7, 1), plane(3, 13, 2), plane(11, 3, 3))
    encode(w, h, planes, dri)
  }
}
