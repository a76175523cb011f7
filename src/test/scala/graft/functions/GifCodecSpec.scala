package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** GIF codec: LZW round-trips (incl. the KwKwK code==next case and the
  * late-change width growth), interlace wire order, sub-rectangle
  * composition, transparency, frame sampling through both re-encode
  * paths, and cross-validation against the JDK's own independent GIF
  * implementation (javax.imageio — test oracle only, never shipped in
  * the engine). */
class GifCodecSpec extends AnyFunSuite {

  private def rgbOf(g: GifCodec.GifImage, f: Int, x: Int, y: Int): (Int, Int, Int) = {
    val fr = g.frames(f)
    val p = (y * g.width + x) * 3
    (fr(p) & 0xFF, fr(p + 1) & 0xFF, fr(p + 2) & 0xFF)
  }

  test("LZW: encode/decode round-trip, deterministic corpora") {
    // all-same indices trigger KwKwK (code == next) immediately
    for (mcs <- Seq(2, 4, 8)) {
      val flat = Array.fill(500)(0.toByte)
      assert(GifCodec.lzwDecode(GifCodec.lzwEncode(flat, mcs), mcs, 500)
        .toSeq == flat.toSeq)
      val ramp = Array.tabulate(1000)(i => (i % (1 << mcs)).toByte)
      assert(GifCodec.lzwDecode(GifCodec.lzwEncode(ramp, mcs), mcs, 1000)
        .toSeq == ramp.toSeq)
    }
  }

  test("LZW: randomized round-trips grow the table past several width bumps") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val mcs = Seq(2, 3, 5, 8)(trial % 4)
      val n = 1 + rnd.nextInt(20000) // enough to pass 2^mcs+1 … 4096 slots
      val data = Array.fill(n)((rnd.nextInt(1 << mcs)).toByte)
      val rt = GifCodec.lzwDecode(GifCodec.lzwEncode(data, mcs), mcs, n)
      assert(rt != null && rt.toSeq == data.toSeq, s"trial $trial mcs=$mcs n=$n")
    }
  }

  test("LZW: table overflow forces CLEAR + reset and still round-trips") {
    val rnd = new scala.util.Random(7)
    // low-entropy long stream at mcs=2: the 4096-entry table fills
    val data = Array.fill(300000)((rnd.nextInt(4)).toByte)
    val rt = GifCodec.lzwDecode(GifCodec.lzwEncode(data, 2), 2, data.length)
    assert(rt != null && rt.toSeq == data.toSeq)
  }

  test("synth round-trip: dims, frames, palette and every pixel match the affine rule") {
    for (id <- Seq(0L, 1L, 2L, 5L, -3L, 123456L)) {
      val text = UTF8String.fromString("x" * (math.abs(id).toInt % 40 + 1))
      val n = text.numBytes
      val b = GifCodec.synthGif(id, text)
      val g = GifCodec.decode(b)
      assert(g != null, s"id=$id")
      assert(g.width == n % 21 + 4 && g.height == n % 11 + 3)
      assert(g.frames.length == java.lang.Math.floorMod(id, 3L).toInt + 1)
      assert(g.anyInterlaced == (g.frames.length > 1 ||
        java.lang.Math.floorMod(id, 2L) == 1L))
      for (f <- g.frames.indices; y <- 0 until g.height; x <- 0 until g.width) {
        val j = java.lang.Math.floorMod(x * 3 + y * 5 + f * 7 + id, 8L).toInt
        val want = (
          java.lang.Math.floorMod(j * 31 + id, 256L).toInt,
          java.lang.Math.floorMod(j * 57 + id * 2, 256L).toInt,
          java.lang.Math.floorMod(j * 89 + id * 3, 256L).toInt)
        assert(rgbOf(g, f, x, y) == want, s"id=$id f=$f ($x,$y)")
      }
    }
  }

  test("interlaced and sequential encodes of the same frame decode identically") {
    val pal = Array.tabulate(12)(i => (i * 17).toByte)
    val idx = Array.tabulate(19 * 13)(i => (i % 4).toByte)
    val seq = GifCodec.decode(GifCodec.encodeGif(19, 13, pal, Array(idx), _ => false))
    val int = GifCodec.decode(GifCodec.encodeGif(19, 13, pal, Array(idx), _ => true))
    assert(seq != null && int != null)
    assert(!seq.anyInterlaced && int.anyInterlaced)
    assert(seq.frames(0).toSeq == int.frames(0).toSeq)
  }

  test("cross-validation: javax.imageio reads our GIFs pixel-exact") {
    val id = 11L
    val b = GifCodec.synthGif(id, UTF8String.fromString("imageio-check"))
    val ours = GifCodec.decode(b)
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b)))
    val nFrames = rd.getNumImages(true)
    assert(nFrames == ours.frames.length)
    for (f <- 0 until nFrames) {
      val img = rd.read(f)
      assert(img.getWidth == ours.width && img.getHeight == ours.height)
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        val argb = img.getRGB(x, y)
        val want = rgbOf(ours, f, x, y)
        assert(((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF) == want,
          s"f=$f ($x,$y)")
      }
    }
  }

  test("cross-validation: our decoder reads javax.imageio-written GIFs pixel-exact") {
    val w = 23; val h = 9
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 11) % 256 << 16) | ((y * 29) % 256 << 8) | ((x + y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val g = GifCodec.decode(bos.toByteArray)
    assert(g != null && g.width == w && g.height == h && g.frames.length == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      assert(rgbOf(g, 0, x, y) ==
        (((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)), s"($x,$y)")
    }
  }

  test("sub-rectangle frames compose onto the prior canvas; disposal 2 restores background") {
    // hand-build: 4x3 screen, 4-color GCT, frame1 full, frame2 a 2x1
    // patch at (1,1) with a GCE carrying disposal=2
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    def w16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val full = Array.fill(12)(1.toByte)
    val patchLzw = GifCodec.lzwEncode(Array[Byte](3, 3), 2)
    val fullLzw = GifCodec.lzwEncode(full, 2)
    val bytes =
      "GIF89a".getBytes ++ w16(4) ++ w16(3) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal ++
        // frame 1: full canvas
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(4) ++ w16(3) ++
        Array(0.toByte, 2.toByte, fullLzw.length.toByte) ++ fullLzw ++
        Array(0.toByte) ++
        // GCE: disposal 2 (restore to background), no transparency
        Array(0x21.toByte, 0xF9.toByte, 4.toByte, (2 << 2).toByte,
          0.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        // frame 2: 2x1 patch at (1,1)
        Array(0x2C.toByte) ++ w16(1) ++ w16(1) ++ w16(2) ++ w16(1) ++
        Array(0.toByte, 2.toByte, patchLzw.length.toByte) ++ patchLzw ++
        Array(0.toByte) ++
        // frame 3: full canvas again (sees the restored background)
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(4) ++ w16(3) ++
        Array(0.toByte, 2.toByte, fullLzw.length.toByte) ++ fullLzw ++
        Array(0.toByte, 0x3B.toByte)
    val g = GifCodec.decode(bytes)
    assert(g != null && g.frames.length == 3)
    // frame 2 snapshot: patch drawn over frame 1's canvas
    assert(rgbOf(g, 1, 1, 1) == (100, 110, 120)) // index 3
    assert(rgbOf(g, 1, 2, 1) == (100, 110, 120))
    assert(rgbOf(g, 1, 0, 0) == (40, 50, 60))    // untouched index 1
    // frame 3 drew over a background-restored canvas, all index 1
    assert(rgbOf(g, 2, 1, 1) == (40, 50, 60))
  }

  test("disposal 2 restores only the frame's sub-rectangle, not the whole canvas") {
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    def w16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val full = Array.fill(12)(1.toByte)
    val fullLzw = GifCodec.lzwEncode(full, 2)
    val patchLzw = GifCodec.lzwEncode(Array[Byte](3, 3), 2)
    val dotLzw = GifCodec.lzwEncode(Array[Byte](2), 2)
    val bytes =
      "GIF89a".getBytes ++ w16(4) ++ w16(3) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal ++
        // frame 1: full canvas of index 1
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(4) ++ w16(3) ++
        Array(0.toByte, 2.toByte, fullLzw.length.toByte) ++ fullLzw ++
        Array(0.toByte) ++
        // GCE disposal 2, then frame 2: 2x1 patch at (1,1)
        Array(0x21.toByte, 0xF9.toByte, 4.toByte, (2 << 2).toByte,
          0.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        Array(0x2C.toByte) ++ w16(1) ++ w16(1) ++ w16(2) ++ w16(1) ++
        Array(0.toByte, 2.toByte, patchLzw.length.toByte) ++ patchLzw ++
        Array(0.toByte) ++
        // frame 3: 1x1 dot at (0,0) — rest of the canvas shows through
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(1) ++ w16(1) ++
        Array(0.toByte, 2.toByte, dotLzw.length.toByte) ++ dotLzw ++
        Array(0.toByte, 0x3B.toByte)
    val g = GifCodec.decode(bytes)
    assert(g != null && g.frames.length == 3)
    // frame 3: only the (1,1)-(2,1) rect went back to background idx 0
    assert(rgbOf(g, 2, 1, 1) == (10, 20, 30))
    assert(rgbOf(g, 2, 2, 1) == (10, 20, 30))
    // outside the disposed rect frame 1's index 1 survives
    assert(rgbOf(g, 2, 3, 1) == (40, 50, 60))
    assert(rgbOf(g, 2, 0, 2) == (40, 50, 60))
    // the new dot drew on top
    assert(rgbOf(g, 2, 0, 0) == (70, 80, 90))
  }

  test("disposal 3 restores the pre-frame canvas (restore-previous)") {
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    def w16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val full = Array.fill(12)(1.toByte)
    val fullLzw = GifCodec.lzwEncode(full, 2)
    val dot3 = GifCodec.lzwEncode(Array[Byte](3), 2)
    val dot2 = GifCodec.lzwEncode(Array[Byte](2), 2)
    val bytes =
      "GIF89a".getBytes ++ w16(4) ++ w16(3) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal ++
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(4) ++ w16(3) ++
        Array(0.toByte, 2.toByte, fullLzw.length.toByte) ++ fullLzw ++
        Array(0.toByte) ++
        // GCE disposal 3, then a 1x1 dot of index 3 at (0,0)
        Array(0x21.toByte, 0xF9.toByte, 4.toByte, (3 << 2).toByte,
          0.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(1) ++ w16(1) ++
        Array(0.toByte, 2.toByte, dot3.length.toByte) ++ dot3 ++
        Array(0.toByte) ++
        // frame 3: 1x1 dot of index 2 at (1,0)
        Array(0x2C.toByte) ++ w16(1) ++ w16(0) ++ w16(1) ++ w16(1) ++
        Array(0.toByte, 2.toByte, dot2.length.toByte) ++ dot2 ++
        Array(0.toByte, 0x3B.toByte)
    val g = GifCodec.decode(bytes)
    assert(g != null && g.frames.length == 3)
    // frame 2 snapshot: the dot is visible
    assert(rgbOf(g, 1, 0, 0) == (100, 110, 120))
    // frame 3: (0,0) reverted to frame 1's index 1, new dot at (1,0)
    assert(rgbOf(g, 2, 0, 0) == (40, 50, 60))
    assert(rgbOf(g, 2, 1, 0) == (70, 80, 90))
    // index-space view stayed live (GCT, opaque) → exact re-encode path
    assert(g.indexFrames != null)
    val s = GifCodec.decode(GifCodec.frameSample(bytes, 1))
    assert(s != null && s.frames.length == 3)
    for (f <- 0 until 3)
      assert(s.frames(f).toSeq == g.frames(f).toSeq, s"f=$f")
  }

  test("canvas bomb: big logical screen + many tiny frames trips the byte bound") {
    // 2000x2000 screen = 12 MB RGB (+4 MB index) per STORED frame; ten
    // 1x1 frames total ~20 bytes each on the wire but would clone
    // ~160 MB of canvases — decode must refuse, not allocate
    val pal = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    def w16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val dotLzw = GifCodec.lzwEncode(Array[Byte](2), 2)
    val frame =
      Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(1) ++ w16(1) ++
        Array(0.toByte, 2.toByte, dotLzw.length.toByte) ++ dotLzw ++
        Array(0.toByte)
    val bytes =
      "GIF89a".getBytes ++ w16(2000) ++ w16(2000) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal ++
        Array.fill(10)(frame).flatten ++ Array(0x3B.toByte)
    assert(bytes.length < 300) // the attack payload really is tiny
    assert(GifCodec.decode(bytes) == null)
    // sanity: the same screen with ONE frame is under the bound and decodes
    val one =
      "GIF89a".getBytes ++ w16(2000) ++ w16(2000) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal ++
        frame ++ Array(0x3B.toByte)
    assert(GifCodec.decode(one) != null)
  }

  test("transparent index leaves the prior canvas visible") {
    val pal = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    def w16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val f1 = GifCodec.lzwEncode(Array[Byte](2, 2, 2, 2), 2)
    val f2 = GifCodec.lzwEncode(Array[Byte](0, 3, 0, 3), 2) // 0 = transparent
    val bytes =
      "GIF89a".getBytes ++ w16(2) ++ w16(2) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal ++
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(2) ++ w16(2) ++
        Array(0.toByte, 2.toByte, f1.length.toByte) ++ f1 ++ Array(0.toByte) ++
        Array(0x21.toByte, 0xF9.toByte, 4.toByte, 1.toByte, // transparency on
          0.toByte, 0.toByte, 0.toByte, 0.toByte) ++        // transparent idx 0
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(2) ++ w16(2) ++
        Array(0.toByte, 2.toByte, f2.length.toByte) ++ f2 ++
        Array(0.toByte, 0x3B.toByte)
    val g = GifCodec.decode(bytes)
    assert(g != null && g.frames.length == 2)
    assert(rgbOf(g, 1, 0, 0) == (7, 8, 9))   // transparent → frame 1's idx 2
    assert(rgbOf(g, 1, 1, 0) == (10, 11, 12)) // opaque idx 3
    // transparency voids the exact index-canvas re-encode path
    assert(GifCodec.decode(bytes).indexFrames == null)
  }

  test("frameSample: GCT fast path keeps frames 0,2 and re-decodes identically") {
    val b = GifCodec.synthGif(2L, UTF8String.fromString("three-frame sample"))
    val g = GifCodec.decode(b)
    assert(g.frames.length == 3)
    val sampled = GifCodec.frameSample(b, 2)
    assert(sampled != null)
    val s = GifCodec.decode(sampled)
    assert(s != null && s.frames.length == 2)
    assert(s.frames(0).toSeq == g.frames(0).toSeq)
    assert(s.frames(1).toSeq == g.frames(2).toSeq)
  }

  test("frameSample: local-palette GIF flows through the rebuilt-palette path") {
    val pal1 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val pal2 = Array[Byte](21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32)
    def w16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val f1 = GifCodec.lzwEncode(Array[Byte](0, 1, 2, 3), 2)
    val f2 = GifCodec.lzwEncode(Array[Byte](3, 2, 1, 0), 2)
    val bytes =
      "GIF89a".getBytes ++ w16(2) ++ w16(2) ++
        Array((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ pal1 ++
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(2) ++ w16(2) ++
        Array(0.toByte, 2.toByte, f1.length.toByte) ++ f1 ++ Array(0.toByte) ++
        // frame 2 with a LOCAL color table (0x80|size=1 → 4 entries)
        Array(0x2C.toByte) ++ w16(0) ++ w16(0) ++ w16(2) ++ w16(2) ++
        Array(0x81.toByte) ++ pal2 ++
        Array(2.toByte, f2.length.toByte) ++ f2 ++
        Array(0.toByte, 0x3B.toByte)
    val g = GifCodec.decode(bytes)
    assert(g != null && g.indexFrames == null && g.frames.length == 2)
    val sampled = GifCodec.frameSample(bytes, 1) // keep both frames
    assert(sampled != null)
    val s = GifCodec.decode(sampled)
    assert(s != null && s.frames.length == 2)
    assert(s.frames(0).toSeq == g.frames(0).toSeq)
    assert(s.frames(1).toSeq == g.frames(1).toSeq)
  }

  test("meta and pixel-stats routing; malformed inputs decode to null") {
    val b = GifCodec.synthGif(4L, UTF8String.fromString("meta"))
    val m = GifCodec.metaInternal(b)
    assert(m.getInt(2) == 2 && m.getInt(3) == 8) // 2 frames, 8 colors
    val st = ImageCodec.pixelStatsInternal(b)
    assert(st != null && st.getLong(2) ==
      m.getInt(0).toLong * m.getInt(1) * m.getInt(2))
    val viaMeta = ImageCodec.decodeMetaInternal(b)
    assert(viaMeta.getUTF8String(0).toString == "gif")
    assert(GifCodec.decode("GIF89a".getBytes) == null)
    assert(GifCodec.decode("NOTGIF".getBytes ++ b.drop(6)) == null)
    assert(GifCodec.decode(b.take(b.length - 2)) == null) // lost trailer+data
    assert(GifCodec.frameSample(b, 0) == null)
    // corrupt LZW payload: flip bits inside the first data sub-block
    val corrupt = b.clone()
    var i = 13 + 24 + 10 + 1 + 1 // header+GCT+descriptor+mcs+subblock len
    while (i < math.min(corrupt.length, i + 4)) {
      corrupt(i) = (corrupt(i) ^ 0xFF).toByte; i += 1
    }
    // must be null or a structurally valid decode — never a crash
    GifCodec.decode(corrupt)
  }
}
