package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** TIFF codec: both byte orders, gray/RGB/palette photometrics,
  * PackBits RLE, multi-strip assembly, and cross-validation against the
  * JDK's independent ImageIO TIFF plugin (test oracle only). */
class TiffCodecSpec extends AnyFunSuite {

  private def rgbOf(t: TiffCodec.TiffImage, x: Int, y: Int): (Int, Int, Int) = {
    val p = (y * t.width + x) * 3
    (t.rgb(p) & 0xFF, t.rgb(p + 1) & 0xFF, t.rgb(p + 2) & 0xFF)
  }

  test("packBits: round-trips runs, literals, and boundary cases") {
    val rnd = new scala.util.Random(3)
    def unpack(data: Array[Byte], expected: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < data.length) {
        val n = data(i).toInt; i += 1
        if (n >= 0) { out.write(data, i, n + 1); i += n + 1 }
        else if (n != -128) {
          for (_ <- 0 until 1 - n) out.write(data(i)); i += 1
        }
      }
      assert(out.size() == expected)
      out.toByteArray
    }
    for (trial <- 0 until 20) {
      // mixed entropy: long runs interleaved with noise
      val n = 1 + rnd.nextInt(2000)
      val data = new Array[Byte](n)
      var i = 0
      while (i < n) {
        if (rnd.nextBoolean()) {
          val run = math.min(n - i, 1 + rnd.nextInt(300))
          java.util.Arrays.fill(data, i, i + run, rnd.nextInt(256).toByte)
          i += run
        } else { data(i) = rnd.nextInt(256).toByte; i += 1 }
      }
      val packed = TiffCodec.packBits(data)
      assert(unpack(packed, n).toSeq == data.toSeq, s"trial $trial n=$n")
    }
    assert(TiffCodec.packBits(Array.emptyByteArray).isEmpty)
    assert(unpack(TiffCodec.packBits(Array[Byte](5)), 1).toSeq == Seq(5.toByte))
  }

  test("synth round-trip: every photometric × endianness × compression decodes exact") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, -2L)) {
      val text = UTF8String.fromString("t" * (math.abs(id).toInt % 30 + 2))
      val n = text.numBytes
      val b = TiffCodec.synthTiff(id, text)
      val t = TiffCodec.decode(b)
      assert(t != null, s"id=$id")
      assert(t.width == n % 19 + 4 && t.height == n % 9 + 3)
      val pm = java.lang.Math.floorMod(id, 3L).toInt + 1
      assert(t.photometric == pm)
      assert(t.bigEndian == (java.lang.Math.floorMod(id, 2L) == 1L))
      assert((t.compression == 32773) == (java.lang.Math.floorMod(id, 2L) == 0L))
      def fm(v: Long): Int = java.lang.Math.floorMod(v, 256L).toInt
      for (y <- 0 until t.height; x <- 0 until t.width) {
        val want = pm match {
          case 1 =>
            val v = fm(x * 3 + y * 5 + id); (v, v, v)
          case 2 =>
            (fm(x * 3 + y * 5 + id), fm(x * 5 + y * 6 + id * 2),
              fm(x * 7 + y * 7 + id * 3))
          case 3 =>
            val k = fm(x * 3 + y * 5 + id)
            (fm(k * 31 + id), fm(k * 57 + id * 2), fm(k * 89 + id * 3))
        }
        assert(rgbOf(t, x, y) == want, s"id=$id ($x,$y) pm=$pm")
      }
    }
  }

  test("WhiteIsZero (photometric 0) inverts samples") {
    val samples = Array.tabulate(6 * 4)(i => (i * 10).toByte)
    val b = TiffCodec.encodeTiff(6, 4, 0, samples, null,
      bigEndian = false, packbits = false)
    // photometric 0 encodes through the gray path but must invert on read
    val patched = b.clone()
    val t0 = TiffCodec.decode(b)
    assert(t0 != null)
    for (y <- 0 until 4; x <- 0 until 6) {
      val raw = (samples(y * 6 + x) & 0xFF)
      assert(rgbOf(t0, x, y) == (255 - raw, 255 - raw, 255 - raw))
    }
    assert(patched.toSeq == b.toSeq) // decode must not mutate input
  }

  test("cross-validation: javax.imageio reads our TIFFs pixel-exact") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L)) {
      val b = TiffCodec.synthTiff(id, UTF8String.fromString("imageio-tiff"))
      val ours = TiffCodec.decode(b)
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
      assert(readers.hasNext, "JDK TIFF plugin missing")
      val rd = readers.next()
      rd.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b)))
      val img = rd.read(0)
      assert(img.getWidth == ours.width && img.getHeight == ours.height)
      val raster = img.getRaster
      val indexed = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        // getRGB gamma-converts linear gray to sRGB — compare raw
        // raster samples (through the palette for indexed images)
        val want =
          if (indexed) {
            val argb = img.getRGB(x, y)
            ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
          } else if (raster.getNumBands == 1) {
            val v = raster.getSample(x, y, 0); (v, v, v)
          } else (raster.getSample(x, y, 0), raster.getSample(x, y, 1),
            raster.getSample(x, y, 2))
        assert(rgbOf(ours, x, y) == want, s"id=$id ($x,$y)")
      }
    }
  }

  test("cross-validation: our decoder reads javax.imageio-written TIFFs") {
    val w = 17; val h = 7
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 13) % 256 << 16) | ((y * 31) % 256 << 8) | ((x * y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val t = TiffCodec.decode(bos.toByteArray)
    // the JDK plugin may choose features we don't decode (e.g. LZW);
    // only assert WHEN it produced a baseline layout we claim
    if (t != null) {
      assert(t.width == w && t.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        assert(rgbOf(t, x, y) ==
          (((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)), s"($x,$y)")
      }
    } else succeed
  }

  test("multi-strip assembly: rowsPerStrip smaller than height, both compressions") {
    val samples = Array.tabulate(8 * 11)(i => ((i * 7) % 256).toByte)
    for (pb <- Seq(false, true); be <- Seq(false, true)) {
      val b = TiffCodec.encodeTiff(8, 11, 1, samples, null, be, pb,
        rowsPerStrip = 2)
      val t = TiffCodec.decode(b)
      assert(t != null, s"pb=$pb be=$be")
      for (y <- 0 until 11; x <- 0 until 8) {
        val v = samples(y * 8 + x) & 0xFF
        assert(rgbOf(t, x, y) == (v, v, v), s"pb=$pb be=$be ($x,$y)")
      }
    }
  }

  test("meta, stats routing, and malformed inputs") {
    val b = TiffCodec.synthTiff(1L, UTF8String.fromString("meta"))
    val m = TiffCodec.metaInternal(b)
    assert(m.getInt(3) == 2 && m.getBoolean(5)) // RGB, big-endian (id=1)
    val st = ImageCodec.pixelStatsInternal(b)
    assert(st != null && st.getLong(2) == m.getInt(0).toLong * m.getInt(1))
    assert(ImageCodec.decodeMetaInternal(b).getUTF8String(0).toString == "tiff")
    assert(TiffCodec.decode(b.take(6)) == null)
    assert(TiffCodec.decode("XXXX1234".getBytes) == null)
    // truncated strip data
    assert(TiffCodec.decode(b.take(b.length / 2)) == null)
    // IFD pointer past the end
    val bad = b.clone(); bad(4) = 0xFF.toByte; bad(5) = 0xFF.toByte
    assert(TiffCodec.decode(bad) == null)
  }
}
