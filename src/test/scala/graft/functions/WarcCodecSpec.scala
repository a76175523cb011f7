package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** WARC parsing: hand-built records, HTTP payload extraction, truncated
  * tails, and the synth round-trip. */
class WarcCodecSpec extends AnyFunSuite {

  private def parse(b: Array[Byte]) = Option(WarcCodec.parseInternal(b))
    .map(a => (0 until a.numElements()).map(i =>
      a.getStruct(i, 7)).toSeq)

  test("hand-built response record: headers, status, content-type, body slice") {
    val body = "<html>hi</html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n$body"
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.com/x\r\n" +
      "WARC-Date: 2024-06-01T12:00:00Z\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n" + http + "\r\n\r\n"
    val rs = parse(rec.getBytes).get
    assert(rs.length == 1)
    val r = rs.head
    assert(r.getUTF8String(0).toString == "response")
    assert(r.getUTF8String(1).toString == "https://example.com/x")
    assert(r.getUTF8String(2).toString == "2024-06-01T12:00:00Z")
    assert(r.getLong(3) == http.length.toLong)
    assert(r.getInt(4) == 200)
    assert(r.getUTF8String(5).toString == "text/html; charset=utf-8")
    assert(new String(r.getBinary(6)) == body)
  }

  test("multi-record walk, non-http payloads, binary-safe bodies") {
    val p1 = "raw-bytes-"
    val rec1 = "WARC/1.0\r\nWARC-Type: request\r\n" +
      s"Content-Length: ${p1.getBytes.length}\r\n\r\n$p1\r\n\r\n"
    val rec2 = "WARC/1.1\r\nWARC-Type: warcinfo\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val rs = parse((rec1 + rec2).getBytes).get
    assert(rs.length == 2)
    assert(rs(0).getUTF8String(0).toString == "request")
    assert(rs(0).isNullAt(4) && rs(0).isNullAt(5))
    assert(rs(0).getBinary(6).toSeq == p1.getBytes.toSeq)
    assert(rs(1).getUTF8String(0).toString == "warcinfo")
    assert(rs(1).getLong(3) == 0L)
    assert(rs(1).isNullAt(1)) // no target URI header
  }

  test("truncated tail keeps complete records; garbage/empty input is null") {
    val good = "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    val cut = good + "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort"
    val rs = parse((cut).getBytes).get
    assert(rs.length == 1 && rs.head.getUTF8String(0).toString == "metadata")
    assert(parse("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
    // missing mandatory WARC-Type ends the walk before any record
    assert(parse("WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes).isEmpty)
  }

  test("synth round-trip matches the documented field rules") {
    for (id <- Seq(0L, 1L, 2L, 7L)) {
      val rs = parse(WarcCodec.synthWarc(id,
        UTF8String.fromString("unused"))).get
      assert(rs.length == java.lang.Math.floorMod(id, 3L).toInt + 1)
      rs.zipWithIndex.foreach { case (r, i) =>
        val ty = java.lang.Math.floorMod(id + i, 3L).toInt
        val want = ty match {
          case 0 => "response"; case 1 => "request"; case _ => "metadata"
        }
        assert(r.getUTF8String(0).toString == want)
        assert(r.getUTF8String(1).toString ==
          s"https://site${java.lang.Math.floorMod(id, 11L)}.example/p/$i")
        assert(new String(r.getBinary(6)) == s"payload-$id-$i")
        if (ty == 0) {
          val wantStatus = java.lang.Math.floorMod(id + i + 1, 3L).toInt match {
            case 0 => 200; case 1 => 404; case _ => 301
          }
          assert(r.getInt(4) == wantStatus)
          assert(r.getUTF8String(5).toString == "text/html")
        } else assert(r.isNullAt(4))
      }
    }
  }

  test("gzip member chain: .warc.gz parses to the exact plain-container fields") {
    for (id <- Seq(0L, 1L, 2L, 7L, 23L)) {
      val plain = parse(WarcCodec.synthWarc(id, UTF8String.fromString("u"))).get
      val gz = parse(WarcCodec.synthWarcGz(id, UTF8String.fromString("u"))).get
      assert(gz.length == plain.length, s"id $id")
      gz.zip(plain).foreach { case (g, p) =>
        (0 until 7).foreach { f =>
          assert(g.isNullAt(f) == p.isNullAt(f))
          if (!g.isNullAt(f)) f match {
            case 3 => assert(g.getLong(3) == p.getLong(3))
            case 4 => assert(g.getInt(4) == p.getInt(4))
            case 6 => assert(g.getBinary(6).toSeq == p.getBinary(6).toSeq)
            case i => assert(g.getUTF8String(i).toString ==
              p.getUTF8String(i).toString)
          }
        }
      }
    }
  }

  test("gzip corruption: bad first header is null, later corruption keeps prefix") {
    val gz = WarcCodec.synthWarcGz(2L, UTF8String.fromString("u")) // 3 members
    // flip a byte inside the FIRST member's deflate stream
    val broken = gz.clone(); broken(12) = (broken(12) ^ 0x55).toByte
    // either null (unreadable) or fewer records than the clean parse —
    // never an exception, never fabricated records
    val cleanN = parse(gz).get.length
    val b = parse(broken)
    assert(b.isEmpty || b.get.length <= cleanN)
    // truncated mid-stream: complete earlier members survive, the
    // half-inflated tail record is dropped
    val cut = java.util.Arrays.copyOfRange(gz, 0, gz.length / 2)
    val c = parse(cut)
    assert(c.isEmpty || c.get.length < cleanN)
    // a lone valid member still parses
    val one = parse({
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n".getBytes)
      g.finish(); bos.toByteArray
    }).get
    assert(one.length == 1 && one.head.getUTF8String(0).toString == "metadata")
  }
}
