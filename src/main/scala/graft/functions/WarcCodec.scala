package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) record
  * parsing for binary columns: a 100 TB web-corpus pipeline's first
  * step is splitting WARC payloads into records and their HTTP
  * responses. `warc_records` walks `WARC/1.x` version blocks, reads the
  * named headers, slices each payload by its Content-Length, and for
  * `application/http` response payloads additionally parses the HTTP
  * status line, Content-Type header, and body offset — one pass, zero
  * copies until the body slice.
  *
  * The expression returns an ARRAY of record structs (explode to one
  * row per record) — a pure projection, so splitting stays inside
  * whole-stage codegen next to the scan that read the file bytes.
  * Malformed input → null array; a record with a bad length or missing
  * mandatory header ends the walk (records before it are kept —
  * truncated tails are how real WARCs arrive). */
case class WarcRecords(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(WarcCodec.recordSchema)
  override def prettyName: String = "warc_records"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    WarcCodec.parseInternal(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcCodec.parseInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

/** `(id, utf8 content) → real WARC bytes` — deterministic multi-record
  * synthesizer: 1–3 records per document cycling response/request/
  * metadata types, every field affine in (id, record index) so the
  * oracle recomputes them without parsing a byte. */
case class WarcSynth(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "warc_synth"
  override def nullSafeEval(id: Any, text: Any): Any =
    WarcCodec.synthWarc(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.WarcCodec.synthWarc($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WarcSynth =
    copy(left = newLeft, right = newRight)
}

/** [[WarcSynth]]'s records as real `.warc.gz` bytes — one gzip member
  * per record, concatenated (the Common Crawl wire layout). */
case class WarcSynthGz(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "warc_synth_gz"
  override def nullSafeEval(id: Any, text: Any): Any =
    WarcCodec.synthWarcGz(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.WarcCodec.synthWarcGz($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WarcSynthGz =
    copy(left = newLeft, right = newRight)
}

object WarcCodec {
  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),    // response payloads only
    StructField("http_content_type", StringType),
    StructField("body", BinaryType)))           // HTTP body, or raw payload

  private val MAX_RECORDS = 1 << 16

  /** Decompressed-size cap (zip-bomb guard): inflation stops here and
    * the truncated tail falls under the parser's normal truncation
    * tolerance — records before the cut are kept, never a task OOM. */
  private val MAX_INFLATED = 512 << 20

  /** ASCII line starting at `i`, up to CRLF; returns (line, nextIndex)
    * or null at a malformed/unterminated line. */
  private def line(b: Array[Byte], i: Int): (String, Int) = {
    var j = i
    while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
    if (j + 1 >= b.length) return null
    (new String(b, i, j - i, java.nio.charset.StandardCharsets.UTF_8), j + 2)
  }

  /** Parse a header block at `i` → (lowercased name → value, bodyStart)
    * or null. */
  private def headers(b: Array[Byte], i: Int): (Map[String, String], Int) = {
    var pos = i
    val m = scala.collection.mutable.Map.empty[String, String]
    var done = false
    while (!done) {
      val l = line(b, pos)
      if (l == null) return null
      pos = l._2
      if (l._1.isEmpty) done = true
      else {
        val c = l._1.indexOf(':')
        if (c <= 0) return null
        m(l._1.substring(0, c).trim.toLowerCase) = l._1.substring(c + 1).trim
      }
    }
    (m.toMap, pos)
  }

  /** Entry point: sniffs the gzip magic and inflates first — real
    * Common Crawl `.warc.gz` files are a CONCATENATION of gzip members
    * (one per record, RFC 1952 multi-member), which inflates to the
    * plain container the walker below already handles. */
  def parseInternal(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    if ((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      val raw = gunzipMembers(b)
      if (raw == null) return null
      return parsePlain(raw)
    }
    parsePlain(b)
  }

  /** Inflate every gzip member in sequence (GZIPInputStream chains
    * RFC 1952 members natively). A corrupt header on the FIRST member
    * → null (malformed input); corruption later keeps the prefix —
    * the parser's truncated-tail tolerance applies. */
  private def gunzipMembers(b: Array[Byte]): Array[Byte] = {
    // size hint in LONG space: b.length * 4 overflows Int past 512 MiB
    // and a negative hint throws OUTSIDE any catch
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 4, 1L << 20).toInt)
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size < MAX_INFLATED) {
        out.write(buf, 0, math.min(n, MAX_INFLATED - out.size))
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException =>
        if (out.size == 0) null else out.toByteArray
    } finally {
      // releases the native Inflater NOW — leaving it to the cleaner
      // leaks off-heap zlib buffers across millions of rows
      if (in != null) try in.close() catch { case _: java.io.IOException => }
    }
  }

  private def parsePlain(b: Array[Byte]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    var first = true
    while (i < b.length && out.length < MAX_RECORDS) {
      // skip inter-record CRLFs
      while (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
      if (i >= b.length) return done(out, first)
      val v = line(b, i)
      if (v == null || !v._1.startsWith("WARC/1."))
        return if (first) null else done(out, first)
      val h = headers(b, v._2)
      if (h == null) return done(out, first)
      val (hdrs, payloadStart) = h
      val clen = hdrs.get("content-length").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(-1L)
      if (clen < 0 || payloadStart + clen > b.length) return done(out, first)
      val wtype = hdrs.getOrElse("warc-type", null)
      if (wtype == null) return done(out, first)
      val uri = hdrs.get("warc-target-uri").orNull
      val date = hdrs.get("warc-date").orNull
      var status: Any = null
      var ctype: Any = null
      var bodyOff = payloadStart
      var bodyLen = clen.toInt
      val isHttp = hdrs.get("content-type")
        .exists(_.toLowerCase.startsWith("application/http"))
      if (isHttp && clen > 0) {
        val sl = line(b, payloadStart)
        if (sl != null && sl._1.startsWith("HTTP/")) {
          val parts = sl._1.split(" ")
          if (parts.length >= 2)
            status = scala.util.Try(parts(1).toInt).toOption
              .map(Int.box).orNull
          val hh = headers(b, sl._2)
          if (hh != null && hh._2 <= payloadStart + clen) {
            ctype = hh._1.get("content-type").map(UTF8String.fromString).orNull
            bodyOff = hh._2
            bodyLen = (payloadStart + clen - hh._2).toInt
          }
        }
      }
      out += InternalRow(
        UTF8String.fromString(wtype),
        if (uri == null) null else UTF8String.fromString(uri),
        if (date == null) null else UTF8String.fromString(date),
        clen, status, ctype,
        java.util.Arrays.copyOfRange(b, bodyOff, bodyOff + bodyLen))
      i = (payloadStart + clen).toInt
      first = false
    }
    done(out, first)
  }

  private def done(out: scala.collection.mutable.ArrayBuffer[InternalRow],
      none: Boolean): GenericArrayData =
    if (none) null else new GenericArrayData(out.toArray[Any])

  // ------------------------------------------------------------ synthesis

  /** Deterministic WARC: nrec = floorMod(id,3)+1 records; record r is
    * type response/request/metadata by floorMod(id+r,3) (0/1/2); uri =
    * `https://site{floorMod(id,11)}.example/p/{r}`; responses carry an
    * HTTP payload with status 200/404/301 by floorMod(id+r,3) of the
    * NEXT index (r+1), text/html content type, and body
    * `payload-{id}-{r}`; non-responses carry the raw body bytes. */
  private def synthRecord(id: Long, r: Int): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      sb.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val t = java.lang.Math.floorMod(id + r, 3L).toInt
    val wtype = t match {
      case 0 => "response"; case 1 => "request"; case _ => "metadata"
    }
    val uri = s"https://site${java.lang.Math.floorMod(id, 11L)}.example/p/$r"
    val body = s"payload-$id-$r"
    val payload =
      if (t == 0) {
        val status = java.lang.Math.floorMod(id + r + 1, 3L).toInt match {
          case 0 => "200 OK"; case 1 => "404 Not Found"
          case _ => "301 Moved Permanently"
        }
        s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n$body"
      } else body
    w("WARC/1.0\r\n")
    w(s"WARC-Type: $wtype\r\n")
    w(s"WARC-Target-URI: $uri\r\n")
    w("WARC-Date: 2024-01-01T00:00:00Z\r\n")
    if (t == 0) w("Content-Type: application/http;msgtype=response\r\n")
    w(s"Content-Length: ${payload.getBytes.length}\r\n")
    w("\r\n")
    w(payload)
    w("\r\n\r\n")
    sb.toByteArray
  }

  def synthWarc(id: Long, text: UTF8String): Array[Byte] = {
    val nrec = java.lang.Math.floorMod(id, 3L).toInt + 1
    val sb = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < nrec) { sb.write(synthRecord(id, r)); r += 1 }
    sb.toByteArray
  }

  /** The same records as [[synthWarc]] but as REAL `.warc.gz` bytes:
    * each record its own gzip member, members concatenated — the
    * Common Crawl wire layout. */
  def synthWarcGz(id: Long, text: UTF8String): Array[Byte] = {
    val nrec = java.lang.Math.floorMod(id, 3L).toInt + 1
    val sb = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < nrec) {
      val gz = new java.util.zip.GZIPOutputStream(sb)
      gz.write(synthRecord(id, r))
      gz.finish()
      gz.close() // release the native Deflater immediately
      r += 1
    }
    sb.toByteArray
  }

  // ---------------------------------------------------------- Column API

  def warc_records(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(WarcRecords(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))
  def warc_synth(id: Column, text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(WarcSynth(
      org.apache.spark.sql.GraftSqlBridge.expression(id),
      org.apache.spark.sql.GraftSqlBridge.expression(text)))
  def warc_synth_gz(id: Column, text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(WarcSynthGz(
      org.apache.spark.sql.GraftSqlBridge.expression(id),
      org.apache.spark.sql.GraftSqlBridge.expression(text)))
}
