package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair for crawled text — the ftfy-style fix for the web's
  * most common corruption: UTF-8 bytes decoded as Windows-1252 and
  * re-saved ("café" → "cafÃ©", "—" → "â€”"). The repair inverts that
  * exact round-trip and ONLY that round-trip: each maximal non-ASCII
  * character run maps back through the cp1252 table to its original
  * bytes, and the run is replaced only when those bytes decode as
  * STRICT UTF-8 containing a multibyte sequence — a genuine "é" or "–"
  * inverts to bytes that are not valid UTF-8, so correctly-encoded
  * text is untouchable by construction. Up to 3 passes unwind doubly
  * mojibake'd text; null in → null out. */
case class FixMojibake(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Mojibake.repair(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        graft.functions.Mojibake.repair($c.toString()));
    """)
  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object Mojibake {
  /** char → the byte a "sloppy Windows-1252" decode produced it from
    * (ftfy's codec): the cp1252 table PLUS C1 passthrough for
    * 0x80–0x9F, so mojibake minted by either cp1252 or Latin-1
    * decoders inverts. U+FFFD never inverts — a strict decoder that
    * replaced an undefined byte destroyed the information. */
  private val inverse: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    val cs = java.nio.charset.Charset.forName("windows-1252")
    var b = 0
    while (b < 256) {
      val s = new String(Array(b.toByte), cs)
      if (s.length == 1 && s.charAt(0) != '�') m.put(s.charAt(0), b)
      b += 1
    }
    var c = 0x80
    while (c < 0xA0) { m.put(c.toChar, c); c += 1 }
    m
  }

  private def strictUtf8(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** One pass: replace each maximal run of non-ASCII chars whose
    * cp1252-inverse bytes decode as strict multibyte UTF-8. */
  private def pass(s: String): String = {
    var changed = false
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) < 0x80) { out.append(s.charAt(i)); i += 1 }
      else {
        var j = i
        while (j < s.length && s.charAt(j) >= 0x80) j += 1
        val run = s.substring(i, j)
        val bytes = new Array[Byte](run.length)
        var ok = true
        var k = 0
        while (ok && k < run.length) {
          val b = inverse.get(run.charAt(k))
          if (b == null) ok = false else bytes(k) = b.byteValue().toByte
          k += 1
        }
        val fixed = if (ok) strictUtf8(bytes) else null
        // require an actual multibyte decode (fixed shorter than run):
        // all-single-byte "valid UTF-8" would mean pure ASCII, which a
        // non-ASCII run can't produce — but guard anyway
        if (fixed != null && fixed.length < run.length) {
          out.append(fixed); changed = true
        } else out.append(run)
        i = j
      }
    }
    if (changed) out.toString else s
  }

  /** Repair with a 3-pass bound (unwinds double and triple encoding —
    * deeper nests don't survive real pipelines). */
  def repair(s: String): String = {
    var cur = s
    var p = 0
    while (p < 3) {
      val next = pass(cur)
      if (next eq cur) return cur
      cur = next
      p += 1
    }
    cur
  }

  def fix_mojibake(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(FixMojibake(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
