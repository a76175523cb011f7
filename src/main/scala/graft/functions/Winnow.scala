package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint SELECTION as one native kernel per row: the
  * positional-shingle hash stream, the sliding-window minima, and the
  * distinct-selection all fold in a single pass over the document —
  * no tokens-sized explode, no per-doc window sort, ZERO shuffle until
  * the (already ~2/(w+1)-sampled) selected fingerprints leave the row.
  * Bit-identical to the explode+window SQL formulation the DuckDB
  * oracle runs (and to [[graft.operators.Dedup.winnowFingerprintsSql]],
  * the parity twin): same normalizer (lowercase alnum runs), same
  * whole-text fallback under `shingleN` tokens, same truncated single
  * window for docs shorter than a full window, same md5-hex-prefix
  * fingerprint domain. Empty/blank text selects nothing. */
case class WinnowSelect(child: Expression, shingleN: Int, window: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(shingleN >= 1 && window >= 1, "shingleN and window must be >= 1")
  override def inputTypes: Seq[DataType] =
    Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    Winnow.select(input.asInstanceOf[UTF8String], shingleN, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnow.select($c, $shingleN, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object Winnow {

  private def md5hex16(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < 8) { // 16 hex chars = first 8 bytes
      sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(d(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  def select(text: UTF8String, n: Int, w: Int): GenericArrayData = {
    val norm = text.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]+", " ").trim
    if (norm.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = norm.split(" ")
    val fps: Array[String] =
      if (toks.length >= n) {
        val out = new Array[String](toks.length - n + 1)
        var i = 0
        while (i < out.length) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          out(i) = md5hex16(sb.toString); i += 1
        }
        out
      } else Array(md5hex16(toks.mkString(" ")))
    val lastStart = math.max(fps.length - w, 0)
    val sel = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= lastStart) {
      var m = fps(i)
      val end = math.min(i + w, fps.length)
      var j = i + 1
      while (j < end) { if (fps(j).compareTo(m) < 0) m = fps(j); j += 1 }
      sel.add(m); i += 1
    }
    val arr = new Array[Any](sel.size)
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  def winnow_select(c: Column, shingleN: Int = 3, window: Int = 4): Column =
    GraftSqlBridge.column(WinnowSelect(GraftSqlBridge.expression(c), shingleN, window))
}
