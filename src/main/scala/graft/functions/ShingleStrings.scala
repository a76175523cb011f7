package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle STRINGS of normalized text — the
  * string-valued sibling of [[ShingleHashes]], for the engine-portable
  * dedup paths that hash shingles with md5 (so an external SQL oracle
  * can recompute them). Same tokenizer, same first-occurrence dedupe,
  * same fewer-than-n fallback; one JIT'd scan per row instead of the
  * interpreted HOF pipeline (measured ~6 s of pure shingling at 50k
  * docs via transform+slice+concat_ws).
  */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val tokens = new java.util.ArrayList[String]()
    val tok = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) tok.append(c)
      else if (tok.length > 0) { tokens.add(tok.toString); tok.setLength(0) }
      i += 1
    }
    if (tok.length > 0) tokens.add(tok.toString)

    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[UTF8String]()
    val m = tokens.size()
    if (m < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < m) { if (j > 0) sb.append(' '); sb.append(tokens.get(j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
    } else {
      var start = 0
      val sb = new java.lang.StringBuilder
      while (start + n <= m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens.get(start + j))
          j += 1
        }
        val sh = sb.toString
        if (seen.add(sh)) out.add(UTF8String.fromString(sh))
        start += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def shingle_strings(c: Column, n: Int = 3): Column =
    GraftSqlBridge.column(ShingleStrings(GraftSqlBridge.expression(c), n))
}

/** ALL word n-grams of normalized text, duplicates kept, in document
  * order — the MULTISET sibling of [[ShingleStrings]] (which dedupes,
  * and falls back to the whole text below n tokens): diversity metrics
  * like distinct-n need every occurrence counted, and fewer than n
  * tokens yields NO grams (matching the `when(size >= n, ...)
  * .otherwise(array())` contract of the interpreted pipeline it
  * replaces — measured 4.3 s of the exact gate's 4.6 s at sf0.1 was
  * the HOF transform+slice+concat_ws, vs one JIT'd scan here). */
case class NgramStrings(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings"

  override def nullSafeEval(input: Any): Any =
    NgramStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramStrings =
    copy(child = newChild)
}

object NgramStrings {

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val tokens = new java.util.ArrayList[String]()
    val tok = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) tok.append(c)
      else if (tok.length > 0) { tokens.add(tok.toString); tok.setLength(0) }
      i += 1
    }
    if (tok.length > 0) tokens.add(tok.toString)

    val m = tokens.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder
    var start = 0
    while (start + n <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.get(start + j))
        j += 1
      }
      out(start) = UTF8String.fromString(sb.toString)
      start += 1
    }
    new GenericArrayData(out)
  }

  def ngram_strings(c: Column, n: Int): Column =
    GraftSqlBridge.column(NgramStrings(GraftSqlBridge.expression(c), n))
}
