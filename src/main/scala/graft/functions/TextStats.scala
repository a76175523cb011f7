package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics for the quality/token/language operators:
  * replaces several regex passes plus interpreted higher-order-function
  * stopword filters with a single JIT'd scan per row.
  *
  * Semantics EXACTLY match the Column formulations they replace (which
  * the DuckDB oracle gate verifies):
  *  - tokens: `split(trim(text), "\s+")` — Java `\s`
  *  - stopword hit: token lowercased, then all non-[a-z] stripped, then
  *    membership in the stopword list
  *  - punct: chars in `.,;:!?` ; digits: `0-9` ; uppers: `A-Z`
  *  - subwords: per token `ceil(len/4)`
  *  - language scores: same normalization against each language's list
  *
  * Output struct: (n_chars, n_tokens, punct, digits, uppers, subwords,
  * stop_hits, s_de, s_en, s_es, s_fr).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("digits", IntegerType, nullable = false),
    StructField("uppers", IntegerType, nullable = false),
    StructField("subwords", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false)))

  private val englishStops: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextAnalysis.englishStopwords.foreach(s.add)
    s
  }
  private def langSet(code: String): java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextAnalysis.languageStopwords(code).foreach(s.add)
    s
  }
  private val deStops = langSet("de")
  private val enStops = langSet("en")
  private val esStops = langSet("es")
  private val frStops = langSet("fr")

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val nChars = s.length
    var punct, digits, uppers = 0
    var i = 0
    while (i < nChars) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1
      else if (c >= '0' && c <= '9') digits += 1
      else if (c >= 'A' && c <= 'Z') uppers += 1
      i += 1
    }

    // tokens = split(trim(s), "\s+"); preserve Spark's semantics: an
    // empty/whitespace-only string yields one empty token (count handled
    // by callers), matching split("") == [""]
    val trimmed = s.trim
    var nTokens = 0L
    var subwords = 0L
    var stopHits = 0L
    var sDe, sEn, sEs, sFr = 0
    if (trimmed.isEmpty) {
      nTokens = 1L // split("") → [""], callers special-case blank text
    } else {
      var start = 0
      val n = trimmed.length
      val norm = new java.lang.StringBuilder
      while (start < n) {
        var end = start
        while (end < n && !Character.isWhitespace(trimmed.charAt(end))) end += 1
        val tokLen = end - start
        nTokens += 1
        subwords += (tokLen + 3) / 4
        // normalized token: lowercase then strip non-[a-z]
        norm.setLength(0)
        var j = start
        while (j < end) {
          val c = Character.toLowerCase(trimmed.charAt(j))
          if (c >= 'a' && c <= 'z') norm.append(c)
          j += 1
        }
        val tok = norm.toString
        if (englishStops.contains(tok)) stopHits += 1
        if (deStops.contains(tok)) sDe += 1
        if (enStops.contains(tok)) sEn += 1
        if (esStops.contains(tok)) sEs += 1
        if (frStops.contains(tok)) sFr += 1
        start = end
        while (start < n && Character.isWhitespace(trimmed.charAt(start))) start += 1
      }
    }
    InternalRow(nChars, nTokens, punct, digits, uppers, subwords, stopHits,
      sDe, sEn, sEs, sFr)
  }

  def text_stats(c: Column): Column =
    GraftSqlBridge.column(TextStats(GraftSqlBridge.expression(c)))
}
