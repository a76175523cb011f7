package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics for the Gopher-style quality
  * filters: per-document unigram/bigram counting as a single JIT'd
  * kernel, replacing TWO explode → two-level-aggregate pipelines (the
  * token and bigram shuffles were the whole cost of
  * `repetitionSignals`/`gopherFilter` — the per-document state here is
  * bounded by the document itself, the same memory the reduce side of
  * the aggregate held per (doc, gram) group).
  *
  * Semantics are EXACTLY the Column formulation they replace (pinned
  * by the DuckDB oracle gates): `split(trim(text), "\s+")` with
  * Spark's space-only trim and Java-regex split (empty tokens from
  * leading non-space whitespace included), bigrams join adjacent
  * tokens with one space, and the fractions divide as doubles in the
  * same order.
  *
  * Output struct: (n_tokens, top_count, n_bigrams, dup_bigrams).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_bigrams", LongType, nullable = false)))

  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    // Spark's trim() strips ASCII SPACE only — not \t/\n — and split
    // keeps leading/trailing empty tokens (limit -1): replicate both.
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val trimmed = s.substring(b, e)
    val tokens: Array[String] =
      if (trimmed.isEmpty) Array("") else ws.split(trimmed, -1)
    val m = tokens.length
    val uni = new java.util.HashMap[String, Long]()
    var topCount = 0L
    var i = 0
    while (i < m) {
      val c = uni.merge(tokens(i), 1L, (a, b) => a + b)
      if (c > topCount) topCount = c
      i += 1
    }
    val seen = new java.util.HashSet[String]()
    var distinctBigrams = 0L
    i = 0
    while (i < m - 1) {
      if (seen.add(tokens(i) + " " + tokens(i + 1))) distinctBigrams += 1
      i += 1
    }
    val nBigrams = math.max(0, m - 1).toLong
    InternalRow(m.toLong, topCount, nBigrams, nBigrams - distinctBigrams)
  }

  def repetition_stats(c: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(c)))
}
