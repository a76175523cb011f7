package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** T5-style SPAN CORRUPTION (Raffel et al., JMLR 2020 — public): turn a
  * document into a (input, target) denoising pair by masking token
  * spans with sentinels — `input` carries `<extra_id_k>` where span k
  * was, `target` is each sentinel followed by the masked tokens plus a
  * closing sentinel. The training-data TRANSFORM step between a cleaned
  * corpus and a seq2seq objective.
  *
  * Determinism (the engine-wide portability rule): instead of the
  * paper's RNG, tokens are cut into fixed blocks of `blockLen`
  * whitespace tokens and each FULL block masks one `spanLen`-token span
  * at offset `md5(salt ‖ id ‖ '_' ‖ block) mod (blockLen − spanLen + 1)`
  * — same noise density (spanLen/blockLen) and mean span length as the
  * paper's parameterization, spans non-overlapping by construction,
  * position-independent (no sequential RNG state), so an external SQL
  * engine replays the exact pair. Trailing partial blocks stay
  * unmasked.
  *
  * One JIT'd pass per row, zero shuffle. Returns
  * `struct<input string, target string, n_spans bigint>`; documents
  * with no full block pass through with an empty target. */
case class SpanCorrupt(left: Expression, right: Expression,
    blockLen: Int, spanLen: Int, salt: String)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(spanLen >= 1 && blockLen > spanLen,
    "need 1 <= spanLen < blockLen")
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("n_spans", LongType, nullable = false)))
  override def prettyName: String = "span_corrupt"
  override def nullSafeEval(text: Any, id: Any): Any =
    SpanCorruptOps.corrupt(text.asInstanceOf[UTF8String].toString,
      id.asInstanceOf[UTF8String].toString, blockLen, spanLen, salt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, i) => s"""
      ${ev.value} = graft.functions.SpanCorruptOps.corrupt(
        $t.toString(), $i.toString(), $blockLen, $spanLen, $saltRef);
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorrupt =
    copy(left = newLeft, right = newRight)
}

object SpanCorruptOps {

  def corrupt(text: String, id: String, blockLen: Int, spanLen: Int,
      salt: String): GenericInternalRow = {
    val trimmed = text.trim
    val tokens: Array[String] =
      if (trimmed.isEmpty) Array.empty else trimmed.split("\\s+")
    val nBlocks = tokens.length / blockLen
    val starts = new Array[Int](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val h = java.lang.Long.parseLong(CdcOps.md5Hex(
        (salt + id + "_" + b).getBytes("UTF-8")).substring(0, 8), 16)
      starts(b) = b * blockLen + (h % (blockLen - spanLen + 1)).toInt
      b += 1
    }
    val in = new java.lang.StringBuilder
    val tgt = new java.lang.StringBuilder
    var span = 0
    var i = 0
    while (i < tokens.length) {
      if (span < nBlocks && i == starts(span)) {
        if (in.length > 0) in.append(' ')
        in.append("<extra_id_").append(span).append('>')
        if (tgt.length > 0) tgt.append(' ')
        tgt.append("<extra_id_").append(span).append('>')
        var j = 0
        while (j < spanLen) {
          tgt.append(' ').append(tokens(i + j)); j += 1
        }
        i += spanLen
        span += 1
      } else {
        if (in.length > 0) in.append(' ')
        in.append(tokens(i))
        i += 1
      }
    }
    if (nBlocks > 0) {
      if (tgt.length > 0) tgt.append(' ')
      tgt.append("<extra_id_").append(nBlocks).append('>')
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(in.toString),
      UTF8String.fromString(tgt.toString), nBlocks.toLong))
  }

  // ---------------------------------------------------------- Column API

  def span_corrupt(text: Column, id: Column, blockLen: Int = 20,
      spanLen: Int = 3, salt: String = ""): Column =
    org.apache.spark.sql.GraftSqlBridge.column(SpanCorrupt(
      org.apache.spark.sql.GraftSqlBridge.expression(text),
      org.apache.spark.sql.GraftSqlBridge.expression(id),
      blockLen, spanLen, salt))
}
