package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text curation — the first transform a
  * crawled corpus needs before any byte-identity operation (exact
  * dedup, fingerprinting, token counting): visually-identical strings
  * with different codepoint sequences (`é` vs `e`+COMBINING ACUTE)
  * must hash identically. A native codegen'd expression over the
  * JDK's `java.text.Normalizer` (the public Unicode normalization
  * algorithm, UAX #15) — no UDF, no library. Spark ships no built-in
  * for this.
  *
  * `form` is one of NFC | NFD | NFKC | NFKD, validated at plan time
  * (an invalid literal fails analysis, not a task). */
case class NfcNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  UnicodeNorm.parseForm(form) // fail at construction, not per row

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNorm.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeNorm {
  private[functions] def parseForm(form: String): java.text.Normalizer.Form =
    form match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unicode_normalize: unknown form '$other' (NFC|NFD|NFKC|NFKD)")
    }

  /** Called from generated code — must be public and cheap for the
    * already-normalized common case (`isNormalized` is a scan without
    * allocation; crawled text is mostly ASCII). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = parseForm(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c), form))
}
