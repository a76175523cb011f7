package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd container codec for the multimodal column family
  * ([[graft.operators.Multimodal]]): the fixed-offset header parse is a
  * native Catalyst expression over `BinaryType`, so header decode stays
  * inside whole-stage codegen with column pruning intact — no
  * `df.rdd` boundary, no Row deserialization (the boundary measured ~3×
  * a comparable projection at sf0.1). The batched `mapPartitions`
  * shape remains available for genuinely swappable kernels via
  * [[graft.operators.Multimodal.mapPayloadBatches]].
  */
case class MultimodalMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MultimodalCodec.metaSchema
  override def prettyName: String = "multimodal_meta"

  // header-less / wrong-magic payloads decode to null (robustness path)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MultimodalCodec.decodeMetaInternal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MultimodalCodec.decodeMetaInternal($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MultimodalMeta =
    copy(child = newChild)
}

/** `(id, utf8 content) → container payload` — the ingest twin, also
  * codegen'd. Modality = id % 3 (deterministic, oracle-recomputable). */
case class MultimodalEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "multimodal_encode"

  override def nullSafeEval(id: Any, text: Any): Any =
    MultimodalCodec.encodeFromText(id.asInstanceOf[Long],
      text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, text) =>
      s"graft.functions.MultimodalCodec.encodeFromText($id, $text)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultimodalEncode =
    copy(left = newLeft, right = newRight)
}

object MultimodalCodec {
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("payload_bytes", IntegerType)))

  private val MAGIC = Array[Byte]('G', 'F', 'T', 'M')

  /** Header parse → InternalRow, null when the magic is absent. Layout:
    * magic "GFTM" | modality u8 | width u16 | height u16 | channels u8 |
    * sampleRate u32 | payload. */
  def decodeMetaInternal(payload: Array[Byte]): InternalRow = {
    if (payload == null || payload.length < 14 ||
        payload(0) != MAGIC(0) || payload(1) != MAGIC(1) ||
        payload(2) != MAGIC(2) || payload(3) != MAGIC(3)) null
    else {
      val modality = payload(4) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
      }
      val width = ((payload(5) & 0xFF) << 8) | (payload(6) & 0xFF)
      val height = ((payload(7) & 0xFF) << 8) | (payload(8) & 0xFF)
      val channels = payload(9) & 0xFF
      val sampleRate = ((payload(10) & 0xFF) << 24) | ((payload(11) & 0xFF) << 16) |
        ((payload(12) & 0xFF) << 8) | (payload(13) & 0xFF)
      InternalRow(UTF8String.fromString(modality), width, height, channels,
        sampleRate, payload.length - 14)
    }
  }

  def encodeFromText(id: Long, text: UTF8String): Array[Byte] =
    graft.operators.Multimodal.encodePayload(text.getBytes,
      (((id % 3) + 3) % 3).toByte)

  def multimodal_meta(c: Column): Column =
    GraftSqlBridge.column(MultimodalMeta(GraftSqlBridge.expression(c)))

  def multimodal_encode(id: Column, text: Column): Column =
    GraftSqlBridge.column(MultimodalEncode(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(text)))
}
