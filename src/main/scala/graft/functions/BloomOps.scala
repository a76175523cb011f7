package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a SERIALIZED Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter` wire format — Spark's
  * own public sketch, so filters built by `df.stat.bloomFilter` or
  * persisted to disk by an earlier run probe here unchanged). The
  * filter bytes ride the expression itself (plan-literal, shipped once
  * per task via the serialized plan, deserialized once per executor
  * thread), NOT a per-row argument — the probe inside whole-stage
  * codegen is a few XXH64 hashes against a bit array.
  *
  * Long keys probe `mightContainLong`; string keys probe the UTF-8
  * bytes (`mightContainBinary`), matching what `stat.bloomFilter` put
  * for Java strings. Null input → null. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  require(filterBytes != null && filterBytes.nonEmpty, "empty bloom filter")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs a long/int/string key, got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = child.nullable

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  /** Probe used by BOTH eval paths (referenced from generated code). */
  def probe(v: Any): Boolean = v match {
    case l: java.lang.Long => filter.mightContainLong(l)
    case i: java.lang.Integer => filter.mightContainLong(i.longValue())
    case s: UTF8String => filter.mightContainBinary(s.getBytes)
    case other => throw new IllegalArgumentException(
      s"bloom_might_contain: unsupported key ${other.getClass}")
  }

  override def nullSafeEval(input: Any): Any = probe(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the EXPRESSION is the reference object: its lazy `filter`
    // deserializes once per task, and generated code probes through it
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $ref.filterRef().mightContainLong($c);")
      case IntegerType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $ref.filterRef().mightContainLong((long) $c);")
      case _ =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $ref.filterRef().mightContainBinary($c.getBytes());")
    }
  }

  /** Public accessor for generated code (lazy vals are private in
    * bytecode-unfriendly ways under codegen's Janino compiler). */
  def filterRef(): BloomFilter = filter

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // filterBytes can be megabytes — keep it out of tree strings
  override def toString: String =
    s"bloom_might_contain($child, <${filterBytes.length}B filter>)"
  override def simpleString(maxFields: Int): String = toString
}

object BloomOps {
  /** Build a serialized Bloom filter over a column — persist the bytes
    * (e.g. a decontamination / opt-out id list built once, reused by
    * every later run) or feed [[mightContain]] directly. Distributed
    * build via Spark's own sketch aggregate; the driver holds only the
    * final bit array (~1.2 GB per 10⁹ keys at 1% fpp — size it). */
  def buildFilter(df: org.apache.spark.sql.DataFrame, col: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(col, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(BloomMightContain(
      org.apache.spark.sql.GraftSqlBridge.expression(key), filterBytes))
}
