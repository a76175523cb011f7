package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass ENGINE-PORTABLE signatures — the md5 dedup paths'
  * signature step as one native kernel per row instead of
  * explode → shuffle-on-id → 8-60 aggregate columns.
  *
  * Bit-identical to the SQL formulation the DuckDB oracle runs
  * (`SparkEntry` portable CTEs): shingles via [[ShingleStrings]]
  * semantics (normalized tokens, first-occurrence dedupe,
  * fewer-than-n fallback — including the empty-text `[""]` shingle),
  * each shingle hashed as `parseLong(md5hex.take(k), 16)` exactly like
  * `conv(substring(md5(s),1,k),16,10)`, then minima (minhash) or bit
  * majorities (simhash) folded in the same arithmetic. What used to be
  * a full exchange of exploded (id, shingle-hash) rows — the widest
  * shuffle in both portable pipelines — becomes zero shuffle: the
  * band join is the only exchange left. */
object PortableSig {

  private def md5hex(s: UTF8String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(d(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  /** Distinct shingles (ShingleStrings semantics) as UTF8Strings. */
  private def shinglesOf(text: UTF8String, n: Int): Array[Any] =
    ShingleStrings.compute(text, n).array

  def minhashSig(text: UTF8String, n: Int, a: Array[Long], b: Array[Long],
      p: Long): GenericArrayData = {
    val shingles = shinglesOf(text, n)
    val mins = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val x = java.lang.Long.parseLong(
        md5hex(shingles(i).asInstanceOf[UTF8String]).substring(0, 8), 16)
      var k = 0
      while (k < a.length) {
        val h = (x * a(k) + b(k)) % p
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash60(text: UTF8String, n: Int): Long = {
    val shingles = shinglesOf(text, n)
    val cnt = new Array[Int](60)
    var i = 0
    while (i < shingles.length) {
      val h = java.lang.Long.parseLong(
        md5hex(shingles(i).asInstanceOf[UTF8String]).substring(0, 15), 16)
      var j = 0
      while (j < 60) { cnt(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (cnt(j) * 2 > shingles.length) sim |= 1L << j
      j += 1
    }
    sim
  }

  def md5_minhash_sig(c: Column, n: Int, a: Seq[Long], b: Seq[Long],
      p: Long): Column =
    GraftSqlBridge.column(Md5MinhashSig(GraftSqlBridge.expression(c), n, a, b, p))

  def md5_simhash60(c: Column, n: Int = 3): Column =
    GraftSqlBridge.column(Md5Simhash60(GraftSqlBridge.expression(c), n))
}

case class Md5MinhashSig(child: Expression, n: Int,
    a: Seq[Long], b: Seq[Long], p: Long) extends UnaryExpression {

  // Seq params (not Array): case-class equality on arrays is by
  // REFERENCE, which breaks canonical plan equality after tree
  // rewrites — and with it exchange/stage reuse for self-joins over
  // this expression. The kernel gets primitive arrays.
  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    PortableSig.minhashSig(input.asInstanceOf[UTF8String], n, aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableSig.minhashSig($c, $n, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinhashSig =
    copy(child = newChild)
}

case class Md5Simhash60(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash60"

  override def nullSafeEval(input: Any): Any =
    PortableSig.simhash60(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableSig.simhash60($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5Simhash60 =
    copy(child = newChild)
}
