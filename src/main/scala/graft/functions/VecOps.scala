package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native vector kernels for the similarity/dedup hot paths. The HOF
  * formulations they replace (`aggregate(zip_with(...))`) are
  * interpreted per element — srpBits ran planes×tables of them per row.
  * Every kernel reduces LEFT-TO-RIGHT in ascending index order, exactly
  * the fold order of the Column versions and of the DuckDB oracle's
  * `list_reduce`, so results are bit-identical and every oracle gate
  * stays green.
  */
object VecOps {

  private[functions] def elem(v: ArrayData, j: Int, isFloat: Boolean): Double =
    if (v.isNullAt(j)) 0.0
    else if (isFloat) v.getFloat(j).toDouble
    else v.getDouble(j)

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** cosine(a, b): dot / (|a|·|b|), 0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var j = 0
    while (j < n) { d += elem(a, j, aFloat) * elem(b, j, bFloat); j += 1 }
    var na = 0.0
    j = 0
    while (j < a.numElements()) { val x = elem(a, j, aFloat); na += x * x; j += 1 }
    var nb = 0.0
    j = 0
    while (j < b.numElements()) { val x = elem(b, j, bFloat); nb += x * x; j += 1 }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else d / nn
  }

  def cosineToQuery(v: ArrayData, q: Array[Double], qNorm: Double,
      isFloat: Boolean): Double = {
    val n = math.min(v.numElements(), q.length)
    var d = 0.0
    var j = 0
    while (j < n) { d += elem(v, j, isFloat) * q(j); j += 1 }
    var nv = 0.0
    j = 0
    while (j < v.numElements()) { val x = elem(v, j, isFloat); nv += x * x; j += 1 }
    val nn = math.sqrt(nv) * qNorm
    if (nn == 0.0) 0.0 else d / nn
  }

  /** SRP bucket bits: one '0'/'1' char per plane, plane p's components
    * at `planes[p*dim .. p*dim+dim)`. */
  def srpBits(v: ArrayData, planes: Array[Double], nPlanes: Int, dim: Int,
      isFloat: Boolean): UTF8String = {
    val out = new Array[Byte](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      val n = math.min(v.numElements(), dim)
      var d = 0.0
      var j = 0
      while (j < n) { d += elem(v, j, isFloat) * planes(off + j); j += 1 }
      out(p) = if (d >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def cosine_to_query(v: Column, query: Array[Double]): Column =
    GraftSqlBridge.column(CosineToQuery(GraftSqlBridge.expression(v), query))

  def srp_bits(v: Column, planes: Array[Double], nPlanes: Int, dim: Int): Column =
    GraftSqlBridge.column(SrpBits(GraftSqlBridge.expression(v), planes, nPlanes, dim))

  private[functions] def floatFlag(e: Expression): Boolean =
    isFloatArray(e.dataType)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def lf = VecOps.floatFlag(left)
  private def rf = VecOps.floatFlag(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.cosine($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class CosineToQuery(child: Expression, query: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_to_query"

  // driver-side query norm, same fold order as Seq.sum
  @transient private lazy val qNorm: Double =
    math.sqrt(query.map(x => x * x).sum)
  private def vf = VecOps.floatFlag(child)

  override def nullSafeEval(input: Any): Any =
    VecOps.cosineToQuery(input.asInstanceOf[ArrayData], query, qNorm, vf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", query, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecOps.cosineToQuery($c, $qRef, $qNorm, $vf)")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineToQuery =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case c: CosineToQuery =>
      c.child == child && java.util.Arrays.equals(c.query, query)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(query)
}

case class SrpBits(child: Expression, planes: Array[Double], nPlanes: Int,
    dim: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "srp_bits"

  private def vf = VecOps.floatFlag(child)

  override def nullSafeEval(input: Any): Any =
    VecOps.srpBits(input.asInstanceOf[ArrayData], planes, nPlanes, dim, vf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecOps.srpBits($c, $pRef, $nPlanes, $dim, $vf)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBits =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case s: SrpBits =>
      s.child == child && s.nPlanes == nPlanes && s.dim == dim &&
        java.util.Arrays.equals(s.planes, planes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + nPlanes) + java.util.Arrays.hashCode(planes)
}
