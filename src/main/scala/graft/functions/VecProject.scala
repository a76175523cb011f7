package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_project(vec)` → the k dot products of a vector against a fixed
  * row matrix (principal components, a random-projection table, any
  * small linear map). The matrix rides inside the expression exactly
  * like [[NearestCentroid]]'s centroid table — broadcast with the
  * serialized plan, one JIT'd k×dim loop per row, no join and no
  * interpreted higher-order functions in the scan. */
case class VecProject(child: Expression, rows: Array[Array[Double]])
    extends UnaryExpression {
  require(rows.nonEmpty && rows.map(_.length).distinct.length == 1,
    "projection rows must be non-empty and share one dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_project"

  @transient private lazy val flat: Array[Double] = rows.flatten
  @transient private lazy val dim: Int = rows.head.length
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VecProject.project(input.asInstanceOf[ArrayData], flat, rows.length,
      dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("projRowsFlat", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecProject.project($c, $flatRef, " +
        s"${rows.length}, $dim, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case v: VecProject =>
      v.child == child && java.util.Arrays.deepEquals(
        v.rows.asInstanceOf[Array[AnyRef]], rows.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      rows.asInstanceOf[Array[AnyRef]])
}

object VecProject {
  def project(v: ArrayData, flat: Array[Double], k: Int, dim: Int,
      isFloat: Boolean): GenericArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var d = 0.0
      val off = r * dim
      var j = 0
      while (j < n) {
        val e =
          if (v.isNullAt(j)) 0.0
          else if (isFloat) v.getFloat(j).toDouble
          else v.getDouble(j)
        d += e * flat(off + j)
        j += 1
      }
      out(r) = d
      r += 1
    }
    new GenericArrayData(out)
  }

  def vec_project(c: Column, rows: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(VecProject(GraftSqlBridge.expression(c),
      rows.map(_.toArray).toArray))
}
