package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of 64-bit base hashes: element i is
  * `min over h of (a_i * h + b_i)` with splitmix64-derived odd
  * constants, using wrapping 64-bit arithmetic (universal hashing).
  *
  * Native Catalyst expression: ANSI mode forbids the wrapping multiply
  * in SQL expression space, and the HOF formulation pays an interpreted
  * lambda per element. This is one tight JIT'd loop per row.
  */
case class MinHash64(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash64.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (a_i, b_i) constant tables, cached per signature width. */
  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def constants(k: Int): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent(k, { n =>
      val a = Array.tabulate(n)(i => mix(i.toLong * 2 + 1) | 1L)
      val b = Array.tabulate(n)(i => mix(i.toLong * 2 + 2))
      (a, b)
    })

  /** Shared by interpreted eval and generated code. Null elements are
    * ignored; an empty/all-null array yields Long.MaxValue sentinels. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = constants(k)
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = as(j) * h + bs(j)
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def minhash64(c: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHash64(GraftSqlBridge.expression(c), numHashes))
}
