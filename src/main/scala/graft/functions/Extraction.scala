package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The converter's per-field extraction DSL (F6,
  * `Json2GeoJSON.py:89-128`, config grammar `:402-417`) re-expressed as
  * Column combinators. Each op is `value × setting → value`; ops chain
  * left-to-right like the reference's pipeline. The reference works on
  * strings throughout (numeric ops parse-then-stringify); we preserve
  * that: every op returns a string column, numeric ops route through
  * DoubleType. `lambda` (arbitrary eval) maps to `expr(sql)` — an
  * ANALYZABLE user extension point instead of python eval.
  */
object Extraction {

  /** `str(value)[int(setting):]` */
  def offset(c: Column, n: Int): Column = substring(c, n + 1, Int.MaxValue)

  /** `str(value)[:int(setting)]` */
  def length(c: Column, n: Int): Column = substring(c, 1, n)

  /** substring AFTER the first occurrence of `s` (reference raises when
    * missing; we yield null — engine-friendly). */
  def start(c: Column, s: String): Column = {
    val pos = instr(c, s)
    when(pos > 0, substring(c, (pos + lit(s.length)).cast("int"), lit(Int.MaxValue)))
  }

  /** substring BEFORE the first occurrence of `s`. */
  def end(c: Column, s: String): Column = {
    val pos = instr(c, s)
    when(pos > 0, substring(c, lit(1), (pos - 1).cast("int")))
  }

  def concatWith(c: Column, s: String): Column = concat(c, lit(s))

  /** `getNumber`: float(value) with 0.0 fallback (`Json2GeoJSON.py:106-110`). */
  def num(c: Column): Column = coalesce(c.try_cast("double"), lit(0.0))

  def add(c: Column, s: Double): Column = fmt(num(c) + s)
  def sub(c: Column, s: Double): Column = fmt(num(c) - s)
  def mult(c: Column, s: Double): Column = fmt(num(c) * s)
  def div(c: Column, s: Double): Column = fmt(num(c) / s)
  def absVal(c: Column): Column = fmt(abs(num(c)))
  def powOp(c: Column, s: Double): Column = fmt(pow(num(c), s))
  def root(c: Column, s: Double): Column = fmt(pow(num(c), 1.0 / s))
  /** `value * random()` — nondeterministic by design, like the reference. */
  def randScale(c: Column): Column = fmt(num(c) * rand())

  /** User SQL expression — the analyzable stand-in for the reference's
    * python `eval` lambda (`Json2GeoJSON.py:127`). The expression
    * references the source column by name, e.g.
    * `lambdaExpr("upper(name) || '!'")`; Catalyst resolves and
    * optimizes it like any other expression. */
  def lambdaExpr(sql: String): Column = expr(sql)

  /** Reference stringification of numeric results: python str(float). We
    * keep integral values as e.g. "3.0" to match `str(3.0)`. */
  private def fmt(c: Column): Column = {
    val asDouble = c.cast("double")
    when(asDouble === asDouble.cast("long").cast("double"),
      concat(asDouble.cast("long").cast("string"), lit(".0")))
      .otherwise(asDouble.cast("string"))
  }

  /** A parsed op chain, applied left-to-right. */
  sealed trait Op { def apply(c: Column): Column }
  case class Offset(n: Int) extends Op { def apply(c: Column) = offset(c, n) }
  case class Length(n: Int) extends Op { def apply(c: Column) = length(c, n) }
  case class Start(s: String) extends Op { def apply(c: Column) = start(c, s) }
  case class End(s: String) extends Op { def apply(c: Column) = end(c, s) }
  case class Concat(s: String) extends Op { def apply(c: Column) = concatWith(c, s) }
  case class Add(v: Double) extends Op { def apply(c: Column) = add(c, v) }
  case class Sub(v: Double) extends Op { def apply(c: Column) = sub(c, v) }
  case class Mult(v: Double) extends Op { def apply(c: Column) = mult(c, v) }
  case class Div(v: Double) extends Op { def apply(c: Column) = div(c, v) }
  case object Abs extends Op { def apply(c: Column) = absVal(c) }
  case class Pow(v: Double) extends Op { def apply(c: Column) = powOp(c, v) }
  case class Root(v: Double) extends Op { def apply(c: Column) = root(c, v) }
  case object RandScale extends Op { def apply(c: Column) = randScale(c) }

  def pipeline(c: Column, ops: Seq[Op]): Column =
    ops.foldLeft(c)((acc, op) => op(acc))
}
