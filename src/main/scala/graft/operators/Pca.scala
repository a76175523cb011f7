package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality
  * reducer in front of IVF/PQ indexing and embedding near-dup (project
  * first, bucket after: fewer planes, tighter clusters).
  *
  * Scale shape: ONE typed single-pass aggregate folds every vector
  * into a (count, sum, upper-triangular product-sum) buffer — buffers
  * are d + d(d+1)/2 doubles, mergeable map-side, so a 100 TB scan
  * reduces to one d²-bounded row on the driver. The eigensolve is a
  * classical Jacobi sweep over that d×d matrix (driver-side, public
  * algorithm — d is small by construction); projection rides back into
  * the scan as a native expression ([[graft.functions.VecProject]],
  * components broadcast with the plan, one JIT'd k×d loop per row).
  */
object Pca {

  case class CovBuf(n: Long, s: Array[Double], p: Array[Double])

  private class CovAgg(d: Int) extends Aggregator[Array[Double], CovBuf, CovBuf] {
    override def zero: CovBuf =
      CovBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    override def reduce(b: CovBuf, v: Array[Double]): CovBuf = {
      if (v == null) return b
      require(v.length == d,
        s"covariance: vector of dimension ${v.length}, expected $d")
      var i = 0
      var t = 0
      while (i < d) {
        b.s(i) += v(i)
        var j = i
        while (j < d) { b.p(t) += v(i) * v(j); j += 1; t += 1 }
        i += 1
      }
      b.copy(n = b.n + 1)
    }
    override def merge(a: CovBuf, b: CovBuf): CovBuf = {
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      var t = 0
      while (t < a.p.length) { a.p(t) += b.p(t); t += 1 }
      a.copy(n = a.n + b.n)
    }
    override def finish(r: CovBuf): CovBuf = r
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  }

  /** The sample covariance matrix of `vecCol` (d×d, symmetric), plus
    * the mean vector and row count, computed in one pass. */
  def covariance(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
      .filter((v: Array[Double]) => v != null)
    val d = ds.head().length
    val buf = ds.select(new CovAgg(d).toColumn).head()
    require(buf.n >= 2, "covariance needs at least 2 vectors")
    val n = buf.n.toDouble
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (buf.p(t) - buf.s(i) * buf.s(j) / n) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    (buf.n, buf.s.map(_ / n), cov)
  }

  /** Covariance as a DataFrame of upper-triangle entries (i ≤ j, both
    * 0-based), rounded to 6 places — the oracle-comparable surface. */
  def covarianceDf(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, _, cov) = covariance(df, vecCol)
    val rows = for {
      i <- cov.indices
      j <- i until cov.length
    } yield (i.toLong, j.toLong,
      BigDecimal(cov(i)(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    rows.toDF("i", "j", "cov")
  }

  /** Top-`k` principal components by classical Jacobi eigensolve of the
    * covariance matrix. Deterministic: eigenpairs sort by eigenvalue
    * descending (index ascending on ties) and each component's
    * largest-magnitude entry is made positive (eigenvector sign is
    * otherwise arbitrary). Returns (component, eigenvalue) pairs. */
  def principalComponents(df: DataFrame, vecCol: String,
      k: Int): Seq[(Seq[Double], Double)] = {
    val (_, _, cov) = covariance(df, vecCol)
    require(k >= 1 && k <= cov.length, s"k must be 1..${cov.length}")
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => (-values(i), i))
    order.take(k).map { idx =>
      val comp = vectors.map(_(idx)) // column idx = eigenvector
      val m = comp.indices.maxBy(i => math.abs(comp(i)))
      val signed = if (comp(m) < 0) comp.map(-_) else comp
      (signed.toSeq, values(idx))
    }
  }

  /** Project vectors onto `components` as a new `projCol` array column
    * — a pure native-expression projection, no join, no shuffle. */
  def project(df: DataFrame, vecCol: String, components: Seq[Seq[Double]],
      projCol: String = "proj"): DataFrame =
    df.withColumn(projCol,
      graft.functions.VecProject.vec_project(col(vecCol), components))

  /** Classical Jacobi eigendecomposition of a symmetric matrix: rotate
    * away the largest off-diagonal element until the off-diagonal norm
    * vanishes (public textbook algorithm; O(d³) per sweep, fine for the
    * small d of embedding columns). Returns (eigenvalues, V) with
    * eigenvectors in V's COLUMNS. */
  private[operators] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta == 0 (equal diagonal) needs the full 45° rotation
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }
}
