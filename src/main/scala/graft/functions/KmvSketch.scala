package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Shared bounded bottom-k hash buffer: a sorted set capped at `k`,
  * partial-aggregated map-side and merged by union-then-trim. Both KMV
  * aggregates ride this; they differ only in what `eval` makes of the
  * final set (an estimate vs the sketch itself). The serialized form
  * (count + sorted longs) is part of streaming state-store
  * compatibility — one implementation, no chance of divergence. */
trait KmvBufferOps {
  self: TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] =>

  def child: Expression
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    out.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(in.getLong); i += 1 }
    s
  }
}

/** KMV (k-minimum-values, "bottom-k") distinct-count sketch as a native
  * Catalyst aggregate — the mergeable cardinality sketch whose answer
  * is DETERMINISTIC given the hash, so unlike HLL it can be oracle-
  * checked bit-for-bit: keep the k smallest distinct 52-bit hashes;
  * with fewer than k distinct values the count is exact, otherwise
  * estimate (k−1)·2⁵²/h₍ₖ₎ (Bar-Yossef et al., RANDOM 2002).
  *
  * Why a `TypedImperativeAggregate` and not a window: per-group state
  * is a bounded sorted set of ≤ k longs, partial-aggregated map-side
  * and merged by set-union-then-trim — no per-group sort of the full
  * distinct stream, no `collect_set` memory cliff, shuffle volume
  * k longs per group per mapper. Input is the 52-bit hash (13 md5 hex
  * digits — exact in a double), computed by a codegen'd projection
  * ([[graft.operators.Sketches.kmvHash]]) below the aggregate. */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with KmvBufferOps
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(k >= 2, "k must be >= 2")
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = StructType(Seq(
    StructField("est", DoubleType),        // estimated distinct count
    StructField("kept", IntegerType),      // hashes retained (≤ k)
    StructField("kth", LongType)))         // h_k, null when kept < k

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val cnt = buf.size
    if (cnt < k) InternalRow(cnt.toDouble, cnt, null)
    else InternalRow(
      (k - 1).toDouble * graft.operators.Sketches.HashSpace /
        buf.last().toDouble, cnt, buf.last().longValue())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** The same bounded bottom-k buffer, evaluated to the SORTED hash
  * array itself — the mergeable form set algebra needs: resemblance
  * (Jaccard) between two groups is computed from the union of their
  * sketches, so the sketch has to travel, not just its estimate. */
case class KmvSetAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with KmvBufferOps
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(k >= 2, "k must be >= 2")
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSetAgg =
    copy(child = newChildren.head)
}
