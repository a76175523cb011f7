package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CONTENT-DEFINED CHUNKING by gear rolling hash — the FastCDC family
  * (Xia et al., USENIX ATC'16; public): cut a byte stream where a
  * rolling hash of the recent bytes hits a mask, so chunk boundaries
  * follow CONTENT, not offsets. An insertion early in a document shifts
  * every fixed-size block but only the one containing chunk under CDC —
  * which is why it is the standard primitive for storage-level dedup
  * between corpus snapshots (two crawls of a page share every chunk
  * outside the edited region).
  *
  * Hash: `h ← (2·h + T[byte]) mod 2³¹` over UTF-8 bytes, where `T` is a
  * fixed 256-entry table derived from md5 (engine-portable: any SQL
  * engine can rebuild it — [[CdcOps.gearTable]]). The left shift decays
  * a byte's influence after 31 steps, giving the sliding window without
  * explicit subtraction. A boundary falls after byte `i` when the low
  * `maskBits` bits of `h` are zero → expected chunk ≈ 2^maskBits bytes.
  * One table lookup + shift + add per byte — the scan IS the cost, the
  * way production CDC runs.
  *
  * Returns `array<struct<start bigint, len bigint, hash string>>`
  * (byte offsets; hash = md5 hex of the chunk bytes — the dedup key).
  * Empty text → empty array; null → null. Deterministic, zero-shuffle
  * projection; dedup across documents is a plain aggregate on `hash`
  * downstream. Min/max clamps (the FastCDC normalization) live in
  * [[CdcOps.chunksClamped]] — they make boundaries sequential-
  * dependent, so the unclamped form is the oracle surface. */
case class GearCdcChunks(child: Expression, maskBits: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(maskBits >= 1 && maskBits <= 30, "maskBits must be 1..30")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("hash", StringType, nullable = false))))
  override def prettyName: String = "cdc_chunks"
  override def nullSafeEval(input: Any): Any =
    CdcOps.chunks(input.asInstanceOf[UTF8String], maskBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcOps.chunks($c, $maskBits)")
  override protected def withNewChildInternal(newChild: Expression): GearCdcChunks =
    copy(child = newChild)
}

object CdcOps {

  /** T[b] = first 8 md5-hex digits of the byte value's decimal string —
    * no magic constants an external engine couldn't rebuild. */
  val gearTable: Array[Long] = Array.tabulate(256) { b =>
    java.lang.Long.parseLong(md5Hex(b.toString.getBytes("UTF-8"))
      .substring(0, 8), 16)
  }

  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def chunks(text: UTF8String, maskBits: Int): GenericArrayData = {
    val bytes = text.getBytes
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < bytes.length) {
      h = ((h << 1) + gearTable(bytes(i) & 0xff)) & 0x7FFFFFFFL
      i += 1
      if ((h & mask) == 0L) {
        out += chunkRow(bytes, start, i - start)
        start = i
      }
    }
    if (start < bytes.length) out += chunkRow(bytes, start, bytes.length - start)
    new GenericArrayData(out.toArray)
  }

  /** FastCDC-style clamps: boundaries shorter than `minLen` are
    * suppressed (the hash keeps rolling) and a chunk is force-cut at
    * `maxLen`. Sequential by nature — each boundary's legality depends
    * on the previous one — so this is the production variant, spec-
    * verified against a reference walk rather than a SQL oracle. */
  def chunksClamped(text: UTF8String, maskBits: Int, minLen: Int,
      maxLen: Int): GenericArrayData = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    val bytes = text.getBytes
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < bytes.length) {
      h = ((h << 1) + gearTable(bytes(i) & 0xff)) & 0x7FFFFFFFL
      i += 1
      val len = i - start
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out += chunkRow(bytes, start, len)
        start = i
      }
    }
    if (start < bytes.length) out += chunkRow(bytes, start, bytes.length - start)
    new GenericArrayData(out.toArray)
  }

  private def chunkRow(bytes: Array[Byte], start: Int, len: Int): GenericInternalRow = {
    val slice = java.util.Arrays.copyOfRange(bytes, start, start + len)
    new GenericInternalRow(Array[Any](start.toLong, len.toLong,
      UTF8String.fromString(md5Hex(slice))))
  }

  // ---------------------------------------------------------- Column API

  def cdc_chunks(text: Column, maskBits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(GearCdcChunks(
      org.apache.spark.sql.GraftSqlBridge.expression(text), maskBits))
}
