package graft.sources.griddap

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal NetCDF *classic* (CDF-1) codec — the binary container the
  * reference moves griddap data in (`data_wrangler.py:591-604` downloads
  * `.nc` slices; `agol_wrangler.py:256-261` republishes reoriented
  * NetCDF). Implemented from the public classic-format spec: big-endian,
  * fixed dims only (`numrecs = 0`), `NC_FLOAT`/`NC_DOUBLE` variables,
  * attribute lists written ABSENT. Coordinate variables follow the
  * NetCDF convention of sharing their dimension's name; `time`
  * coordinates hold Unix epoch seconds (the reference's DAS
  * `actual_range` convention, `das_client.py:189-221`).
  *
  * This is deliberately a SUBSET (no records, no attributes, no
  * byte/short/int vars) — enough to round-trip every grid the connector
  * moves, while staying genuinely NetCDF: files produced here carry the
  * standard magic and layout.
  */
object GridNc {

  private val NC_DIMENSION = 0x0A
  private val NC_VARIABLE = 0x0B
  private val NC_FLOAT = 5
  private val NC_DOUBLE = 6

  /** One variable: `dims` are indices into the grid's dimension list;
    * `values` are row-major over those dims (doubles in memory even for
    * NC_FLOAT storage). */
  case class Var(name: String, dims: Seq[Int], isFloat: Boolean,
      values: Array[Double])

  case class Grid(dims: Seq[(String, Int)], vars: Seq[Var]) {
    def dimIndex(name: String): Int = dims.indexWhere(_._1 == name)
    def dimLen(name: String): Int = dims.find(_._1 == name).map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"no dim $name"))
    /** Coordinate variable = variable named like its dimension. */
    def coord(name: String): Array[Double] =
      vars.find(_.name == name).map(_.values)
        .getOrElse(throw new IllegalArgumentException(s"no coord $name"))
    def dataVars: Seq[Var] = {
      val dimNames = dims.map(_._1).toSet
      vars.filterNot(v => dimNames.contains(v.name))
    }
  }

  private def pad4(n: Int): Int = (4 - n % 4) % 4
  private def nameBytes(s: String): Array[Byte] = s.getBytes("UTF-8")
  private def nameFieldLen(s: String): Int = {
    val n = nameBytes(s).length; 4 + n + pad4(n)
  }

  def write(g: Grid): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)

    def writeName(s: String): Unit = {
      val b = nameBytes(s)
      out.writeInt(b.length); out.write(b)
      var i = 0; while (i < pad4(b.length)) { out.writeByte(0); i += 1 }
    }
    def vsize(v: Var): Int = {
      val raw = v.dims.map(g.dims(_)._2.toLong).product *
        (if (v.isFloat) 4 else 8)
      require(raw + pad4(raw.toInt) <= Int.MaxValue, "variable too large for CDF-1")
      raw.toInt + pad4(raw.toInt)
    }

    val dimListLen = 8 + g.dims.map(d => nameFieldLen(d._1) + 4).sum
    val varListLen = 8 + g.vars.map(v =>
      nameFieldLen(v.name) + 4 + 4 * v.dims.length + 8 + 4 + 4 + 4).sum
    val headerLen = 8 + dimListLen + 8 + varListLen
    val begins = g.vars.scanLeft(headerLen)((acc, v) => acc + vsize(v))

    out.writeBytes("CDF"); out.writeByte(1) // magic + version (CDF-1)
    out.writeInt(0) // numrecs: fixed dims only
    out.writeInt(NC_DIMENSION); out.writeInt(g.dims.length)
    g.dims.foreach { case (n, len) => writeName(n); out.writeInt(len) }
    out.writeInt(0); out.writeInt(0) // gatt_list ABSENT
    out.writeInt(NC_VARIABLE); out.writeInt(g.vars.length)
    g.vars.zipWithIndex.foreach { case (v, i) =>
      writeName(v.name)
      out.writeInt(v.dims.length); v.dims.foreach(out.writeInt)
      out.writeInt(0); out.writeInt(0) // vatt_list ABSENT
      out.writeInt(if (v.isFloat) NC_FLOAT else NC_DOUBLE)
      out.writeInt(vsize(v))
      out.writeInt(begins(i))
    }
    g.vars.foreach { v =>
      val expect = v.dims.map(g.dims(_)._2.toLong).product
      require(v.values.length == expect,
        s"${v.name}: ${v.values.length} values for dims of $expect cells")
      if (v.isFloat) {
        v.values.foreach(d => out.writeFloat(d.toFloat))
        // 4-byte floats: raw size may need one trailing pad word only
        // when the cell count is odd — pad4 over raw bytes handles it
        var p = pad4(v.values.length * 4)
        while (p > 0) { out.writeByte(0); p -= 1 }
      } else v.values.foreach(out.writeDouble)
    }
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): Grid = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F',
      "not a NetCDF classic file")
    val version = buf.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    buf.getInt // numrecs (ignored: fixed dims only)

    def readName(): String = {
      val n = buf.getInt
      val b = new Array[Byte](n); buf.get(b)
      var p = pad4(n); while (p > 0) { buf.get(); p -= 1 }
      new String(b, "UTF-8")
    }
    def readOffset(): Long =
      if (version == 2) buf.getLong else buf.getInt.toLong

    val dimTag = buf.getInt; val nDims = buf.getInt
    require(dimTag == NC_DIMENSION || (dimTag == 0 && nDims == 0), "bad dim list")
    val dims = (0 until nDims).map(_ => (readName(), buf.getInt))

    val gattTag = buf.getInt; val nGatt = buf.getInt
    require(gattTag == 0 && nGatt == 0,
      "attribute lists unsupported by this subset reader")

    val varTag = buf.getInt; val nVars = buf.getInt
    require(varTag == NC_VARIABLE || (varTag == 0 && nVars == 0), "bad var list")
    val vars = (0 until nVars).map { _ =>
      val name = readName()
      val nd = buf.getInt
      val dimIds = (0 until nd).map(_ => buf.getInt)
      val vattTag = buf.getInt; val nVatt = buf.getInt
      require(vattTag == 0 && nVatt == 0,
        "attribute lists unsupported by this subset reader")
      val ncType = buf.getInt
      require(ncType == NC_FLOAT || ncType == NC_DOUBLE,
        s"unsupported nc_type $ncType")
      buf.getInt // vsize
      val begin = readOffset()
      val cells = dimIds.map(dims(_)._2.toLong).product.toInt
      val values = new Array[Double](cells)
      val data = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      data.position(begin.toInt)
      var i = 0
      while (i < cells) {
        values(i) = if (ncType == NC_FLOAT) data.getFloat.toDouble
          else data.getDouble
        i += 1
      }
      Var(name, dimIds, ncType == NC_FLOAT, values)
    }
    Grid(dims, vars)
  }

  /** K4/O1 — publish-side latitude reorientation
    * (`agol_wrangler.py:235-261`): if the latitude coordinate ascends,
    * flip it (north→south) and flip every data variable along its
    * latitude axis. No-op when already descending. */
  def latFlip(g: Grid, latDim: String = "latitude"): Grid = {
    val li = g.dimIndex(latDim)
    if (li < 0) return g
    val lat = g.coord(latDim)
    if (lat.length < 2 || lat(0) > lat(lat.length - 1)) return g
    val flippedVars = g.vars.map { v =>
      val axis = v.dims.indexOf(li)
      if (axis < 0) v
      else v.copy(values = flipAxis(v.values, v.dims.map(g.dims(_)._2), axis))
    }
    g.copy(vars = flippedVars)
  }

  /** Reverse a row-major array along one axis. */
  private[griddap] def flipAxis(values: Array[Double], shape: Seq[Int],
      axis: Int): Array[Double] = {
    val n = shape(axis)
    val inner = shape.drop(axis + 1).product // contiguous stride of the axis
    val outer = shape.take(axis).product
    val out = new Array[Double](values.length)
    var o = 0
    while (o < outer) {
      var i = 0
      while (i < n) {
        val src = (o * n + i) * inner
        val dst = (o * n + (n - 1 - i)) * inner
        System.arraycopy(values, src, out, dst, inner)
        i += 1
      }
      o += 1
    }
    out
  }
}
