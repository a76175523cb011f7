package graft.sources.griddap

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal NetCDF *classic* (CDF-1, auto-escalating to CDF-2's 64-bit
  * offsets for grids past 2 GiB) codec — the binary container the
  * reference moves griddap data in (`data_wrangler.py:591-604` downloads
  * `.nc` slices; `agol_wrangler.py:256-261` republishes reoriented
  * NetCDF). Implemented from the public classic-format spec: big-endian,
  * fixed dims only (`numrecs = 0`), `NC_BYTE`/`NC_SHORT`/`NC_INT`/
  * `NC_FLOAT`/`NC_DOUBLE` variables, per-variable `scale_factor` /
  * `add_offset` attributes (the CF packed-data convention ERDDAP uses
  * for int-typed griddap responses — `unpacked = raw*scale + offset`,
  * applied at read time, inverted at write time), other attributes
  * skipped on read. Coordinate variables follow the NetCDF convention
  * of sharing their dimension's name; `time` coordinates hold Unix
  * epoch seconds (the reference's DAS `actual_range` convention,
  * `das_client.py:189-221`).
  *
  * Files produced here carry the standard magic and layout, including
  * the RECORD (unlimited) dimension with per-record variable
  * interleaving, which is what lets NRT slices APPEND to a grid file
  * without rewriting it ([[appendRecords]]).
  */
object GridNc {

  private val NC_DIMENSION = 0x0A
  private val NC_ATTRIBUTE = 0x0C
  private val NC_VARIABLE = 0x0B
  private val NC_BYTE = 1
  private val NC_CHAR = 2
  private val NC_SHORT = 3
  private val NC_INT = 4
  private val NC_FLOAT = 5
  private val NC_DOUBLE = 6

  private def cellBytesOf(ncType: Int): Int = ncType match {
    case NC_BYTE | NC_CHAR => 1
    case NC_SHORT => 2
    case NC_INT | NC_FLOAT => 4
    case NC_DOUBLE => 8
    case t => throw new IllegalArgumentException(s"unsupported nc_type $t")
  }

  /** One variable: `dims` are indices into the grid's dimension list;
    * `values` are row-major over those dims and ALWAYS the UNPACKED
    * doubles (for int storage with scale/offset, the codec packs on
    * write and unpacks on read). `storage` = 0 derives NC_FLOAT /
    * NC_DOUBLE from `isFloat` (the original float/double-only surface);
    * set it to NC_BYTE/NC_SHORT/NC_INT for packed integer storage. */
  case class Var(name: String, dims: Seq[Int], isFloat: Boolean,
      values: Array[Double], storage: Int = 0,
      scaleFactor: Double = 1.0, addOffset: Double = 0.0) {
    def ncType: Int =
      if (storage != 0) storage else if (isFloat) NC_FLOAT else NC_DOUBLE
    def packed: Boolean = scaleFactor != 1.0 || addOffset != 0.0
  }

  /** `recordDim`: index of the UNLIMITED dimension (classic: at most
    * one, and it must be the first dim of every variable using it).
    * Its length in `dims` is the CURRENT record count. */
  case class Grid(dims: Seq[(String, Int)], vars: Seq[Var],
      recordDim: Option[Int] = None) {
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
    def isRecordVar(v: Var): Boolean = recordDim.exists(v.dims.headOption.contains)
  }

  /** Render the grid's STRUCTURE as an OPeNDAP DDS document — the
    * bounded metadata ERDDAP serves at `griddap/<id>.dds`. Coordinate
    * variables lead; each data variable is a DAP Grid with its MAPS.
    * This is what the HTTP transport's header probe parses instead of
    * fetching the whole file. */
  def dds(g: Grid, name: String): String = {
    def typ(v: Var) = v.ncType match {
      case NC_BYTE | NC_CHAR => "Byte"
      case NC_SHORT => "Int16"
      case NC_INT => "Int32"
      case NC_FLOAT => "Float32"
      case _ => "Float64"
    }
    def dimsOf(v: Var) =
      v.dims.map(d => s"[${g.dims(d)._1} = ${g.dims(d)._2}]").mkString
    val coords = g.dims.flatMap { case (dn, _) => g.vars.find(_.name == dn) }
    val coordLines = coords.map(v => s"  ${typ(v)} ${v.name}${dimsOf(v)};")
    val gridBlocks = g.dataVars.map { v =>
      val maps = v.dims.flatMap(d => g.vars.find(_.name == g.dims(d)._1))
        .map(c => s"      ${typ(c)} ${c.name}${dimsOf(c)};")
      s"  Grid {\n    ARRAY:\n      ${typ(v)} ${v.name}${dimsOf(v)};\n" +
        s"    MAPS:\n${maps.mkString("\n")}\n  } ${v.name};"
    }
    (Seq("Dataset {") ++ coordLines ++ gridBlocks ++ Seq(s"} $name;"))
      .mkString("\n")
  }

  private def pad4(n: Int): Int = (4 - n % 4) % 4

  /** Read one cell's RAW value at the buffer's position and apply the
    * CF unpack (`raw·scale + offset`) — THE single inverse of
    * [[packCell]]; both reader sites (the full scan and the append
    * path's record-time probe) go through here, so a new storage type
    * is one edit plus its pack twin. */
  private def unpackCell(buf: ByteBuffer, ncType: Int,
      scale: Double, offset: Double): Double = {
    val raw = ncType match {
      case NC_BYTE | NC_CHAR => (buf.get(): Byte).toDouble
      case NC_SHORT => buf.getShort.toDouble
      case NC_INT => buf.getInt.toDouble
      case NC_FLOAT => buf.getFloat.toDouble
      case NC_DOUBLE => buf.getDouble
      // fail LOUD: a lenient fallback here would parse an unsupported
      // type's bytes as misaligned doubles and feed garbage downstream
      case t => throw new IllegalArgumentException(
        s"GridNc: unsupported ncType $t")
    }
    raw * scale + offset
  }

  /** Write one UNPACKED memory double through the inverse of the CF
    * unpack: raw = rint((value - add_offset) / scale_factor), stored
    * at the variable's declared width (range-checked — a value the
    * packing can't represent is a caller bug, not silent wraparound). */
  private def packCell(out: DataOutputStream, v: Var, d: Double): Unit =
    v.ncType match {
      case NC_FLOAT => out.writeFloat(d.toFloat)
      case NC_DOUBLE => out.writeDouble(d)
      case t =>
        val raw = Math.rint((d - v.addOffset) / v.scaleFactor)
        t match {
          case NC_BYTE | NC_CHAR =>
            require(raw >= Byte.MinValue && raw <= Byte.MaxValue,
              s"${v.name}: packed value $raw exceeds NC_BYTE")
            out.writeByte(raw.toInt)
          case NC_SHORT =>
            require(raw >= Short.MinValue && raw <= Short.MaxValue,
              s"${v.name}: packed value $raw exceeds NC_SHORT")
            out.writeShort(raw.toInt)
          case NC_INT =>
            require(raw >= Int.MinValue && raw <= Int.MaxValue,
              s"${v.name}: packed value $raw exceeds NC_INT")
            out.writeInt(raw.toInt)
        }
    }
  private def nameBytes(s: String): Array[Byte] = s.getBytes("UTF-8")
  private def nameFieldLen(s: String): Int = {
    val n = nameBytes(s).length; 4 + n + pad4(n)
  }

  def write(g: Grid): Array[Byte] = write(g, 0)

  /** `forceVersion`: 0 = auto (CDF-1, escalating to CDF-2 when a data
    * `begin` offset outgrows the 32-bit header field — grids past
    * 2 GiB), 1/2 = pin the format (2 is spec-testable without
    * materializing 2 GiB). */
  private[sources] def write(g: Grid, forceVersion: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)

    def writeName(s: String): Unit = {
      val b = nameBytes(s)
      out.writeInt(b.length); out.write(b)
      var i = 0; while (i < pad4(b.length)) { out.writeByte(0); i += 1 }
    }
    g.recordDim.foreach { rd =>
      g.vars.filter(v => v.dims.contains(rd)).foreach(v =>
        require(v.dims.head == rd,
          s"${v.name}: record dim must be a variable's FIRST dim (classic)"))
    }
    val numrecs = g.recordDim.map(g.dims(_)._2).getOrElse(0)
    // vsize: fixed var = all cells; record var = ONE record's slab —
    // padded to the 4-byte boundary the spec requires (byte/short
    // storage makes padding real; float/double slabs need none)
    def slabCells(v: Var): Long =
      v.dims.filterNot(d => g.recordDim.contains(d))
        .map(g.dims(_)._2.toLong).product
    def vsize(v: Var): Int = {
      val raw = slabCells(v) * cellBytesOf(v.ncType)
      require(raw + pad4(raw.toInt) <= Int.MaxValue,
        "single variable/slab past 4 GiB needs CDF-5 (unsupported)")
      raw.toInt + pad4(raw.toInt)
    }
    // packed vars carry scale_factor / add_offset as NC_DOUBLE
    // attributes (CF convention); each attr = name + type + nelems + 8
    def vattLen(v: Var): Int =
      if (!v.packed) 8
      else 8 + Seq("scale_factor", "add_offset")
        .map(n => nameFieldLen(n) + 4 + 4 + 8).sum

    val dimListLen = 8 + g.dims.map(d => nameFieldLen(d._1) + 4).sum
    def varListLen(beginBytes: Int): Long = 8L + g.vars.map(v =>
      nameFieldLen(v.name).toLong + 4 + 4 * v.dims.length + vattLen(v) +
        4 + 4 + beginBytes).sum
    // fixed vars first, then the record section; each record var's
    // begin = its slab offset within the FIRST record
    val (recVars, fixVars) = g.vars.partition(g.isRecordVar)
    def beginsFor(beginBytes: Int): (Map[String, Long], Long) = {
      val headerLen = 8L + dimListLen + 8 + varListLen(beginBytes)
      val fixBegins = fixVars.scanLeft(headerLen)((acc, v) => acc + vsize(v))
      val recBegins = recVars.scanLeft(fixBegins.last)((acc, v) => acc + vsize(v))
      (fixVars.zip(fixBegins).map { case (v, b) => v.name -> b }.toMap ++
        recVars.zip(recBegins).map { case (v, b) => v.name -> b }.toMap,
        recBegins.last)
    }
    // format selection: CDF-1 (4-byte begins) until a begin outgrows
    // the 32-bit field — grids past 2 GiB — then CDF-2 (8-byte begins,
    // reader already version-aware). `numrecs` growth needs no begins,
    // so record-section appends never force an upgrade retroactively.
    val version =
      if (forceVersion != 0) forceVersion
      else if (beginsFor(4)._2 > Int.MaxValue.toLong) 2 else 1
    val (beginOf, _) = beginsFor(if (version == 2) 8 else 4)
    require(version == 2 || beginOf.values.forall(_ <= Int.MaxValue),
      "begin offset exceeds CDF-1")

    out.writeBytes("CDF"); out.writeByte(version)
    out.writeInt(numrecs)
    out.writeInt(NC_DIMENSION); out.writeInt(g.dims.length)
    g.dims.zipWithIndex.foreach { case ((n, len), i) =>
      writeName(n)
      out.writeInt(if (g.recordDim.contains(i)) 0 else len) // 0 = unlimited
    }
    out.writeInt(0); out.writeInt(0) // gatt_list ABSENT
    out.writeInt(NC_VARIABLE); out.writeInt(g.vars.length)
    g.vars.foreach { v =>
      writeName(v.name)
      out.writeInt(v.dims.length); v.dims.foreach(out.writeInt)
      if (!v.packed) { out.writeInt(0); out.writeInt(0) } // vatt_list ABSENT
      else {
        out.writeInt(NC_ATTRIBUTE); out.writeInt(2)
        Seq("scale_factor" -> v.scaleFactor, "add_offset" -> v.addOffset)
          .foreach { case (an, av) =>
            writeName(an)
            out.writeInt(NC_DOUBLE); out.writeInt(1); out.writeDouble(av)
          }
      }
      out.writeInt(v.ncType)
      out.writeInt(vsize(v))
      if (version == 2) out.writeLong(beginOf(v.name))
      else out.writeInt(beginOf(v.name).toInt)
    }
    def writeCell(v: Var, idx: Int): Unit = packCell(out, v, v.values(idx))
    def writePad(cells: Long, v: Var): Unit = {
      var p = pad4((cells * cellBytesOf(v.ncType)).toInt)
      while (p > 0) { out.writeByte(0); p -= 1 }
    }
    g.vars.foreach { v =>
      val expect = v.dims.map(g.dims(_)._2.toLong).product
      require(v.values.length == expect,
        s"${v.name}: ${v.values.length} values for dims of $expect cells")
    }
    fixVars.foreach { v =>
      var i = 0; while (i < v.values.length) { writeCell(v, i); i += 1 }
      writePad(v.values.length, v)
    }
    // record section: records interleave every record var's PADDED slab
    var r = 0
    while (r < numrecs) {
      recVars.foreach { v =>
        val cells = slabCells(v).toInt
        var i = 0
        while (i < cells) { writeCell(v, r * cells + i); i += 1 }
        writePad(cells, v)
      }
      r += 1
    }
    bos.toByteArray
  }

  private[griddap] case class VarMeta(name: String, dimIds: Seq[Int],
      ncType: Int, vsize: Int, begin: Long,
      scaleFactor: Double = 1.0, addOffset: Double = 0.0) {
    def isFloat: Boolean = ncType == NC_FLOAT
    def cellBytes: Int = cellBytesOf(ncType)
  }
  private[griddap] case class Header(version: Int, numrecs: Int,
      rawDims: Seq[(String, Int)], recordDim: Option[Int],
      metas: Seq[VarMeta]) {
    /** Dim list with the record dim's CURRENT length substituted. */
    def dims: Seq[(String, Int)] = rawDims.zipWithIndex.map { case ((n, len), i) =>
      (n, if (recordDim.contains(i)) numrecs else len)
    }
    def recMetas: Seq[VarMeta] =
      metas.filter(m => recordDim.exists(m.dimIds.headOption.contains))
    /** One full record's byte size (sum of every record var's slab). */
    def recSize: Long = recMetas.map(_.vsize.toLong).sum
  }

  /** Parse the header ONLY — O(header bytes), independent of how much
    * data follows. This is what lets the incremental append
    * ([[appendRecordsToFile]]) touch a growing grid file without
    * reading its data section. */
  private[griddap] def parseHeader(buf: ByteBuffer): Header = {
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F',
      "not a NetCDF classic file")
    val version = buf.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val numrecs = buf.getInt

    def readName(): String = {
      val n = buf.getInt
      val b = new Array[Byte](n); buf.get(b)
      var p = pad4(n); while (p > 0) { buf.get(); p -= 1 }
      new String(b, "UTF-8")
    }
    def readOffset(): Long =
      if (version == 2) buf.getLong else buf.getInt.toLong

    // attribute list: read the NUMERIC attrs (first element), skip the
    // rest — enough for CF scale_factor/add_offset, tolerant of any
    // other metadata an ERDDAP response carries
    def readAttrs(): Map[String, Double] = {
      val tag = buf.getInt; val n = buf.getInt
      require(tag == NC_ATTRIBUTE || (tag == 0 && n == 0), "bad attr list")
      (0 until n).flatMap { _ =>
        val name = readName()
        val atype = buf.getInt
        val nelems = buf.getInt
        val eb = cellBytesOf(atype)
        val total = nelems * eb
        val first: Option[Double] =
          if (nelems == 0) None
          else atype match {
            case NC_BYTE => Some((buf.get(): Byte).toDouble)
            case NC_CHAR => { buf.get(); None } // string attr: skip
            case NC_SHORT => Some(buf.getShort.toDouble)
            case NC_INT => Some(buf.getInt.toDouble)
            case NC_FLOAT => Some(buf.getFloat.toDouble)
            case NC_DOUBLE => Some(buf.getDouble)
          }
        // remaining elements + pad to the 4-byte boundary
        var skip = (if (nelems == 0) 0 else total - eb) + pad4(total)
        while (skip > 0) { buf.get(); skip -= 1 }
        first.map(name -> _)
      }.toMap
    }

    val dimTag = buf.getInt; val nDims = buf.getInt
    require(dimTag == NC_DIMENSION || (dimTag == 0 && nDims == 0), "bad dim list")
    val rawDims = (0 until nDims).map(_ => (readName(), buf.getInt))
    val recordDim = rawDims.indexWhere(_._2 == 0) match {
      case -1 => None
      case i => Some(i)
    }
    readAttrs() // global attributes: parsed, unused
    val varTag = buf.getInt; val nVars = buf.getInt
    require(varTag == NC_VARIABLE || (varTag == 0 && nVars == 0), "bad var list")
    val metas = (0 until nVars).map { _ =>
      val name = readName()
      val nd = buf.getInt
      val dimIds = (0 until nd).map(_ => buf.getInt)
      val attrs = readAttrs()
      val ncType = buf.getInt
      require(ncType >= NC_BYTE && ncType <= NC_DOUBLE,
        s"unsupported nc_type $ncType")
      val vsize = buf.getInt
      VarMeta(name, dimIds, ncType, vsize, readOffset(),
        attrs.getOrElse("scale_factor", 1.0), attrs.getOrElse("add_offset", 0.0))
    }
    Header(version, numrecs, rawDims, recordDim, metas)
  }

  /** Parse a file's header from a bounded WINDOW at the front —
    * O(header bytes) regardless of file size (no whole-file map, so a
    * grid past 2 GiB still probes fine). Windows escalate 64 KiB →
    * 16 MiB for pathologically wide headers. */
  private def headerOf(ch: java.nio.channels.FileChannel): Header = {
    val size = ch.size()
    val windows = Seq(64L * 1024, 16L * 1024 * 1024, Int.MaxValue.toLong)
      .map(math.min(_, size)).distinct
    windows.zipWithIndex.foreach { case (len, i) =>
      val buf = ch.map(java.nio.channels.FileChannel.MapMode.READ_ONLY, 0, len)
        .order(ByteOrder.BIG_ENDIAN)
      try return parseHeader(buf)
      catch {
        // header extends past this window → widen; at the widest
        // window the file's header is genuinely truncated/corrupt
        case e: java.nio.BufferUnderflowException =>
          if (i == windows.length - 1) throw new IllegalArgumentException(
            s"NetCDF header truncated or wider than ${len} bytes", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Header-only probe: does the file carry a record (unlimited)
    * dimension? O(header bytes) — no data I/O, no whole-file map. */
  def hasRecordDim(path: java.nio.file.Path): Boolean = {
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.READ)
    try headerOf(ch).recordDim.isDefined
    finally ch.close()
  }

  def read(bytes: Array[Byte]): Grid = {
    val h = parseHeader(ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN))
    val dims = h.dims
    val numrecs = h.numrecs
    val recSize = h.recSize

    val vars = h.metas.map { m =>
      val isRec = h.recordDim.exists(m.dimIds.headOption.contains)
      val cells = m.dimIds.map(dims(_)._2.toLong).product.toInt
      val values = new Array[Double](cells)
      val data = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      def readCell(): Double =
        unpackCell(data, m.ncType, m.scaleFactor, m.addOffset)
      if (!isRec) {
        data.position(m.begin.toInt)
        var i = 0
        while (i < cells) { values(i) = readCell(); i += 1 }
      } else {
        val slab = if (numrecs == 0) 0 else cells / numrecs
        var r = 0
        while (r < numrecs) {
          data.position((m.begin + r * recSize).toInt)
          var i = 0
          while (i < slab) { values(r * slab + i) = readCell(); i += 1 }
          r += 1
        }
      }
      Var(m.name, m.dimIds, m.isFloat, values,
        storage = if (m.ncType == NC_FLOAT || m.ncType == NC_DOUBLE) 0 else m.ncType,
        scaleFactor = m.scaleFactor, addOffset = m.addOffset)
    }
    Grid(dims, vars, h.recordDim)
  }

  /** Append records (new time slices) to an existing record-dim file
    * WITHOUT rewriting its data: the record section interleaves one
    * slab per record var per record at the tail, so appending = write
    * the new records' slabs after the old bytes and patch `numrecs`
    * in the header — the NRT incremental-grid write path. `extra` must
    * carry the same record structure (names/dims/types). */
  def appendRecords(bytes: Array[Byte], extra: Grid): Array[Byte] = {
    val base = read(bytes)
    val rd = base.recordDim.getOrElse(
      throw new IllegalArgumentException("file has no record dimension"))
    val erd = extra.recordDim.getOrElse(
      throw new IllegalArgumentException("extra grid has no record dimension"))
    val baseRecVars = base.vars.filter(base.isRecordVar)
    val baseRec = baseRecVars.map(_.name)
    val extraRecVars = extra.vars.filter(extra.isRecordVar)
    val extraRec = extraRecVars.map(_.name)
    require(baseRec == extraRec,
      s"record variables differ: $baseRec vs $extraRec")
    baseRecVars.zip(extraRecVars).foreach { case (b, e) =>
      require(b.ncType == e.ncType && b.scaleFactor == e.scaleFactor &&
        b.addOffset == e.addOffset,
        s"${b.name}: storage/packing differs between file and extra grid")
    }
    base.dims.indices.filterNot(_ == rd).foreach { i =>
      require(extra.dims(i) == base.dims(i),
        s"fixed dim mismatch at $i: ${extra.dims(i)} vs ${base.dims(i)}")
    }
    val newRecs = extra.dims(erd)._2
    val bos = new ByteArrayOutputStream()
    bos.write(bytes)
    val out = new DataOutputStream(bos)
    var r = 0
    while (r < newRecs) {
      baseRec.foreach { name =>
        val v = extra.vars.find(_.name == name).get
        val slab = v.values.length / newRecs
        var i = 0
        while (i < slab) { packCell(out, v, v.values(r * slab + i)); i += 1 }
        var p = pad4(slab * cellBytesOf(v.ncType))
        while (p > 0) { out.writeByte(0); p -= 1 }
      }
      r += 1
    }
    val outBytes = bos.toByteArray
    val patched = ByteBuffer.wrap(outBytes).order(ByteOrder.BIG_ENDIAN)
    patched.putInt(4, base.dims(rd)._2 + newRecs) // numrecs
    outBytes
  }

  /** INCREMENTAL on-disk append — the NRT grid-refresh write path
    * (the reference re-downloads growing time dims,
    * `data_wrangler.py:591-604`; here the published file GROWS
    * instead of being rewritten):
    *
    *  - parses the HEADER only (O(header bytes), via a memory map
    *    that never touches the data pages);
    *  - reads the existing `time` coordinate — 8 bytes per record at
    *    `begin + r*recSize`, O(numrecs) tiny reads, no slab I/O;
    *  - appends ONLY the extra records whose time is strictly after
    *    the file's current maximum (idempotent re-delivery: a slice
    *    already present is skipped);
    *  - writes the new records' slabs at the tail and patches the
    *    4-byte `numrecs` field — total write = new bytes + 4.
    *
    * Returns the number of records appended. `extra` must share the
    * record structure (validated against the header). */
  def appendRecordsToFile(path: java.nio.file.Path, extra: Grid,
      timeName: String = "time"): Int = {
    val raf = new java.io.RandomAccessFile(path.toFile, "rw")
    try {
      val ch = raf.getChannel
      val h = headerOf(ch)
      val rd = h.recordDim.getOrElse(
        throw new IllegalArgumentException("file has no record dimension"))
      val erd = extra.recordDim.getOrElse(
        throw new IllegalArgumentException("extra grid has no record dimension"))
      // structural validation against the header (no data read)
      val recMetas = h.recMetas
      val extraRec = extra.vars.filter(extra.isRecordVar)
      require(recMetas.map(_.name) == extraRec.map(_.name),
        s"record variables differ: ${recMetas.map(_.name)} vs ${extraRec.map(_.name)}")
      recMetas.zip(extraRec).foreach { case (m, v) =>
        require(m.ncType == v.ncType && m.scaleFactor == v.scaleFactor &&
          m.addOffset == v.addOffset,
          s"${m.name}: storage/packing differs from the file header") }
      h.rawDims.indices.filterNot(_ == rd).foreach { i =>
        require(extra.dims(i) == h.rawDims(i),
          s"fixed dim mismatch at $i: ${extra.dims(i)} vs ${h.rawDims(i)}")
      }
      val recSize = h.recSize
      // crash consistency: an interrupted previous append can leave
      // slab bytes past the last COUNTED record (numrecs patches only
      // after the tail write). Such an orphan tail would silently
      // become the next append's record bytes at the wrong offsets —
      // truncate back to the last consistent record boundary first.
      val expectedEnd = recMetas.map(_.begin).min + h.numrecs.toLong * recSize
      require(ch.size() >= expectedEnd,
        s"file shorter than header claims: ${ch.size()} < $expectedEnd")
      if (ch.size() > expectedEnd) ch.truncate(expectedEnd)
      // existing max time: the time COORD is one cell per record —
      // positional channel reads at LONG offsets (8 bytes per record,
      // no whole-file map, so files past 2 GiB keep appending)
      val timeMeta = recMetas.find(_.name == timeName).getOrElse(
        throw new IllegalArgumentException(s"no record coord '$timeName'"))
      val cell = java.nio.ByteBuffer.allocate(timeMeta.cellBytes)
        .order(ByteOrder.BIG_ENDIAN)
      var maxT = Double.NegativeInfinity
      var r = 0
      while (r < h.numrecs) {
        cell.clear()
        val pos = timeMeta.begin + r * recSize
        var read = 0
        while (read < timeMeta.cellBytes) {
          val k = ch.read(cell, pos + read)
          require(k > 0, s"short read at $pos")
          read += k
        }
        cell.flip()
        val t = unpackCell(cell, timeMeta.ncType,
          timeMeta.scaleFactor, timeMeta.addOffset)
        if (t > maxT) maxT = t
        r += 1
      }
      val extraTimes = extra.coord(timeName)
      val newIdx = extraTimes.indices.filter(extraTimes(_) > maxT)
      if (newIdx.isEmpty) return 0

      val extraN = extra.dims(erd)._2
      raf.seek(ch.size())
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(
          java.nio.channels.Channels.newOutputStream(ch)))
      newIdx.foreach { ri =>
        extraRec.foreach { v =>
          val slab = v.values.length / extraN
          var i = 0
          while (i < slab) { packCell(out, v, v.values(ri * slab + i)); i += 1 }
          var p = pad4(slab * cellBytesOf(v.ncType))
          while (p > 0) { out.writeByte(0); p -= 1 }
        }
      }
      out.flush()
      raf.seek(4)
      raf.writeInt(h.numrecs + newIdx.size) // patch numrecs
      newIdx.size
    } finally raf.close()
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
