package graft.sources.griddap

import java.time.Instant
import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.erddap.UrlCompiler
import graft.sources.erddap.ErddapTransport

/** Griddap DataSource V2 (S8): scans a gridded dataset as LONG-FORM rows
  * `(time, latitude, longitude, var…)` — grid → rows is the idiomatic
  * Spark mapping (SURVEY.md §1.1). The transport moves real
  * NetCDF-classic bytes ([[GridNc]]), sliced server-side by hyperslab
  * selectors exactly like the reference's per-chunk `.nc` downloads
  * (`data_wrangler.py:431-501`, `:591-604`).
  *
  * `spark.read.format("griddap")` with options:
  *   - `dataDir`       directory containing `<dataset>.nc`
  *   - `dataset`       dataset id
  *   - `server`        URL prefix used in compiled hyperslab URLs
  *   - `slicesPerPartition`  time slices per InputPartition (default 4)
  *
  * Pushdown: time/latitude/longitude range predicates compile into the
  * hyperslab selectors (closed bounds — strict bounds re-filter Spark-
  * side); column pruning drops unselected data variables from the URL
  * (P6 griddap var split). When a z dimension (altitude/depth/zlev)
  * exists, the scan slices index 0 — the reference's surface-slice
  * `[0]` (`data_wrangler.py:410-423`).
  */
class GriddapDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "griddap"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GriddapTable.fromOptions(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    GriddapTable.fromOptions(new CaseInsensitiveStringMap(properties))
}

object GriddapTable {
  def fromOptions(options: CaseInsensitiveStringMap): GriddapTable = {
    val dataDir = options.get("dataDir")
    val dataset = options.get("dataset")
    require(dataDir != null && dataset != null,
      "griddap source requires options: dataDir, dataset")
    new GriddapTable(dataDir, dataset,
      Option(options.get("server")).getOrElse("https://local/erddap/griddap/"),
      Option(options.get("slicesPerPartition")).map(_.toInt).getOrElse(4))
  }
}

class GriddapTable(dataDir: String, dataset: String, server: String,
    slicesPerPartition: Int) extends Table with SupportsRead {

  private[griddap] lazy val header: GridNc.Grid =
    ErddapTransport(dataDir).griddapHeader(dataset)

  private[griddap] lazy val zDim: Option[String] =
    header.dims.map(_._1).find(UrlCompiler.zDims.contains)

  private[griddap] lazy val dataVarNames: Seq[String] =
    header.dataVars.map(_.name)

  override def name(): String = s"griddap.$dataset"

  /** Long-form schema: time, latitude, longitude, then one double per
    * data variable. A z dimension is surface-sliced away (`[0]`). */
  override def schema(): StructType = StructType(
    StructField("time", TimestampType, nullable = false) +:
    StructField("latitude", DoubleType, nullable = false) +:
    StructField("longitude", DoubleType, nullable = false) +:
    dataVarNames.map(v => StructField(v, DoubleType, nullable = true)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GriddapScanBuilder(dataDir, dataset, server, slicesPerPartition,
      header, zDim, schema())
}

class GriddapScanBuilder(dataDir: String, dataset: String, server: String,
    slicesPerPartition: Int, header: GridNc.Grid, zDim: Option[String],
    fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var tLo, tHi: Option[Instant] = None
  private var latLo, latHi, lonLo, lonHi: Option[Double] = None

  override def pruneColumns(required: StructType): Unit = {
    val names = required.fieldNames.toSet
    requiredSchema = StructType(fullSchema.filter(f => names.contains(f.name)))
  }

  /** Range predicates on the grid axes become hyperslab selector
    * bounds. Bounds accumulate (tightest wins) — same contract as the
    * tabledap builder; closed URL grammar, so strict bounds stay
    * Spark-side. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def ts(v: Any): Option[Instant] = v match {
      case t: java.sql.Timestamp => Some(t.toInstant)
      case i: Instant => Some(i)
      case l: java.time.LocalDateTime => Some(l.toInstant(java.time.ZoneOffset.UTC))
      case _ => None
    }
    def num(v: Any): Option[Double] = v match {
      case d: java.lang.Number => Some(d.doubleValue())
      case _ => None
    }
    def maxI(o: Option[Instant], v: Instant) =
      Some(o.fold(v)(x => if (x.isAfter(v)) x else v))
    def minI(o: Option[Instant], v: Instant) =
      Some(o.fold(v)(x => if (x.isBefore(v)) x else v))
    filters.filter {
      case f @ GreaterThanOrEqual("time", v) if ts(v).isDefined =>
        tLo = maxI(tLo, ts(v).get); pushed :+= f; false
      case f @ LessThanOrEqual("time", v) if ts(v).isDefined =>
        tHi = minI(tHi, ts(v).get); pushed :+= f; false
      case GreaterThan("time", v) if ts(v).isDefined =>
        tLo = maxI(tLo, ts(v).get); true
      case LessThan("time", v) if ts(v).isDefined =>
        tHi = minI(tHi, ts(v).get); true
      case f @ GreaterThanOrEqual("latitude", v) if num(v).isDefined =>
        latLo = Some(latLo.fold(num(v).get)(math.max(_, num(v).get))); pushed :+= f; false
      case f @ LessThanOrEqual("latitude", v) if num(v).isDefined =>
        latHi = Some(latHi.fold(num(v).get)(math.min(_, num(v).get))); pushed :+= f; false
      case f @ GreaterThanOrEqual("longitude", v) if num(v).isDefined =>
        lonLo = Some(lonLo.fold(num(v).get)(math.max(_, num(v).get))); pushed :+= f; false
      case f @ LessThanOrEqual("longitude", v) if num(v).isDefined =>
        lonHi = Some(lonHi.fold(num(v).get)(math.min(_, num(v).get))); pushed :+= f; false
      case GreaterThan("latitude", v) if num(v).isDefined =>
        latLo = Some(latLo.fold(num(v).get)(math.max(_, num(v).get))); true
      case LessThan("latitude", v) if num(v).isDefined =>
        latHi = Some(latHi.fold(num(v).get)(math.min(_, num(v).get))); true
      case GreaterThan("longitude", v) if num(v).isDefined =>
        lonLo = Some(lonLo.fold(num(v).get)(math.max(_, num(v).get))); true
      case LessThan("longitude", v) if num(v).isDefined =>
        lonHi = Some(lonHi.fold(num(v).get)(math.min(_, num(v).get))); true
      case _ => true
    }
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GriddapScan(dataDir, dataset, server, slicesPerPartition, header,
      zDim, requiredSchema, tLo, tHi, latLo, latHi, lonLo, lonHi)
}

class GriddapScan(dataDir: String, dataset: String, server: String,
    slicesPerPartition: Int, header: GridNc.Grid, zDim: Option[String],
    readSchema: StructType,
    tLo: Option[Instant], tHi: Option[Instant],
    latLo: Option[Double], latHi: Option[Double],
    lonLo: Option[Double], lonHi: Option[Double])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"griddap dataset=$dataset cols=${readSchema.fieldNames.mkString(",")}" +
      tLo.map(t => s" time>=$t").getOrElse("") +
      tHi.map(t => s" time<=$t").getOrElse("") +
      (if (latLo.isDefined || latHi.isDefined || lonLo.isDefined || lonHi.isDefined)
        " bbox-pushed" else "")

  private def keptTimeIdx: Seq[Int] = {
    val t = header.coord("time")
    val lo = tLo.map(_.getEpochSecond.toDouble).getOrElse(Double.NegativeInfinity)
    val hi = tHi.map(_.getEpochSecond.toDouble).getOrElse(Double.PositiveInfinity)
    t.indices.filter(i => t(i) >= lo && t(i) <= hi)
  }

  private def keptLen(dim: String, lo: Option[Double], hi: Option[Double]): Long = {
    val c = header.coord(dim)
    c.count(v => lo.forall(v >= _) && hi.forall(v <= _)).toLong
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = keptTimeIdx.length.toLong *
      keptLen("latitude", latLo, latHi) * keptLen("longitude", lonLo, lonHi)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(rows * readSchema.fields.length * 8L)
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }

  /** One partition per run of `slicesPerPartition` kept time slices —
    * the reference's per-chunk serial `.nc` downloads become
    * partition-parallel hyperslab fetches. */
  override def planInputPartitions(): Array[InputPartition] = {
    val times = header.coord("time")
    val kept = keptTimeIdx
    if (kept.isEmpty) return Array.empty
    val dataVars = {
      val dimNames = header.dims.map(_._1).toSet
      val wanted = readSchema.fieldNames.filterNot(
        n => n == "time" || n == "latitude" || n == "longitude")
      // a pure-coordinate projection still needs one variable to scan
      if (wanted.nonEmpty) wanted.toSeq
      else header.dataVars.take(1).map(_.name)
    }
    val lat = header.coord("latitude")
    val lon = header.coord("longitude")
    def bound(c: Array[Double], lo: Option[Double], hi: Option[Double]) = {
      val inRange = c.filter(v => lo.forall(v >= _) && hi.forall(v <= _))
      if (inRange.isEmpty) None else Some((inRange.min, inRange.max))
    }
    val latB = bound(lat, latLo, latHi).getOrElse(return Array.empty)
    val lonB = bound(lon, lonLo, lonHi).getOrElse(return Array.empty)

    kept.grouped(slicesPerPartition).map { group =>
      val startIso = graft.erddap.ChunkPlanner.isoNoZone(
        Instant.ofEpochSecond(times(group.head).toLong))
      val endIso = graft.erddap.ChunkPlanner.isoNoZone(
        Instant.ofEpochSecond(times(group.last).toLong))
      val url = UrlCompiler.compileGriddap(UrlCompiler.Griddap(
        server, dataset, dataVars, startIso, endIso,
        latRange = latB, lonRange = lonB,
        zSlice = zDim.isDefined)).head
      GriddapInputPartition(url): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GriddapReaderFactory(dataDir, readSchema, zDim.isDefined)
}

case class GriddapInputPartition(url: String) extends InputPartition

class GriddapReaderFactory(dataDir: String, schema: StructType,
    hasZ: Boolean) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GriddapPartitionReader(dataDir, schema,
      p.asInstanceOf[GriddapInputPartition].url, hasZ)
}

/** Fetches one hyperslab URL (NetCDF bytes), decodes, and emits
  * long-form rows in (time, lat, lon) row-major order. */
class GriddapPartitionReader(dataDir: String, schema: StructType,
    url: String, hasZ: Boolean) extends PartitionReader[InternalRow] {

  private val grid = GridNc.read(ErddapTransport(dataDir).fetchGriddap(url))
  private val times = grid.coord("time")
  private val lats = grid.coord("latitude")
  private val lons = grid.coord("longitude")
  private val nt = times.length
  private val nlat = lats.length
  private val nlon = lons.length
  private val total = nt.toLong * nlat * nlon

  // data vars in the order the pruned schema asks for them
  private val varValues: Array[Array[Double]] = schema.fields
    .filterNot(f => f.name == "time" || f.name == "latitude" || f.name == "longitude")
    .map(f => grid.vars.find(_.name == f.name).getOrElse(
      throw new IllegalArgumentException(s"variable ${f.name} not in response"))
      .values)

  // emit plan per schema field: 0=time 1=lat 2=lon, 3+i=var i
  private val fieldKind: Array[Int] = {
    var v = 3
    schema.fields.map { f =>
      f.name match {
        case "time" => 0
        case "latitude" => 1
        case "longitude" => 2
        case _ => { val k = v; v += 1; k }
      }
    }
  }

  private var pos = -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    pos += 1
    if (pos >= total) return false
    val ti = (pos / (nlat.toLong * nlon)).toInt
    val rem = (pos % (nlat.toLong * nlon)).toInt
    val lai = rem / nlon
    val loi = rem % nlon
    // z (if present in the response) has length 1 after the [0] slice,
    // so the flat index is the same with or without it
    val flat = pos.toInt
    current = InternalRow.fromSeq(schema.fields.indices.map { i =>
      fieldKind(i) match {
        case 0 => times(ti).toLong * 1000000L // epoch-sec → micros
        case 1 => lats(lai)
        case 2 => lons(loi)
        case k => varValues(k - 3)(flat)
      }
    })
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
