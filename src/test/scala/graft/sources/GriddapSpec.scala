package graft.sources

import java.nio.file.{Files, Path}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession
import graft.sources.erddap.LocalErddapServer
import graft.sources.griddap.GridNc

class GriddapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // 6 hourly slices × 5 lats (ascending 20..24) × 4 lons (-95..-92),
  // two variables; sst double, uwind float. value = deterministic fn of
  // indices, exactly representable.
  def fixtureGrid(): GridNc.Grid = {
    val nt = 6; val nlat = 5; val nlon = 4
    val t0 = Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    val times = Array.tabulate(nt)(i => (t0 + i * 3600L).toDouble)
    val lats = Array.tabulate(nlat)(i => 20.0 + i)
    val lons = Array.tabulate(nlon)(i => -95.0 + i)
    def sst(ti: Int, lai: Int, loi: Int) = (ti * 10000 + lai * 100 + loi) * 0.25
    def uw(ti: Int, lai: Int, loi: Int) = ti + lai * 0.5 + loi * 0.25
    val sstV = Array.tabulate(nt * nlat * nlon) { k =>
      sst(k / (nlat * nlon), k / nlon % nlat, k % nlon) }
    val uwV = Array.tabulate(nt * nlat * nlon) { k =>
      uw(k / (nlat * nlon), k / nlon % nlat, k % nlon) }
    GridNc.Grid(
      dims = Seq(("time", nt), ("latitude", nlat), ("longitude", nlon)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false, times),
        GridNc.Var("latitude", Seq(1), isFloat = false, lats),
        GridNc.Var("longitude", Seq(2), isFloat = false, lons),
        GridNc.Var("sst", Seq(0, 1, 2), isFloat = false, sstV),
        GridNc.Var("uwind", Seq(0, 1, 2), isFloat = true, uwV)))
  }

  lazy val dir: Path = {
    val d = Files.createTempDirectory("griddap_src")
    Files.write(d.resolve("sstgrid.nc"), GridNc.write(fixtureGrid()))
    d
  }

  test("GridNc round-trips a grid through NetCDF-classic bytes") {
    val g = fixtureGrid()
    val bytes = GridNc.write(g)
    assert(bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' && bytes(3) == 1)
    val back = GridNc.read(bytes)
    assert(back.dims == g.dims)
    assert(back.vars.map(_.name) == g.vars.map(_.name))
    assert(back.coord("latitude").toSeq == g.coord("latitude").toSeq)
    assert(back.vars.find(_.name == "sst").get.values.toSeq ==
      g.vars.find(_.name == "sst").get.values.toSeq)
    // float var survives at float precision (values chosen exactly)
    assert(back.vars.find(_.name == "uwind").get.values.toSeq ==
      g.vars.find(_.name == "uwind").get.values.toSeq)
  }

  test("packed int storage round-trips: NC_SHORT/NC_INT with scale_factor/add_offset") {
    val g = graft.sources.griddap.GriddapFixture.intGrid()
    val bytes = GridNc.write(g)
    val back = GridNc.read(bytes)
    assert(back.dims == g.dims)
    // unpacked values identical (exact binary fractions)
    for (name <- Seq("sst_i16", "chl_i32")) {
      val b = back.vars.find(_.name == name).get
      val o = g.vars.find(_.name == name).get
      assert(b.values.toSeq == o.values.toSeq, name)
      assert(b.storage == o.storage && b.scaleFactor == o.scaleFactor &&
        b.addOffset == o.addOffset, s"$name packing metadata")
    }
    // the packed file really is smaller: short cells are 2 bytes not 8
    val plain = GridNc.write(g.copy(vars = g.vars.map(v =>
      v.copy(storage = 0, scaleFactor = 1.0, addOffset = 0.0))))
    assert(bytes.length < plain.length / 2)
    // DDS advertises the integer types
    val d = GridNc.dds(g, "s8gridint")
    assert(d.contains("Int16 sst_i16") && d.contains("Int32 chl_i32"))
    // write(read(bytes)) is byte-identical (packing fully reversible)
    assert(GridNc.write(back).toSeq == bytes.toSeq)
  }

  test("odd-cell short vars pad to the 4-byte boundary; values survive") {
    // 3 cells * 2 bytes = 6 → 2 pad bytes between vars; a following
    // var must still land on its begin offset
    val g = GridNc.Grid(
      dims = Seq(("x", 3)),
      vars = Seq(
        GridNc.Var("x", Seq(0), isFloat = false, Array(1.0, 2.0, 3.0)),
        GridNc.Var("a", Seq(0), isFloat = false, Array(0.5, 1.5, -2.0),
          storage = 3, scaleFactor = 0.5, addOffset = 0.0),
        GridNc.Var("b", Seq(0), isFloat = false, Array(-3.0, 0.0, 9.0),
          storage = 1, scaleFactor = 1.0, addOffset = 0.0), // NC_BYTE
        GridNc.Var("c", Seq(0), isFloat = false, Array(7.0, 8.0, 9.0))))
    val back = GridNc.read(GridNc.write(g))
    g.vars.foreach(v => assert(
      back.vars.find(_.name == v.name).get.values.toSeq == v.values.toSeq,
      v.name))
  }

  test("packed record vars append through appendRecordsToFile with padded slabs") {
    // record grid: time (record, double) + one NC_SHORT data var of 3
    // cells/record (6 bytes → 2 pad per slab)
    def rec(times: Array[Double], vals: Array[Double]) = GridNc.Grid(
      dims = Seq(("time", times.length), ("x", 3)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false, times),
        GridNc.Var("v", Seq(0, 1), isFloat = false, vals,
          storage = 3, scaleFactor = 0.25, addOffset = 2.0)),
      recordDim = Some(0))
    val base = rec(Array(0.0, 3600.0), Array(2.25, 2.5, 2.75, 3.0, 3.25, 3.5))
    val f = Files.createTempFile("packed_rec", ".nc")
    Files.write(f, GridNc.write(base))
    val extra = rec(Array(3600.0, 7200.0), Array(3.0, 3.25, 3.5, 4.0, 4.25, 4.5))
    assert(GridNc.appendRecordsToFile(f, extra) == 1) // 3600 already present
    val back = GridNc.read(Files.readAllBytes(f))
    assert(back.dims.head == ("time", 3))
    assert(back.coord("time").toSeq == Seq(0.0, 3600.0, 7200.0))
    assert(back.vars.find(_.name == "v").get.values.toSeq ==
      Seq(2.25, 2.5, 2.75, 3.0, 3.25, 3.5, 4.0, 4.25, 4.5))
    Files.delete(f)
  }

  test("DSv2 scan unpacks int-stored variables to exact doubles") {
    val fixtureDir = graft.sources.griddap.GriddapFixture.ensure()
    val df = spark.read.format("griddap")
      .option("dataDir", fixtureDir).option("dataset", "s8gridint")
      .load()
      .filter(col("latitude") === 25.0 && col("longitude") === -90.0)
      .select(col("time"), col("sst_i16"), col("chl_i32"))
    val rows = df.orderBy(col("time")).collect()
    assert(rows.length == graft.sources.griddap.GriddapFixture.nt)
    // lai=5, loi=5 → sst = (ti*100+55)*0.25 - 10, chl = (ti*10000+505)*0.5 + 100
    rows.zipWithIndex.foreach { case (r, ti) =>
      assert(r.getDouble(1) == (ti * 100 + 55) * 0.25 - 10.0, s"sst ti=$ti")
      assert(r.getDouble(2) == (ti * 10000 + 505) * 0.5 + 100.0, s"chl ti=$ti")
    }
  }

  test("CDF-2 (64-bit offsets) writes round-trip; small grids stay CDF-1") {
    val g = fixtureGrid()
    val v1 = GridNc.write(g)
    assert(v1(3) == 1) // small grid: CDF-1 chosen automatically
    val v2 = GridNc.write(g, forceVersion = 2)
    assert(v2(3) == 2)
    assert(v2.length == v1.length + 4 * g.vars.length) // 8-byte begins
    val back = GridNc.read(v2)
    assert(back.dims == g.dims)
    g.vars.foreach(v => assert(
      back.vars.find(_.name == v.name).get.values.toSeq == v.values.toSeq,
      v.name))
    // record-dim grids round-trip as CDF-2 too (append-at-scale shape)
    val rec = GridNc.Grid(
      dims = Seq(("time", 2), ("x", 3)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false, Array(0.0, 3600.0)),
        GridNc.Var("v", Seq(0, 1), isFloat = false,
          Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))),
      recordDim = Some(0))
    val rb = GridNc.read(GridNc.write(rec, forceVersion = 2))
    assert(rb.dims.head == ("time", 2) && rb.recordDim.contains(0))
    assert(rb.vars.find(_.name == "v").get.values.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("latFlip reverses ascending latitude and the data rows with it") {
    val g = fixtureGrid()
    val f = GridNc.latFlip(g)
    assert(f.coord("latitude").toSeq == Seq(24.0, 23.0, 22.0, 21.0, 20.0))
    // value at (t=0, lat=24, lon=-95) must be original (0, lai=4, 0)
    val sst = f.vars.find(_.name == "sst").get.values
    assert(sst(0) == 400 * 0.25)
    // double flip = identity on data
    val ff = GridNc.latFlip(f)
    assert(ff.coord("latitude").toSeq == f.coord("latitude").toSeq,
      "already-descending grid is a no-op")
  }

  test("griddap endpoint slices time/lat/lon hyperslabs server-side") {
    val srv = new LocalErddapServer(dir.toString)
    val url = "https://local/erddap/griddap/sstgrid.nc?" +
      "sst%5B(2024-03-01T01:00:00Z):1:(2024-03-01T03:00:00Z)%5D" +
      "%5B(21.0):1:(23.0)%5D%5B(-94.0):1:(-93.0)%5D"
    val sliced = GridNc.read(srv.fetchGriddap(url))
    assert(sliced.dims.map(_._2) == Seq(3, 3, 2))
    assert(sliced.coord("latitude").toSeq == Seq(21.0, 22.0, 23.0))
    assert(sliced.coord("longitude").toSeq == Seq(-94.0, -93.0))
    // first cell = (ti=1, lai=1, loi=1) of the original
    assert(sliced.vars.find(_.name == "sst").get.values(0) ==
      (1 * 10000 + 1 * 100 + 1) * 0.25)
  }

  def read() = spark.read.format("griddap")
    .option("dataDir", dir.toString)
    .option("dataset", "sstgrid")
    .option("slicesPerPartition", "2")

  test("DSv2 scan explodes the grid to long form") {
    val df = read().load()
    assert(df.columns.toSeq ==
      Seq("time", "latitude", "longitude", "sst", "uwind"))
    assert(df.count() == 6 * 5 * 4)
    assert(df.rdd.getNumPartitions == 3) // 6 slices / 2 per partition
    val r = df.filter(col("latitude") === 22.0 && col("longitude") === -94.0)
      .orderBy("time").head()
    assert(r.getTimestamp(0).toInstant == Instant.parse("2024-03-01T00:00:00Z"))
    assert(r.getDouble(3) == (0 * 10000 + 2 * 100 + 1) * 0.25)
  }

  test("hyperslab pushdown narrows partitions and bbox server-side") {
    val df = read().load()
      .filter(col("time") >= lit("2024-03-01 01:00:00").cast("timestamp") &&
        col("time") <= lit("2024-03-01 03:00:00").cast("timestamp") &&
        col("latitude") >= 21.0 && col("latitude") <= 23.0 &&
        col("longitude") >= -94.0 && col("longitude") <= -93.0)
    assert(df.count() == 3 * 3 * 2)
    assert(df.rdd.getNumPartitions == 2) // 3 kept slices / 2 per partition
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bbox-pushed"), s"expected bbox pushdown:\n$plan")
    val sums = df.agg(round(sum("sst"), 2), round(sum("uwind"), 2)).head()
    // independent recomputation
    var es = 0.0; var eu = 0.0
    for (ti <- 1 to 3; lai <- 1 to 3; loi <- 1 to 2) {
      es += (ti * 10000 + lai * 100 + loi) * 0.25
      eu += ti + lai * 0.5 + loi * 0.25
    }
    assert(sums.getDouble(0) == math.rint(es * 100) / 100)
    assert(sums.getDouble(1) == math.rint(eu * 100) / 100)
  }

  test("column pruning drops unselected variables from the request") {
    val df = read().load().select("time", "sst")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("cols=time,sst"), s"expected pruned cols:\n$desc")
    assert(df.count() == 120)
  }

  test("z-dimensioned grid is surface-sliced to [0]") {
    val nt = 2; val nz = 3; val nlat = 2; val nlon = 2
    val t0 = Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    val g = GridNc.Grid(
      dims = Seq(("time", nt), ("depth", nz), ("latitude", nlat), ("longitude", nlon)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false,
          Array.tabulate(nt)(i => (t0 + i * 3600L).toDouble)),
        GridNc.Var("depth", Seq(1), isFloat = false, Array(0.0, 10.0, 20.0)),
        GridNc.Var("latitude", Seq(2), isFloat = false, Array(20.0, 21.0)),
        GridNc.Var("longitude", Seq(3), isFloat = false, Array(-95.0, -94.0)),
        GridNc.Var("temp", Seq(0, 1, 2, 3), isFloat = false,
          Array.tabulate(nt * nz * nlat * nlon)(_.toDouble))))
    val d = Files.createTempDirectory("griddap_z")
    Files.write(d.resolve("zgrid.nc"), GridNc.write(g))
    val df = spark.read.format("griddap")
      .option("dataDir", d.toString).option("dataset", "zgrid").load()
    assert(df.columns.toSeq == Seq("time", "latitude", "longitude", "temp"))
    assert(df.count() == nt * nlat * nlon) // z sliced away
    // surface slice keeps z index 0: values 0..3 for t0, 12..15 for t1
    val v = df.filter(col("time") === lit("2024-03-01 00:00:00").cast("timestamp"))
      .orderBy("latitude", "longitude").collect().map(_.getDouble(3)).toSeq
    assert(v == Seq(0.0, 1.0, 2.0, 3.0))
  }

  test("distributed per-slice NetCDF write round-trips through the source (K4 scale path)") {
    val outDir = Files.createTempDirectory("nc_sink").toString
    val longForm = read().load() // 6 slices × 5 × 4, two vars
    val n = graft.sinks.NetcdfSink.writePerSlice(longForm, outDir,
      Seq("sst", "uwind"))
    assert(n == 6) // one file per time slice, written executor-side
    // each slice file is valid NetCDF with descending latitude
    val slice = GridNc.read(Files.readAllBytes(
      java.nio.file.Path.of(outDir, "slice_1709251200.nc")))
    assert(slice.coord("latitude").toSeq == Seq(24.0, 23.0, 22.0, 21.0, 20.0))
    assert(slice.dims.map(_._2) == Seq(1, 5, 4))
    // value at (t0, lat=24, lon=-95) = original (ti=0, lai=4, loi=0)
    assert(slice.vars.find(_.name == "sst").get.values(0) == 400 * 0.25)
    // NaN-fill: a hole in the long form becomes NaN, not a misalignment
    val holey = longForm.filter(!(col("latitude") === 22.0 && col("longitude") === -93.0))
    val outDir2 = Files.createTempDirectory("nc_sink2").toString
    graft.sinks.NetcdfSink.writePerSlice(holey, outDir2, Seq("sst", "uwind"))
    val s2 = GridNc.read(Files.readAllBytes(
      java.nio.file.Path.of(outDir2, "slice_1709251200.nc")))
    val sst2 = s2.vars.find(_.name == "sst").get.values
    // flipped: lat 22 is row index 2, lon -93 is col 2
    assert(sst2(2 * 4 + 2).isNaN)
    assert(!sst2(2 * 4 + 3).isNaN)
  }

  test("imagery publish (K7): portal item with reoriented NetCDF, scannable back") {
    val portal = graft.sinks.Portal.forRoot(
      Files.createTempDirectory("portal_img").toString)
    val item = portal.publishImagery("SST imagery", fixtureGrid(), Seq("did_sst"))
    assert(item.itemType == "Imagery Layer")
    assert(item.tags.contains("erddap2agol") && item.tags.contains("did_sst"))
    val stored = GridNc.read(Files.readAllBytes(
      java.nio.file.Path.of(portal.imageryDir(item), "imagery.nc")))
    assert(stored.coord("latitude").head == 24.0) // north→south
    // scannable through the griddap source; long-form content matches
    val back = spark.read.format("griddap")
      .option("dataDir", portal.imageryDir(item))
      .option("dataset", "imagery").load()
      .select("time", "latitude", "longitude", "sst", "uwind")
      .orderBy("time", "latitude", "longitude").collect().toSeq
    val orig = read().load()
      .select("time", "latitude", "longitude", "sst", "uwind")
      .orderBy("time", "latitude", "longitude").collect().toSeq
    assert(back == orig)
  }

  /** Record-dim (unlimited time) twin of [[fixtureGrid]]: `nt` slices,
    * same lat/lon structure, time as the record dimension. */
  def recordGrid(nt: Int, t0Offset: Int = 0): GridNc.Grid = {
    val nlat = 5; val nlon = 4
    val t0 = Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    val times = Array.tabulate(nt)(i => (t0 + (t0Offset + i) * 3600L).toDouble)
    def sst(ti: Int, lai: Int, loi: Int) =
      ((t0Offset + ti) * 10000 + lai * 100 + loi) * 0.25
    val sstV = Array.tabulate(nt * nlat * nlon) { k =>
      sst(k / (nlat * nlon), k / nlon % nlat, k % nlon) }
    GridNc.Grid(
      dims = Seq(("time", nt), ("latitude", nlat), ("longitude", nlon)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false, times),
        GridNc.Var("latitude", Seq(1), isFloat = false,
          Array.tabulate(nlat)(i => 20.0 + i)),
        GridNc.Var("longitude", Seq(2), isFloat = false,
          Array.tabulate(nlon)(i => -95.0 + i)),
        GridNc.Var("sst", Seq(0, 1, 2), isFloat = false, sstV)),
      recordDim = Some(0))
  }

  test("record-dim grid round-trips; record section interleaves per record") {
    val g = recordGrid(3)
    val bytes = GridNc.write(g)
    // numrecs field carries the record count; the dim is stored as 0
    val buf = java.nio.ByteBuffer.wrap(bytes)
    assert(buf.getInt(4) == 3)
    val back = GridNc.read(bytes)
    assert(back.recordDim.contains(0))
    assert(back.dims == g.dims) // record dim reads back at CURRENT length
    assert(back.coord("time").toSeq == g.coord("time").toSeq)
    assert(back.vars.find(_.name == "sst").get.values.toSeq ==
      g.vars.find(_.name == "sst").get.values.toSeq)
    // DSv2 source scans a record-dim file like any other
    val d = Files.createTempDirectory("griddap_rec")
    Files.write(d.resolve("rec.nc"), bytes)
    val df = spark.read.format("griddap")
      .option("dataDir", d.toString).option("dataset", "rec").load()
    assert(df.count() == 3 * 5 * 4)
  }

  test("appendRecords grows a record-dim file without touching old bytes") {
    val base = GridNc.write(recordGrid(3))
    val appended = GridNc.appendRecords(base, recordGrid(2, t0Offset = 3))
    // old bytes are a strict prefix, except the 4-byte numrecs patch
    assert(appended.length > base.length)
    assert(appended.slice(8, base.length).toSeq == base.slice(8, base.length).toSeq,
      "append must not rewrite existing header/data bytes")
    assert(java.nio.ByteBuffer.wrap(appended).getInt(4) == 5)
    val back = GridNc.read(appended)
    assert(back.dims.head == ("time", 5))
    assert(back.coord("time").length == 5)
    // last slice's first cell = sst(ti=4, 0, 0)
    val sst = back.vars.find(_.name == "sst").get.values
    assert(sst(4 * 20) == 4 * 10000 * 0.25)
  }

  test("appendRecordsToFile writes only the tail + numrecs patch; idempotent on re-delivery") {
    val d = Files.createTempDirectory("griddap_append")
    val f = d.resolve("grow.nc")
    Files.write(f, GridNc.write(recordGrid(3)))
    val before = Files.readAllBytes(f)

    // fresh download covering old slices 2..3 plus two NEW ones — only
    // the records after the file's max time are appended
    val n = GridNc.appendRecordsToFile(f, recordGrid(4, t0Offset = 1))
    assert(n == 2)
    val after = Files.readAllBytes(f)
    val recBytes = 8 + 20 * 8 // one time cell + 5×4 sst cells per record
    assert(after.length == before.length + 2 * recBytes,
      "file must grow by exactly the new records' bytes")
    assert(after.slice(8, before.length).toSeq == before.slice(8, before.length).toSeq,
      "existing bytes untouched (only numrecs patched)")
    val back = GridNc.read(after)
    assert(back.coord("time").length == 5)
    assert(back.vars.find(_.name == "sst").get.values(4 * 20) == 4 * 10000 * 0.25)

    // re-delivering the same window appends nothing
    assert(GridNc.appendRecordsToFile(f, recordGrid(4, t0Offset = 1)) == 0)
    assert(Files.readAllBytes(f).length == after.length)
  }

  test("appendRecordsToFile truncates the orphan tail of an interrupted append") {
    val d = Files.createTempDirectory("griddap_crash")
    val f = d.resolve("crashed.nc")
    Files.write(f, GridNc.write(recordGrid(3)))
    val clean = Files.readAllBytes(f)
    // simulate a crash AFTER tail slabs were written but BEFORE the
    // numrecs patch: orphan bytes past the last counted record
    Files.write(f, Array.fill[Byte](57)(0x7F),
      java.nio.file.StandardOpenOption.APPEND)

    val n = GridNc.appendRecordsToFile(f, recordGrid(2, t0Offset = 3))
    assert(n == 2)
    val back = GridNc.read(Files.readAllBytes(f))
    val t0 = Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    assert(back.coord("time").toSeq == (0 until 5).map(i => (t0 + i * 3600L).toDouble))
    val sst = back.vars.find(_.name == "sst").get.values
    assert(sst(4 * 20) == 4 * 10000 * 0.25, "new records at clean offsets")
    // the orphan bytes are gone: size is exactly header + 5 records
    val recBytes = 8 + 20 * 8
    assert(Files.readAllBytes(f).length == clean.length + 2 * recBytes)

    // a file SHORTER than its header claims is refused, not misread
    val g = d.resolve("short.nc")
    Files.write(g, clean.dropRight(10))
    assertThrows[IllegalArgumentException] {
      GridNc.appendRecordsToFile(g, recordGrid(4, t0Offset = 3))
    }
  }

  test("filechange stream drives incremental record append, no full rewrite (NRT grid refresh)") {
    import java.nio.file.attribute.FileTime
    // upstream: the growing source grid; published: the record-dim file
    // the refresh APPENDS to (the reference re-downloads growing time
    // dims; here the publish side grows in O(new slices))
    val d = Files.createTempDirectory("griddap_nrt")
    val upstream = d.resolve("upstream.nc")
    val published = d.resolve("published.nc")
    Files.write(upstream, GridNc.write(recordGrid(3)))
    Files.setLastModifiedTime(upstream, FileTime.fromMillis(1000000L))
    Files.write(published, GridNc.write(recordGrid(3)))
    val sizes = collection.mutable.ArrayBuffer.empty[Long]

    val q = spark.readStream.format("filechange")
      .option("path", upstream.toString).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val fresh = GridNc.read(Files.readAllBytes(upstream))
          GridNc.appendRecordsToFile(published, fresh)
          sizes += Files.size(published)
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(sizes.size == 1) // initial change row; nothing new to append
      val size1 = sizes.last

      // upstream grows by one slice → exactly one record appended
      Files.write(upstream, GridNc.write(recordGrid(4)))
      Files.setLastModifiedTime(upstream, FileTime.fromMillis(2000000L))
      q.processAllAvailable()
      val recBytes = 8 + 20 * 8
      assert(sizes.last == size1 + recBytes)
      val back = GridNc.read(Files.readAllBytes(published))
      assert(back.coord("time").length == 4)
    } finally q.stop()
  }

  test("record-dim imagery refresh appends slices instead of rewriting (K7 NRT)") {
    val portal = graft.sinks.Portal.forRoot(
      Files.createTempDirectory("portal_img_rec").toString)
    val item = portal.publishImagery("SST nrt imagery", recordGrid(3))
    val f = java.nio.file.Path.of(portal.imageryDir(item), "imagery.nc")
    val before = Files.readAllBytes(f)
    assert(GridNc.hasRecordDim(f))

    // fresh download overlaps the stored window and adds 2 slices
    val appended = portal.refreshImagery(item, recordGrid(5))
    assert(appended == 2)
    val after = Files.readAllBytes(f)
    val recBytes = 8 + 20 * 8
    assert(after.length == before.length + 2 * recBytes)
    assert(after.slice(8, before.length).toSeq == before.slice(8, before.length).toSeq,
      "refresh must append, not rewrite")
    // scannable through the griddap source at the new length
    val back = spark.read.format("griddap")
      .option("dataDir", portal.imageryDir(item))
      .option("dataset", "imagery").load()
    assert(back.count() == 5 * 5 * 4)
    // idempotent re-delivery
    assert(portal.refreshImagery(item, recordGrid(5)) == 0)

    // fixed-dim artifacts keep the rewrite road
    val fixedItem = portal.publishImagery("SST fixed imagery", fixtureGrid())
    val pf = java.nio.file.Path.of(portal.imageryDir(fixedItem), "imagery.nc")
    assert(!GridNc.hasRecordDim(pf))
    assert(portal.refreshImagery(fixedItem, fixtureGrid()) == 6)
  }

  test("write-read round trip through the endpoint preserves values (K4)") {
    // publish path: lat-flip then write; scan back through the source
    val flipped = GridNc.latFlip(fixtureGrid())
    val d = Files.createTempDirectory("griddap_k4")
    Files.write(d.resolve("pub.nc"), GridNc.write(flipped))
    val df = spark.read.format("griddap")
      .option("dataDir", d.toString).option("dataset", "pub").load()
    // long-form content identical to the unflipped grid's long form
    val orig = read().load()
    val a = df.select("time", "latitude", "longitude", "sst", "uwind")
      .orderBy("time", "latitude", "longitude").collect().toSeq
    val b = orig.select("time", "latitude", "longitude", "sst", "uwind")
      .orderBy("time", "latitude", "longitude").collect().toSeq
    assert(a == b)
  }
}
