package graft.sources.griddap

import java.nio.file.{Files, Path}

/** Deterministic griddap fixture backing the `s8_griddap_scan` gate:
  * 24 hourly slices × 11 lats (20..30) × 11 lons (−95..−85), values an
  * exact binary-fraction function of the indices so Spark and the
  * DuckDB oracle (which recomputes them from `range()`) agree bit-for-
  * bit. `sst` stored as NC_DOUBLE, `uwind` as NC_FLOAT (both exactly
  * representable at float precision).
  */
object GriddapFixture {

  val nt = 24; val nlat = 11; val nlon = 11
  val t0: Long = 1709251200L // 2024-03-01T00:00:00Z

  def grid(): GridNc.Grid = {
    val times = Array.tabulate(nt)(i => (t0 + i * 3600L).toDouble)
    val lats = Array.tabulate(nlat)(i => 20.0 + i)
    val lons = Array.tabulate(nlon)(i => -95.0 + i)
    val sst = Array.tabulate(nt * nlat * nlon) { k =>
      val ti = k / (nlat * nlon); val lai = k / nlon % nlat; val loi = k % nlon
      (ti * 10000 + lai * 100 + loi) * 0.25
    }
    val uwind = Array.tabulate(nt * nlat * nlon) { k =>
      val ti = k / (nlat * nlon); val lai = k / nlon % nlat; val loi = k % nlon
      ti + lai * 0.5 + loi * 0.25
    }
    GridNc.Grid(
      dims = Seq(("time", nt), ("latitude", nlat), ("longitude", nlon)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false, times),
        GridNc.Var("latitude", Seq(1), isFloat = false, lats),
        GridNc.Var("longitude", Seq(2), isFloat = false, lons),
        GridNc.Var("sst", Seq(0, 1, 2), isFloat = false, sst),
        GridNc.Var("uwind", Seq(0, 1, 2), isFloat = true, uwind)))
  }

  /** Packed-integer variant of the same grid — the shape ERDDAP's
    * griddap actually serves for many satellite products
    * (`data_wrangler.py:591-604` reads them through xarray, which
    * applies CF scale_factor/add_offset): `sst_i16` stored NC_SHORT
    * with scale 0.25 / offset −10, `chl_i32` stored NC_INT with scale
    * 0.5 / offset 100. All unpacked values are exact binary fractions,
    * so Spark and the DuckDB oracle agree bit-for-bit. */
  def intGrid(): GridNc.Grid = {
    val times = Array.tabulate(nt)(i => (t0 + i * 3600L).toDouble)
    val lats = Array.tabulate(nlat)(i => 20.0 + i)
    val lons = Array.tabulate(nlon)(i => -95.0 + i)
    val sstI16 = Array.tabulate(nt * nlat * nlon) { k =>
      val ti = k / (nlat * nlon); val lai = k / nlon % nlat; val loi = k % nlon
      (ti * 100 + lai * 10 + loi) * 0.25 - 10.0 // raw ≤ 2410 < 2^15
    }
    val chlI32 = Array.tabulate(nt * nlat * nlon) { k =>
      val ti = k / (nlat * nlon); val lai = k / nlon % nlat; val loi = k % nlon
      (ti * 10000 + lai * 100 + loi) * 0.5 + 100.0
    }
    GridNc.Grid(
      dims = Seq(("time", nt), ("latitude", nlat), ("longitude", nlon)),
      vars = Seq(
        GridNc.Var("time", Seq(0), isFloat = false, times),
        GridNc.Var("latitude", Seq(1), isFloat = false, lats),
        GridNc.Var("longitude", Seq(2), isFloat = false, lons),
        GridNc.Var("sst_i16", Seq(0, 1, 2), isFloat = false, sstI16,
          storage = 3, scaleFactor = 0.25, addOffset = -10.0), // NC_SHORT
        GridNc.Var("chl_i32", Seq(0, 1, 2), isFloat = false, chlI32,
          storage = 4, scaleFactor = 0.5, addOffset = 100.0))) // NC_INT
  }

  /** Write (idempotently) and return the fixture directory. */
  def ensure(): String = {
    val dir = Path.of(System.getProperty("java.io.tmpdir"), "graft_griddap_fixture")
    Files.createDirectories(dir)
    val f = dir.resolve("s8grid.nc")
    if (!Files.exists(f)) Files.write(f, GridNc.write(grid()))
    val fi = dir.resolve("s8gridint.nc")
    if (!Files.exists(fi)) Files.write(fi, GridNc.write(intGrid()))
    dir.toString
  }
}
