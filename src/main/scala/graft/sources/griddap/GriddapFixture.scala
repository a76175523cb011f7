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

  /** Write (idempotently) and return the fixture directory. */
  def ensure(): String = {
    val dir = Path.of(System.getProperty("java.io.tmpdir"), "graft_griddap_fixture")
    Files.createDirectories(dir)
    val f = dir.resolve("s8grid.nc")
    if (!Files.exists(f)) Files.write(f, GridNc.write(grid()))
    dir.toString
  }
}
