package graft.erddap

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** Golden-URL tests — the reference's own test idea
  * (`tests/erddap_client_tests.py:50-95`) with fixtures from
  * `tests/test_params.py`, against the CURRENT URL grammar
  * (`data_wrangler.py:360-387`). */
class UrlCompilerSpec extends AnyFunSuite {

  val server = "https://erddap2.gcoos.org/erddap/tabledap/"

  test("golden: gcoos_42G01 csvp with additionals and time range") {
    val req = UrlCompiler.Tabledap(
      server = server,
      datasetId = "gcoos_42G01",
      format = "csvp",
      attributes = Seq("latitude", "longitude", "sea_surface_temperature_0",
        "sea_water_speed_0", "sea_water_direction_0", "upward_sea_water_velocity_0"),
      timeCol = Some("time"),
      start = Some("2024-05-25T00:00:00"),
      end = Some("2024-06-28T00:00:00"))
    assert(UrlCompiler.compile(req) == Seq(
      "https://erddap2.gcoos.org/erddap/tabledap/gcoos_42G01.csvp" +
        "?time%2Clatitude%2Clongitude%2Csea_surface_temperature_0%2C" +
        "sea_water_speed_0%2Csea_water_direction_0%2Cupward_sea_water_velocity_0" +
        "&time%3E%3D2024-05-25T00:00:00Z&time%3C%3D2024-06-28T00:00:00Z"))
  }

  test("golden: fsuNoaaShipWTEOnrt csvp") {
    val req = UrlCompiler.Tabledap(
      server = server, datasetId = "fsuNoaaShipWTEOnrt", format = "csvp",
      attributes = Seq("airTemperature"), timeCol = Some("time"),
      start = Some("2024-01-23T14:02:00"), end = Some("2024-02-19T23:59:00"))
    assert(UrlCompiler.compile(req) == Seq(
      "https://erddap2.gcoos.org/erddap/tabledap/fsuNoaaShipWTEOnrt.csvp" +
        "?time%2CairTemperature" +
        "&time%3E%3D2024-01-23T14:02:00Z&time%3C%3D2024-02-19T23:59:00Z"))
  }

  test("depth forced to front, time pulled out of attribute list") {
    val ordered = UrlCompiler.orderAttributes(
      Seq("a", "depth", "time", "b"), Some("time"))
    assert(ordered == Seq("depth", "a", "b"))
  }

  test("no time range → bare projection URL") {
    val req = UrlCompiler.Tabledap(server, "ds1", "csvp",
      Seq("a", "b"), Some("time"), noTimeRange = true)
    assert(UrlCompiler.compile(req) == Seq(s"${server}ds1.csvp?a%2Cb"))
  }

  test("chunked request emits one URL per subset") {
    val chunks = ChunkPlanner.timeSubsets(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-03T00:00:00Z"),
      rowCount = 200, chunkSize = 100)
    val req = UrlCompiler.Tabledap(server, "ds1", "csvp",
      Seq("a"), Some("time"), chunks = chunks)
    val urls = UrlCompiler.compile(req)
    assert(urls.size == 2)
    assert(urls.head ==
      s"${server}ds1.csvp?time%2Ca&time%3E%3D2024-01-01T00:00:00Z&time%3C%3D2024-01-02T00:00:00Z")
    // interior chunk start is STRICT (%3E): adjacent chunks share the
    // boundary instant, so closed-closed would fetch boundary rows twice
    assert(urls.last ==
      s"${server}ds1.csvp?time%2Ca&time%3E2024-01-02T00:00:00Z&time%3C%3D2024-01-03T00:00:00Z")
  }

  test("griddap hyperslab: range + z-slice + extent") {
    val req = UrlCompiler.Griddap(
      server = server, datasetId = "grid1", variables = Seq("sst"),
      start = "2024-01-01T00:00:00", end = "2024-01-02T00:00:00",
      latRange = (18.0, 31.0), lonRange = (-98.0, -76.0), zSlice = true)
    assert(UrlCompiler.compileGriddap(req) == Seq(
      "https://erddap2.gcoos.org/erddap/griddap/grid1.nc?" +
        "sst%5B(2024-01-01T00:00:00Z):1:(2024-01-02T00:00:00Z)%5D%5B0%5D" +
        "%5B(18.0):1:(31.0)%5D%5B(-98.0):1:(-76.0)%5D"))
  }

  test("griddap latest → single time slice selector") {
    val req = UrlCompiler.Griddap(server, "grid1", Seq("sst"),
      start = "2024-01-02T00:00:00", end = "2024-01-02T00:00:00",
      latRange = (0.0, 1.0), lonRange = (0.0, 1.0))
    val url = UrlCompiler.compileGriddap(req).head
    assert(url.contains("sst%5B(2024-01-02T00:00:00Z)%5D%5B(0.0)"))
  }
}
