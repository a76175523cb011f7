package graft.erddap

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class DasSpec extends AnyFunSuite {

  // Fixture after FIXTURES.md §2 (buoy-style gcoos_42G01 shape), incl.
  // multiline license and a "String summary" with the value on the
  // next line.
  val dasText: String =
    """Attributes {
      |  time {
      |    String ioos_category "Time";
      |    String units "seconds since 1970-01-01T00:00:00Z";
      |    Float64 actual_range 1716595200.0, 1719532800.0;
      |  }
      |  latitude {
      |    Float64 actual_range 25.9, 25.9;
      |  }
      |  longitude {
      |    Float64 actual_range -89.7, -89.7;
      |  }
      |  sea_surface_temperature_0 {
      |    Float64 actual_range 22.1, 31.4;
      |    String units "degree_C";
      |  }
      |  sea_water_speed_0 {
      |    Float64 actual_range 0.0, 2.2;
      |  }
      |  sea_surface_temperature_0_qc_agg {
      |    Byte actual_range 1, 4;
      |  }
      |  qartod_speed_flag {
      |    Byte actual_range 1, 9;
      |  }
      |  s {
      |    String units "1";
      |  }
      |  no_range_var {
      |    String long_name "x";
      |    String units "1";
      |  }
      |  NC_GLOBAL {
      |    String title "GCOOS 42G01 Buoy";
      |    String summary "A multi-line summary that
      |continues on the next line";
      |    String institution "GCOOS";
      |    String license
      |"The data may be used and redistributed for free
      |but is not intended for legal use.";
      |    Float64 geospatial_lat_min 25.9;
      |    Float64 geospatial_lat_max 25.9;
      |    Float64 geospatial_lon_min -89.7;
      |    Float64 geospatial_lon_max -89.7;
      |  }
      |}""".stripMargin

  lazy val doc: Das.Document = Das.parse(dasText)

  test("parses sections in order with typed attributes") {
    assert(doc.sections.keys.toSeq.head == "time")
    assert(doc.sections("time")("actual_range").value == "1716595200.0, 1719532800.0")
    assert(doc.sections("time")("units").value == "seconds since 1970-01-01T00:00:00Z")
    assert(doc.sections("latitude")("actual_range").datatype == "Float64")
  }

  test("multiline NC_GLOBAL strings are joined (same-line start)") {
    // reference quirk: multiline values keep the opening quote
    // (das_client.py:80 does rstrip only)
    assert(doc.ncGlobal("summary").value ==
      "\"A multi-line summary that\ncontinues on the next line")
  }

  test("multiline NC_GLOBAL strings where quotes start on next line") {
    assert(doc.ncGlobal("license").value.startsWith("\"The data may be used"))
    assert(doc.ncGlobal("license").value.endsWith("legal use."))
  }

  test("QC pruning policy keeps data vars, drops qc/qartod/1-char/no-range") {
    val sel = AttributePolicy.actualAttributes(doc)
    assert(sel.attributes.toSet == Set(
      "time", "latitude", "longitude",
      "sea_surface_temperature_0", "sea_water_speed_0"))
    assert(sel.timeCol.contains("time"))
    assert(!sel.hasError)
    assert(!sel.noTimeRange)
  }

  test("returnAll keeps everything except 1-char and NC_GLOBAL") {
    val sel = AttributePolicy.actualAttributes(doc, returnAll = true)
    assert(sel.attributes.contains("qartod_speed_flag"))
    assert(sel.attributes.contains("no_range_var"))
    assert(!sel.attributes.contains("s"))
    assert(!sel.attributes.exists(_.toLowerCase == "nc_global"))
  }

  test("time-column fallback: ioos_category=Time + epoch units") {
    val d2 = Das.parse(
      """Attributes {
        |  obs_time {
        |    String ioos_category "Time";
        |    String units "seconds since 1970-01-01T00:00:00Z";
        |    Float64 actual_range 0.0, 100.0;
        |  }
        |  latitude {
        |    Float64 actual_range 1.0, 2.0;
        |  }
        |  longitude {
        |    Float64 actual_range 1.0, 2.0;
        |  }
        |}""".stripMargin)
    val sel = AttributePolicy.actualAttributes(d2)
    assert(sel.timeCol.contains("obs_time"))
  }

  test("missing lat/lon flags error") {
    val d2 = Das.parse(
      """Attributes {
        |  time {
        |    Float64 actual_range 0.0, 1.0;
        |  }
        |}""".stripMargin)
    assert(AttributePolicy.actualAttributes(d2).hasError)
  }

  test("schema: time→timestamp, Float64→double, metadata preserved") {
    val sel = AttributePolicy.actualAttributes(doc)
    val st = Das.toStructType(doc, sel.attributes, sel.timeCol)
    assert(st("time").dataType == TimestampType)
    assert(st("latitude").dataType == DoubleType)
    assert(st("sea_surface_temperature_0").metadata.getString("units") == "degree_C")
  }

  test("time extent: epoch pair, future end clamped to now") {
    val now = java.time.Instant.parse("2024-06-01T00:00:00Z")
    val Some((s, e)) = Das.timeExtent(doc, "time", now)
    assert(s == java.time.Instant.ofEpochSecond(1716595200L))
    assert(e == now) // 1719532800 = 2024-06-28 > now → clamped
  }

  test("griddap selection skips quality/reference coverage types") {
    val d2 = Das.parse(
      """Attributes {
        |  time {
        |    Float64 actual_range 0.0, 1.0;
        |  }
        |  latitude {
        |    Float64 actual_range 1.0, 2.0;
        |  }
        |  longitude {
        |    Float64 actual_range 1.0, 2.0;
        |  }
        |  sst {
        |    String coverage_content_type "physicalMeasurement";
        |  }
        |  sst_flags {
        |    String coverage_content_type "qualityInformation";
        |  }
        |  sst_gradient_magnitude {
        |    String coverage_content_type "physicalMeasurement";
        |  }
        |}""".stripMargin)
    val sel = AttributePolicy.griddapDimensions(d2)
    assert(sel.attributes == Seq("sst"))
    assert(sel.timeCol.contains("time"))
  }
}
