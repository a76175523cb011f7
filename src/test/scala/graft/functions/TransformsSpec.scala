package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

class TransformsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("v").select(c.as("r")).head().getString(0)

  // ---- TextCase (F7) -------------------------------------------------------

  test("Capital / AllCapital") {
    assert(one(TextCase.capital(col("v")), "hello WORLD") == "Hello world")
    assert(one(TextCase.allCapital(col("v")), "hello wORLD foo") == "Hello World Foo")
  }

  test("Title: minor words stay lower unless sentence-initial") {
    assert(one(TextCase.title(col("v")), "the quick brown fox and the dog")
      == "The Quick Brown Fox and the Dog")
    // punctuation re-capitalizes the next word
    assert(one(TextCase.title(col("v")), "end. the new start")
      == "End. The New Start")
    // hyphenated words capitalize each segment
    assert(one(TextCase.title(col("v")), "well-known fact")
      == "Well-Known Fact")
    // reference quirk: "so" is NOT in the minor list (entry is "so,")
    assert(one(TextCase.title(col("v")), "a so b") == "A So B")
  }

  test("Camel / camel / Acronym") {
    assert(one(TextCase.camelUpper(col("v")), "hello world foo") == "HelloWorldFoo")
    assert(one(TextCase.camelLower(col("v")), "Hello world foo") == "helloWorldFoo")
    assert(one(TextCase.acronym(col("v")), "quality control flag") == "qcf")
  }

  test("sanitizeName: non-alnum runs → _, clipped to 31") {
    assert(one(TextCase.sanitizeName(col("v")), "sea temp (°C) @surface!")
      == "sea_temp_C_surface_")
    assert(one(TextCase.sanitizeName(col("v")), "x" * 40) == "x" * 31)
  }

  // ---- Extraction DSL (F6) -------------------------------------------------

  test("offset/length/start/end/concat chain like the reference pipeline") {
    import Extraction._
    assert(one(pipeline(col("v"), Seq(Offset(2), Length(3))), "abcdefg") == "cde")
    assert(one(pipeline(col("v"), Seq(Start("id="), End("&"))), "x?id=42&y=1") == "42")
    assert(one(pipeline(col("v"), Seq(Concat("_suffix"))), "base") == "base_suffix")
  }

  test("numeric ops stringify like python str(float), bad input → 0.0") {
    import Extraction._
    assert(one(pipeline(col("v"), Seq(Add(2.5))), "10") == "12.5")
    assert(one(pipeline(col("v"), Seq(Mult(2.0))), "3") == "6.0")
    assert(one(pipeline(col("v"), Seq(Add(1.0))), "junk") == "1.0")
    assert(one(pipeline(col("v"), Seq(Pow(2.0), Abs)), "-3") == "9.0")
    assert(one(pipeline(col("v"), Seq(Root(2.0))), "16") == "4.0")
  }

  // ---- Geometry (F16-F20) --------------------------------------------------

  def geo(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      ords: Seq[Double]): String =
    Seq(ords).toDF("o").select(to_json(f(col("o"))).as("j")).head().getString(0)

  test("point swaps lat-lon to lon-lat, optional z") {
    assert(geo(Geometry.point, Seq(25.9, -89.7)) == "[-89.7,25.9]")
    assert(geo(Geometry.point, Seq(25.9, -89.7, 5.0)) == "[-89.7,25.9,5.0]")
  }

  test("line chunks flat ordinates into swapped points") {
    assert(geo(c => Geometry.line(c), Seq(1.0, 2.0, 3.0, 4.0))
      == "[[2.0,1.0],[4.0,3.0]]")
  }

  test("polygon reverses to counter-clockwise exterior ring") {
    assert(geo(c => Geometry.polygon(c), Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
      == "[[[6.0,5.0],[4.0,3.0],[2.0,1.0]]]")
  }

  test("box builds closed 5-point ring from two corners") {
    // ordinates lat-first: ll=(y0,x0)=(0,0), ur=(y2,x4)=(2,4);
    // ul=[ur_y,ll_x]=(2,0), lr=[ll_y,ur_x]=(0,4); ring swapped to x,y
    // then reversed CCW (reference trace, Xml2GeoJSON.py:910-920)
    assert(geo(c => Geometry.box(c), Seq(0.0, 0.0, 2.0, 4.0)) ==
      "[[[0.0,0.0],[4.0,0.0],[4.0,2.0],[0.0,2.0],[0.0,0.0]]]")
  }

  test("elevation broadcast appends z to every point") {
    val df = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("coords")
    val out = df.select(to_json(
      Geometry.addElevation(col("coords"), lit(9.0))).as("j")).head().getString(0)
    assert(out == "[[1.0,2.0,9.0],[3.0,4.0,9.0]]")
  }

  test("zAdjust: z = abs(z)*factor + offset; stripZM drops/nulls ordinates") {
    val df = Seq(Seq(1.0, 2.0, -3.0)).toDF("c")
    val adj = df.select(to_json(Geometry.zAdjust(col("c"), lit(2.0), lit(1.0),
      zAbsolute = true)).as("j")).head().getString(0)
    assert(adj == "[1.0,2.0,7.0]")
    val df4 = Seq(Seq(1.0, 2.0, 3.0, 4.0)).toDF("c")
    assert(df4.select(to_json(Geometry.stripZM(col("c"), keepZ = false,
      keepM = false)).as("j")).head().getString(0) == "[1.0,2.0]")
    assert(df4.select(to_json(Geometry.stripZM(col("c"), keepZ = false,
      keepM = true)).as("j")).head().getString(0) == "[1.0,2.0,null,4.0]")
  }

  test("multi-part promotion and type canonicalization") {
    val df = Seq((Seq(Seq(Seq(1.0, 2.0))), "linestring")).toDF("parts", "t")
    val single = df.select(Geometry.multiPromote(
      Geometry.canonicalType(col("t")), col("parts")).as("j")).head().getString(0)
    assert(single == """{"type":"LineString","coordinates":[[1.0,2.0]]}""")
    val df2 = Seq((Seq(Seq(Seq(1.0, 2.0)), Seq(Seq(3.0, 4.0))), "linestring"))
      .toDF("parts", "t")
    val multi = df2.select(Geometry.multiPromote(
      Geometry.canonicalType(col("t")), col("parts")).as("j")).head().getString(0)
    assert(multi.startsWith("""{"type":"MultiLineString","""))
  }

  // ---- Flatten (F13/F14) ---------------------------------------------------

  test("flatten: nested structs to path columns, arrays to json, collisions uniquified") {
    val df = spark.read.json(Seq(
      """{"a": {"b": 1, "c": {"d": "x"}}, "a_b": 9, "tags": [1,2], "top": "t"}"""
    ).toDS())
    val flat = graft.operators.Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("a_b", "a_c_d", "a_b2", "tags", "top"))
    val row = flat.head()
    assert(row.getLong(0) == 1L)
    assert(row.getString(1) == "x")
    assert(row.getLong(2) == 9L)
    assert(row.getString(3) == "[1,2]")
  }

  test("flatten: exclusion paths are skipped") {
    val df = spark.read.json(Seq(
      """{"a": {"b": 1, "skip": {"x": 2}}, "keep": 3}""").toDS())
    val flat = graft.operators.Flatten.flatten(df, exclude = Set("a.skip"))
    assert(flat.columns.toSeq == Seq("a_b", "keep"))
  }

  // ---- GeoJson sink (K2) ---------------------------------------------------

  test("feature lines + FeatureCollection document") {
    val df = Seq((1L, "alpha", -89.7, 25.9), (2L, "beta", -88.0, 26.0))
      .toDF("id", "name", "lon", "lat")
    val geom = struct(lit("Point").as("type"),
      array(col("lon"), col("lat")).as("coordinates"))
    val lines = graft.sinks.GeoJson.featureLines(df, geom, Seq("id", "name"))
      .collect().map(_.getString(0))
    assert(lines(0) ==
      """{"type":"Feature","properties":{"id":1,"name":"alpha"},"geometry":{"type":"Point","coordinates":[-89.7,25.9]}}""")
    val tmp = java.nio.file.Files.createTempFile("fc", ".geojson").toString
    val n = graft.sinks.GeoJson.writeFeatureCollection(df, geom, Seq("id", "name"), tmp)
    assert(n == 2)
    val doc = java.nio.file.Files.readString(java.nio.file.Path.of(tmp))
    assert(doc.startsWith("{\"type\": \"FeatureCollection\""))
    assert(doc.contains("\"coordinates\":[-88.0,26.0]"))
    assert(doc.trim.endsWith("]}"))

    // the driver-funnel guard: a frame over maxRows is refused with a
    // pointer at the distributed writer; maxRows = 0 disables
    val tmp2 = java.nio.file.Files.createTempFile("fc2", ".geojson").toString
    val e = intercept[IllegalArgumentException] {
      graft.sinks.GeoJson.writeFeatureCollection(df, geom, Seq("id", "name"),
        tmp2, maxRows = 1)
    }
    assert(e.getMessage.contains("writeSeq"))
    assert(graft.sinks.GeoJson.writeFeatureCollection(df, geom,
      Seq("id", "name"), tmp2, maxRows = 0) == 2)
  }
}
