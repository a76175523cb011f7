package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{GridOps, SparkTestSession}

class ReadersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("FeatureCollection: detects 'features' root and flattens items") {
    val f = Files.createTempFile("fc", ".json")
    Files.writeString(f,
      """{"type": "FeatureCollection", "generated": "2024-05-25T00:00:00Z",
        | "features": [
        |  {"type": "Feature", "properties": {"mag": 1.5, "place": "off coast"},
        |   "geometry": {"type": "Point", "coordinates": [-89.7, 25.9]}},
        |  {"type": "Feature", "properties": {"mag": 2.5, "place": "gulf"},
        |   "geometry": {"type": "Point", "coordinates": [-88.0, 26.0]}}
        |]}""".stripMargin)
    assert(FeatureCollection.detectRoot(spark, f.toString).contains("features"))
    val df = FeatureCollection.read(spark, f.toString)
    assert(df.count() == 2)
    assert(df.columns.contains("properties_mag"))
    assert(df.columns.contains("geometry_coordinates"))
    val mags = df.select("properties_mag").as[Double].collect().sorted
    assert(mags.toSeq == Seq(1.5, 2.5))
    assert(FeatureCollection.publicationDate(spark, f.toString)
      .contains("2024-05-25T00:00:00Z"))
  }

  test("FeatureCollection: custom root = largest top-level list") {
    val f = Files.createTempFile("il", ".json")
    Files.writeString(f,
      """{"meta": [1], "records": [{"a": 1}, {"a": 2}, {"a": 3}]}""")
    assert(FeatureCollection.detectRoot(spark, f.toString).contains("records"))
    assert(FeatureCollection.read(spark, f.toString).count() == 3)
  }

  test("Rss: GeoRSS items with fields, attributes, and geometry") {
    val d = Files.createTempDirectory("rss")
    Files.writeString(d.resolve("feed.xml"),
      """<?xml version="1.0" encoding="UTF-8"?>
        |<rss version="2.0" xmlns:georss="http://www.georss.org/georss"
        |     xmlns:geo="http://www.w3.org/2003/01/geo/wgs84_pos#">
        | <channel>
        |  <title>Buoy feed</title>
        |  <item>
        |   <title>Obs A</title>
        |   <link rel="alternate">https://x/a</link>
        |   <georss:point>25.9 -89.7</georss:point>
        |  </item>
        |  <item>
        |   <title>Obs B</title>
        |   <geo:lat>26.0</geo:lat>
        |   <geo:long>-88.0</geo:long>
        |  </item>
        |  <item>
        |   <title>Track</title>
        |   <georss:line>1.0 2.0 3.0 4.0</georss:line>
        |  </item>
        | </channel>
        |</rss>""".stripMargin)
    val df = Rss.read(spark, d.toString)
    assert(df.count() == 3)
    val rows = df.orderBy(col("fields.title")).collect()
    val a = rows(0)
    assert(a.getAs[Map[String, String]]("fields")("title") == "Obs A")
    assert(a.getAs[Map[String, String]]("fields")("link_rel") == "alternate")
    assert(a.getString(2) == "point")
    assert(a.getSeq[Double](3) == Seq(25.9, -89.7))
    val b = rows(1)
    assert(b.getString(2) == "point" && b.getSeq[Double](3) == Seq(26.0, -88.0))
    val t = rows(2)
    assert(t.getString(2) == "line" && t.getSeq[Double](3).size == 4)
  }

  test("Rss geometry feeds the Geometry constructors end-to-end") {
    val d = Files.createTempDirectory("rss2")
    Files.writeString(d.resolve("f.xml"),
      """<rss xmlns:georss="http://www.georss.org/georss"><channel>
        |<item><title>p</title><georss:point>25.9 -89.7</georss:point></item>
        |</channel></rss>""".stripMargin)
    val df = Rss.read(spark, d.toString)
      .filter(col("geom_kind") === "point")
      .select(to_json(graft.functions.Geometry.point(col("ordinates"))).as("j"))
    assert(df.head().getString(0) == "[-89.7,25.9]")
  }

  test("GridOps: long form explode, lat reorder, z slice, hyperslab") {
    val grid = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        Seq(10.0, 20.0),                 // ascending lats → must flip
        Seq(100.0, 110.0),
        Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    ).toDF("time", "lats", "lons", "values")

    val flipped = GridOps.latReorder(grid)
    val lats = flipped.select("lats").head().getSeq[Double](0)
    assert(lats == Seq(20.0, 10.0))
    val vals = flipped.select("values").head().getSeq[Seq[Double]](0)
    assert(vals == Seq(Seq(3.0, 4.0), Seq(1.0, 2.0)))

    val long = GridOps.toLongForm(flipped)
    assert(long.count() == 4)
    val row = long.filter(col("latitude") === 20.0 && col("longitude") === 110.0)
      .select("value").head().getDouble(0)
    assert(row == 4.0)

    val sliced = GridOps.hyperslab(long,
      ("2024-01-01 00:00:00", "2024-01-02 00:00:00"), (15.0, 25.0), (0.0, 200.0))
    assert(sliced.count() == 2) // only lat=20 rows

    val zGrid = Seq((1, Seq(Seq(Seq(9.0)), Seq(Seq(8.0))))).toDF("t", "values")
    val surfaced = GridOps.zSurfaceSlice(zGrid)
    assert(surfaced.select("values").head().getSeq[Seq[Double]](0) == Seq(Seq(9.0)))
  }
}
