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

  test("GML in georss:where: posList polygon and pos point parse to geometry") {
    val d = Files.createTempDirectory("rss_gml")
    Files.writeString(d.resolve("g.xml"),
      """<feed xmlns:georss="http://www.georss.org/georss"
        |      xmlns:gml="http://www.opengis.net/gml">
        |<entry><title>poly</title>
        |  <georss:where><gml:Polygon><gml:exterior><gml:LinearRing>
        |    <gml:posList>30 -90 31 -90 31 -89 30 -90</gml:posList>
        |  </gml:LinearRing></gml:exterior></gml:Polygon></georss:where>
        |</entry>
        |<entry><title>pt</title>
        |  <georss:where><gml:Point><gml:pos>25.5 -88.25</gml:pos></gml:Point></georss:where>
        |</entry>
        |<entry><title>pt3d</title>
        |  <georss:where><gml:Point srsDimension="3">
        |    <gml:pos>25.5 -88.25 12.0</gml:pos></gml:Point></georss:where>
        |</entry>
        |<entry><title>env</title>
        |  <georss:where><gml:Envelope>
        |    <gml:lowerCorner>29 -91</gml:lowerCorner>
        |    <gml:upperCorner>31 -89</gml:upperCorner>
        |  </gml:Envelope></georss:where>
        |</entry>
        |</feed>""".stripMargin)
    val rows = Rss.read(spark, d.toString)
      .orderBy("fields.title").collect()
    val env = rows(0) // "env"
    assert(env.getString(2) == "box" && env.getSeq[Double](3) == Seq(29.0, -91.0, 31.0, -89.0))
    val poly = rows(1) // "poly"
    assert(poly.getString(2) == "polygon")
    assert(poly.getSeq[Double](3) == Seq(30.0, -90.0, 31.0, -90.0, 31.0, -89.0, 30.0, -90.0))
    assert(poly.getInt(4) == 2)
    val pt = rows(2) // "pt"
    assert(pt.getString(2) == "point" && pt.getSeq[Double](3) == Seq(25.5, -88.25))
    val pt3d = rows(3) // "pt3d"
    assert(pt3d.getInt(4) == 3 && pt3d.getSeq[Double](3).size == 3)

    // through the polygon constructor: lat-first flips to lon-first,
    // ring reversed to counter-clockwise exterior
    val gj = Rss.read(spark, d.toString)
      .filter(col("geom_kind") === "polygon")
      .select(to_json(graft.functions.Geometry.polygon(col("ordinates"))).as("j"))
      .head().getString(0)
    assert(gj == "[[[-90.0,30.0],[-89.0,31.0],[-90.0,31.0],[-90.0,30.0]]]")
  }

  test("GML interior rings: donut polygon keeps holes, exterior CCW / interior CW") {
    val d = Files.createTempDirectory("rss_gml_donut")
    Files.writeString(d.resolve("donut.xml"),
      """<feed xmlns:georss="http://www.georss.org/georss"
        |      xmlns:gml="http://www.opengis.net/gml">
        |<entry><title>donut</title>
        |  <georss:where><gml:Polygon>
        |    <gml:exterior><gml:LinearRing>
        |      <gml:posList>0 0 0 4 4 4 4 0 0 0</gml:posList>
        |    </gml:LinearRing></gml:exterior>
        |    <gml:interior><gml:LinearRing>
        |      <gml:posList>1 1 1 3 3 3 3 1 1 1</gml:posList>
        |    </gml:LinearRing></gml:interior>
        |  </gml:Polygon></georss:where>
        |</entry>
        |</feed>""".stripMargin)
    val row = Rss.read(spark, d.toString).head()
    assert(row.getString(2) == "polygon")
    assert(row.getSeq[Double](3).size == 20) // both rings, flat
    assert(row.getSeq[Int](5) == Seq(0, 10)) // exterior at 0, hole at 10
    // through the ring-aware constructor: exterior reversed to CCW,
    // interior kept in supplied (clockwise) order — the reference's
    // output shape (Xml2GeoJSON.py:903-908, :1107-1110)
    val gj = Rss.read(spark, d.toString)
      .select(to_json(graft.functions.Geometry.polygonRings(
        col("ordinates"), col("ring_offsets"))).as("j"))
      .head().getString(0)
    assert(gj ==
      "[[[0.0,0.0],[0.0,4.0],[4.0,4.0],[4.0,0.0],[0.0,0.0]]," +
        "[[1.0,1.0],[3.0,1.0],[3.0,3.0],[1.0,3.0],[1.0,1.0]]]")
    // single-ring rows flow through polygonRings unchanged (null offsets)
    val single = Files.createTempDirectory("rss_gml_single")
    Files.writeString(single.resolve("s.xml"),
      """<feed xmlns:georss="http://www.georss.org/georss"
        |      xmlns:gml="http://www.opengis.net/gml">
        |<entry><georss:where><gml:Polygon><gml:exterior><gml:LinearRing>
        |  <gml:posList>30 -90 31 -90 31 -89 30 -90</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon></georss:where></entry>
        |</feed>""".stripMargin)
    val sRow = Rss.read(spark, single.toString).head()
    assert(sRow.isNullAt(5))
    val sj = Rss.read(spark, single.toString)
      .select(to_json(graft.functions.Geometry.polygonRings(
        col("ordinates"), col("ring_offsets"))).as("j"))
      .head().getString(0)
    assert(sj == "[[[-90.0,30.0],[-89.0,31.0],[-90.0,31.0],[-90.0,30.0]]]")
  }

  test("CAP alert polygon: comma-separated coordinates with dims detection") {
    val d = Files.createTempDirectory("rss_cap")
    Files.writeString(d.resolve("c.xml"),
      """<alert xmlns:cap="urn:oasis:names:tc:emergency:cap:1.2">
        |<item><cap:event>Storm</cap:event>
        |  <cap:polygon>30,-90 31,-90 31,-89 30,-90</cap:polygon>
        |</item>
        |<item><cap:event>Deep</cap:event>
        |  <cap:polygon>30,-90,5 31,-90,5 31,-89,5 30,-90,5</cap:polygon>
        |</item>
        |</alert>""".stripMargin)
    val rows = Rss.read(spark, d.toString).orderBy("fields.cap:event").collect()
    val deep = rows(0)
    assert(deep.getString(2) == "polygon" && deep.getInt(4) == 3)
    assert(deep.getSeq[Double](3).size == 12)
    val storm = rows(1)
    assert(storm.getString(2) == "polygon" && storm.getInt(4) == 2)
    assert(storm.getSeq[Double](3) == Seq(30.0, -90.0, 31.0, -90.0, 31.0, -89.0, 30.0, -90.0))
    // event text survives as a field; polygon did not leak into fields
    assert(storm.getMap[String, String](1)("cap:event") == "Storm")
    assert(!storm.getMap[String, String](1).contains("cap:polygon"))
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
