package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.{Element, Node}

/** S10 — XML/RSS/GeoRSS scan (`Xml2GeoJSON.py:741-1137`).
  *
  * Parses RSS/Atom-style documents with the JDK DOM parser (no external
  * XML library), one document per task via `wholeTextFiles` — documents
  * are small; at scale many documents parse partition-parallel. Each
  * `item`/`entry` node becomes a row:
  *   - child element text → `prefix:local` keyed map entries, XML
  *     attributes promoted to fields (`Xml2GeoJSON.py:940-950`)
  *   - geometry detected from GeoRSS (`georss:point|line|polygon|box`),
  *     W3C geo (`geo:lat`+`geo:long`) — ordinates returned lat-first
  *     exactly as the source supplies them; [[graft.functions.Geometry]]
  *     constructors do the swap/winding.
  */
object Rss {

  val schema: StructType = StructType(Seq(
    StructField("source_file", StringType),
    StructField("fields", MapType(StringType, StringType)),
    StructField("geom_kind", StringType),     // point|line|polygon|box|null
    StructField("ordinates", ArrayType(DoubleType)),
    StructField("geom_dims", IntegerType),    // 2, or 3 when Z present
    // polygon ring starts (in ordinate positions): null for single-ring
    // geometry; [0, k, …] when gml:interior rings follow the exterior
    StructField("ring_offsets", ArrayType(IntegerType))))

  private val geomLocalNames =
    Set("point", "line", "linestring", "polygon", "box", "envelope")

  private def normalizeKind(local: String): String = local match {
    case "linestring" => "line"
    case "envelope" => "box"
    case other => other
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.wholeTextFiles(path).flatMap {
      case (file, content) => parseDocument(file, content)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** S10 GATE FIXTURE + FLOW — the RSS/GeoRSS scan as an
    * oracle-checkable batch: one GeoRSS feed (written idempotently per
    * sfDir) carrying one `<item>` per selected event (`event_id % 53 =
    * 0`), each with a title, a category, and a `georss:point` whose
    * ordinates derive arithmetically from the id (half/quarter
    * fractions — exact in a double on any engine). The gate runs the
    * REAL DOM parse ([[read]]) and projects the parsed fields back to
    * scalars, so DuckDB replays everything from `events.parquet`. */
  def rssGate(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Path}
    import org.apache.spark.sql.functions._
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // dir name carries the source fingerprint: regenerated testdata
    // rebuilds the fixture instead of serving a stale one
    val dir = Path.of(System.getProperty("java.io.tmpdir"),
      s"graft_rss_fixture_${safe}_${graft.Tables.contentTag(sfDir, "events")}")
    val feed = dir.resolve("feed.xml")
    if (!Files.exists(feed)) {
      Files.createDirectories(dir)
      val rows = graft.Tables.load(spark, sfDir, "events")
        .filter(col("event_id") % 53 === 0)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
        .collect()
      val items = rows.map { r =>
        val k = r.getLong(0)
        val tp = r.getString(1)
        s"""<item><title>evt_$k</title><category>$tp</category>""" +
          s"""<georss:point>${k % 90}.5 ${k % 180}.25</georss:point></item>"""
      }
      val tmp = dir.resolve("feed.xml.tmp")
      Files.writeString(tmp,
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<rss version="2.0" xmlns:georss="http://www.georss.org/georss"><channel>""" +
          items.mkString + "</channel></rss>")
      Files.move(tmp, feed,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    read(spark, feed.toString)
      .select(
        regexp_extract(element_at(col("fields"), "title"), "evt_(\\d+)", 1)
          .cast("long").as("event_id"),
        element_at(col("fields"), "category").as("event_type"),
        col("geom_kind").as("kind"),
        element_at(col("ordinates"), 1).as("lat"),
        element_at(col("ordinates"), 2).as("lon"))
  }

  private[sources] def parseDocument(file: String, content: String): Seq[Row] = {
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    val doc = factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
    val items = mutable.ArrayBuffer.empty[Element]
    collectItems(doc.getDocumentElement, items)
    items.toSeq.map(itemToRow(file, _))
  }

  private def collectItems(node: Element, out: mutable.ArrayBuffer[Element]): Unit = {
    val local = Option(node.getLocalName).getOrElse(node.getNodeName)
    if (local == "item" || local == "entry") out += node
    else {
      val children = node.getChildNodes
      var i = 0
      while (i < children.getLength) {
        children.item(i) match {
          case e: Element => collectItems(e, out)
          case _ =>
        }
        i += 1
      }
    }
  }

  /** Walk a `georss:where` subtree for GML geometry
    * (`Xml2GeoJSON.py:1069-1127`): `gml:Point/pos`,
    * `gml:LineString|Polygon/posList`, `gml:Envelope` corner pairs;
    * `srsDimension` sets the ordinate dimensionality. Rings accumulate
    * in document order — GML puts `gml:exterior` first, then any
    * `gml:interior` holes, matching the reference's ring-append order
    * (`Xml2GeoJSON.py:1107-1110`: interior rings ride along clockwise,
    * the exterior is reversed to CCW at geometry-build time — here by
    * [[graft.functions.Geometry.polygonRings]]). Returns
    * (kind, flat ordinates, dims, ring start offsets) or null; offsets
    * are null unless interior rings are present. */
  private def parseGmlWhere(where: Element): (String, Array[Double], Int, Array[Int]) = {
    var kind: String = null
    val rings = mutable.ArrayBuffer.empty[Array[Double]]
    var dims = 2
    var lower: String = null
    var upper: String = null

    def walk(node: Element): Unit = {
      val local = Option(node.getLocalName).getOrElse(node.getNodeName).toLowerCase
      val srs = node.getAttribute("srsDimension")
      if (srs != null && srs.nonEmpty && srs.forall(_.isDigit)) dims = srs.toInt
      local match {
        case l if geomLocalNames.contains(l) =>
          kind = normalizeKind(l)
          // coordinates allowed inline in the type declaration
          val inline = directText(node)
          if (inline.nonEmpty && node.getFirstChild != null &&
              node.getFirstChild.getNodeType == Node.TEXT_NODE)
            rings += parseOrds(inline)
        case "pos" | "poslist" | "coordinates" =>
          val o = parseOrds(node.getTextContent.trim)
          if (o.nonEmpty) rings += o
        case "lowercorner" | "lowerleft" =>
          lower = node.getTextContent.trim
        case "uppercorner" | "upperright" =>
          upper = node.getTextContent.trim
        case _ =>
      }
      val cs = node.getChildNodes
      var i = 0
      while (i < cs.getLength) {
        cs.item(i) match { case e: Element => walk(e); case _ => }
        i += 1
      }
    }
    walk(where)
    if (kind == "box" && lower != null && upper != null)
      rings += parseOrds(s"$lower $upper")
    if (kind == null || rings.isEmpty) null
    else {
      val offsets =
        if (rings.length <= 1) null
        else rings.scanLeft(0)(_ + _.length).init.toArray
      (kind, rings.flatten.toArray, dims, offsets)
    }
  }

  private def directText(e: Element): String = {
    val cs = e.getChildNodes
    val sb = new StringBuilder
    var i = 0
    while (i < cs.getLength) {
      val n = cs.item(i)
      if (n.getNodeType == Node.TEXT_NODE) sb.append(n.getNodeValue)
      i += 1
    }
    sb.toString.trim
  }

  private def parseOrds(text: String): Array[Double] =
    text.split("\\s+").filter(_.nonEmpty).map(_.toDouble)

  private def itemToRow(file: String, item: Element): Row = {
    val fields = mutable.LinkedHashMap.empty[String, String]
    var geomKind: String = null
    var ordinates: Array[Double] = null
    var geomDims = 2
    var ringOffsets: Array[Int] = null
    var geoLat: Option[Double] = None
    var geoLon: Option[Double] = None

    val children = item.getChildNodes
    var i = 0
    while (i < children.getLength) {
      children.item(i) match {
        case e: Element =>
          val prefix = Option(e.getPrefix).getOrElse("")
          val local = Option(e.getLocalName).getOrElse(e.getNodeName)
          val key = if (prefix.isEmpty) local else s"$prefix:$local"
          val text = e.getTextContent.trim

          // geometry elements match by NAME for any prefix (the
          // reference's `prefix in ["georss","cap"] or name in
          // geomFunctions`, `Xml2GeoJSON.py:1034`); CAP/ATOM values use
          // comma-separated coordinates with spaces between points —
          // dimensionality comes from the first coordinate's commas
          // (`Xml2GeoJSON.py:1052-1055`)
          if (geomLocalNames.contains(local.toLowerCase) &&
              prefix != "geo") {
            geomKind = normalizeKind(local.toLowerCase)
            if (text.contains(",")) {
              geomDims = text.split(" ", 2)(0).count(_ == ',') + 1
              ordinates = parseOrds(text.replace(",", " "))
            } else ordinates = parseOrds(text)
          } else if (prefix == "georss" && local.toLowerCase == "where") {
            val gml = parseGmlWhere(e)
            if (gml != null) {
              geomKind = gml._1; ordinates = gml._2; geomDims = gml._3
              ringOffsets = gml._4
            }
          } else if (prefix == "geo" && local == "lat") {
            geoLat = text.toDoubleOption
          } else if (prefix == "geo" && (local == "long" || local == "lon")) {
            geoLon = text.toDoubleOption
          } else {
            if (text.nonEmpty) fields(key) = text
            // promote XML attributes to fields (Xml2GeoJSON.py:940-950)
            val attrs = e.getAttributes
            if (attrs != null) {
              var a = 0
              while (a < attrs.getLength) {
                val at = attrs.item(a)
                val aPrefix = Option(at.getPrefix).getOrElse("")
                if (aPrefix != "xmlns" && at.getNodeName != "xmlns") {
                  val aKey = key + "_" +
                    (if (aPrefix.isEmpty) at.getLocalName
                     else s"$aPrefix:${at.getLocalName}")
                  fields(aKey) = at.getNodeValue
                }
                a += 1
              }
            }
          }
        case _ =>
      }
      i += 1
    }

    // W3C geo pair → point (lat-first ordinate order, like GeoRSS)
    if (geomKind == null && geoLat.isDefined && geoLon.isDefined) {
      geomKind = "point"
      ordinates = Array(geoLat.get, geoLon.get)
    }
    Row(file, fields.toMap, geomKind,
      if (ordinates == null) null else ordinates.toSeq, geomDims,
      if (ringOffsets == null) null else ringOffsets.toSeq)
  }
}
