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
    StructField("ordinates", ArrayType(DoubleType))))

  private val geomLocalNames = Set("point", "line", "polygon", "box", "envelope")

  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.wholeTextFiles(path).flatMap {
      case (file, content) => parseDocument(file, content)
    }
    spark.createDataFrame(rdd, schema)
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

  private def itemToRow(file: String, item: Element): Row = {
    val fields = mutable.LinkedHashMap.empty[String, String]
    var geomKind: String = null
    var ordinates: Array[Double] = null
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

          if (prefix == "georss" && geomLocalNames.contains(local.toLowerCase)) {
            geomKind = local.toLowerCase match {
              case "envelope" => "box"
              case other => other
            }
            ordinates = text.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
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
      if (ordinates == null) null else ordinates.toSeq)
  }
}
