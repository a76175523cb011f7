package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemaps.org XML parsing — the third leg of crawl compliance next
  * to robots.txt ([[RobotsOps]]) and WARC ([[WarcCodec]]): a crawl
  * frontier seeds from `<urlset>` entries and recurses through
  * `<sitemapindex>` files. One expression handles both document kinds
  * (`kind` = "url" / "sitemap"), so an index and its leaves explode
  * through the same projection.
  *
  * Fields per the protocol: `loc` (required — entries without it are
  * skipped), `lastmod` (kept as the raw W3C datetime string),
  * `changefreq`, and `priority` (0.0–1.0 double; out-of-range or
  * non-numeric → null, the protocol's "ignore" semantics). Malformed
  * XML → null array, never a task crash. */
case class SitemapEntries(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(Sitemap.entrySchema)
  override def prettyName: String = "sitemap_entries"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Sitemap.parseInternal(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Sitemap.parseInternal($c.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): SitemapEntries =
    copy(child = newChild)
}

object Sitemap {
  val entrySchema: StructType = StructType(Seq(
    StructField("kind", StringType),        // "url" | "sitemap"
    StructField("loc", StringType),
    StructField("lastmod", StringType),
    StructField("changefreq", StringType),
    StructField("priority", DoubleType)))

  /** One configured builder per executor thread — factory discovery is
    * a ServiceLoader classpath walk, far too heavy for a per-row
    * projection; `reset()` restores a clean builder between rows. */
  private val builders =
    new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
      override def initialValue(): javax.xml.parsers.DocumentBuilder = {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        // no external entities: a crawled sitemap is hostile input
        f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
        f.newDocumentBuilder()
      }
    }

  def parseInternal(xml: String): GenericArrayData = {
    if (xml == null) return null
    val doc = try {
      val b = builders.get()
      b.reset()
      b.parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
    } catch { case _: Exception => return null }
    val root = doc.getDocumentElement
    if (root == null) return null
    val kind = root.getLocalName match {
      case "urlset" => "url"
      case "sitemapindex" => "sitemap"
      case _ => return null
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val children = root.getChildNodes
    var i = 0
    while (i < children.getLength) {
      val node = children.item(i)
      if (node.getNodeType == org.w3c.dom.Node.ELEMENT_NODE &&
        (node.getLocalName == "url" || node.getLocalName == "sitemap")) {
        var loc: String = null; var lastmod: String = null
        var changefreq: String = null; var priority: Any = null
        val fields = node.getChildNodes
        var j = 0
        while (j < fields.getLength) {
          val f = fields.item(j)
          if (f.getNodeType == org.w3c.dom.Node.ELEMENT_NODE) {
            val text = Option(f.getTextContent).map(_.trim).orNull
            f.getLocalName match {
              case "loc" => loc = text
              case "lastmod" => lastmod = text
              case "changefreq" => changefreq = text
              case "priority" =>
                priority = scala.util.Try(text.toDouble).toOption
                  .filter(p => p >= 0.0 && p <= 1.0)
                  .map(Double.box).orNull
              case _ =>
            }
          }
          j += 1
        }
        if (loc != null && loc.nonEmpty)
          out += InternalRow(UTF8String.fromString(kind),
            UTF8String.fromString(loc),
            if (lastmod == null) null else UTF8String.fromString(lastmod),
            if (changefreq == null) null else UTF8String.fromString(changefreq),
            priority)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def sitemap_entries(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(SitemapEntries(
      org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
