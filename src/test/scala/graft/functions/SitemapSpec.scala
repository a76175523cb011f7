package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {

  private def parse(xml: String) = Option(Sitemap.parseInternal(xml))
    .map(a => (0 until a.numElements()).map(a.getStruct(_, 5)))

  test("urlset: all four fields, namespace-qualified") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://example.com/</loc>
        |    <lastmod>2024-06-01</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://example.com/about</loc></url>
        |  <url><lastmod>2024-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val rs = parse(xml).get
    assert(rs.length == 2) // the loc-less entry is skipped
    assert(rs(0).getUTF8String(0).toString == "url")
    assert(rs(0).getUTF8String(1).toString == "https://example.com/")
    assert(rs(0).getUTF8String(2).toString == "2024-06-01")
    assert(rs(0).getUTF8String(3).toString == "daily")
    assert(rs(0).getDouble(4) == 0.8)
    assert(rs(1).getUTF8String(1).toString == "https://example.com/about")
    assert(rs(1).isNullAt(2) && rs(1).isNullAt(3) && rs(1).isNullAt(4))
  }

  test("sitemapindex: kind flips, recursion seeds surface") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://example.com/a.xml</loc>
        |    <lastmod>2024-02-02T10:00:00Z</lastmod></sitemap>
        |  <sitemap><loc>https://example.com/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val rs = parse(xml).get
    assert(rs.map(_.getUTF8String(0).toString).distinct == Seq("sitemap"))
    assert(rs.map(_.getUTF8String(1).toString) ==
      Seq("https://example.com/a.xml", "https://example.com/b.xml"))
  }

  test("priority out of range or non-numeric ignores per protocol") {
    val xml =
      """<urlset><url><loc>u1</loc><priority>1.5</priority></url>
        |<url><loc>u2</loc><priority>abc</priority></url>
        |<url><loc>u3</loc><priority>0.0</priority></url></urlset>""".stripMargin
    val rs = parse(xml).get
    assert(rs(0).isNullAt(4) && rs(1).isNullAt(4))
    assert(rs(2).getDouble(4) == 0.0)
  }

  test("malformed, hostile, or foreign XML is null/empty, never a throw") {
    assert(parse("not xml at all").isEmpty)
    assert(parse("<urlset><url><loc>u").isEmpty)
    assert(parse("<rss><channel/></rss>").isEmpty) // wrong root
    // DOCTYPE (XXE vector) refused outright
    assert(parse("<!DOCTYPE urlset [<!ENTITY x SYSTEM 'file:///etc/passwd'>]>" +
      "<urlset><url><loc>&x;</loc></url></urlset>").isEmpty)
    // empty urlset parses to zero entries
    assert(parse("<urlset/>").get.isEmpty)
  }
}
