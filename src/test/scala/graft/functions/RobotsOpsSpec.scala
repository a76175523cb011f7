package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

/** RFC 9309 robots evaluation: wildcard/anchor matching, group
  * selection, longest-match + Allow tie-break, permissive defaults. */
class RobotsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("patternMatches: prefixes, wildcards, end anchors, backtracking") {
    assert(RobotsOps.patternMatches("/fish", "/fish/salmon"))
    assert(RobotsOps.patternMatches("/fish", "/fishheads"))
    assert(!RobotsOps.patternMatches("/fish", "/Fish")) // case-sensitive paths
    assert(RobotsOps.patternMatches("/*.php", "/index.php"))
    assert(RobotsOps.patternMatches("/*.php", "/folder/any.php.html"))
    assert(RobotsOps.patternMatches("/*.php$", "/filename.php"))
    assert(!RobotsOps.patternMatches("/*.php$", "/filename.php?x=1"))
    assert(RobotsOps.patternMatches("/fish*.php", "/fishheads/catfish.php?p=2"))
    assert(RobotsOps.patternMatches("/a*b*c", "/aXbYbZc-tail"))
    assert(!RobotsOps.patternMatches("/a*b*c$", "/aXbYbZc-tail"))
    assert(RobotsOps.patternMatches("/p$", "/p"))
    assert(!RobotsOps.patternMatches("/p$", "/page"))
  }

  test("decision: longest match wins, Allow breaks ties, no match allows") {
    val txt =
      """User-agent: *
        |Disallow: /
        |Allow: /public
        |""".stripMargin
    assert(RobotsOps.allowed(txt, "anybot", "/public/page"))
    assert(!RobotsOps.allowed(txt, "anybot", "/private"))
    val tie =
      """User-agent: *
        |Disallow: /page
        |Allow: /page
        |""".stripMargin
    assert(RobotsOps.allowed(tie, "anybot", "/page"))
    assert(RobotsOps.allowed("", "anybot", "/anything"))
    assert(RobotsOps.allowed("# only comments\n", "anybot", "/x"))
    // empty Disallow means allow-all
    assert(RobotsOps.allowed("User-agent: *\nDisallow:\n", "b", "/x"))
  }

  test("group selection: specificity over *, shared UA lines, case-insensitive") {
    val txt =
      """User-agent: googlebot-news
        |Disallow: /news-secret
        |
        |User-agent: googlebot
        |User-agent: otherbot
        |Disallow: /general
        |
        |User-agent: *
        |Disallow: /everything
        |""".stripMargin
    // most specific UA token substring wins
    assert(!RobotsOps.allowed(txt, "Googlebot-News/2.1", "/news-secret"))
    assert(RobotsOps.allowed(txt, "Googlebot-News/2.1", "/general"))
    assert(RobotsOps.allowed(txt, "Googlebot-News/2.1", "/everything"))
    assert(!RobotsOps.allowed(txt, "Googlebot/2.1", "/general"))
    assert(RobotsOps.allowed(txt, "Googlebot/2.1", "/everything"))
    assert(!RobotsOps.allowed(txt, "OtherBot", "/general"))
    assert(!RobotsOps.allowed(txt, "randombot", "/everything"))
    assert(RobotsOps.allowed(txt, "randombot", "/general"))
  }

  test("RFC 9309 2.2.1: rules from all groups matching the same UA combine") {
    // two separate `User-agent: *` groups — common in real robots.txt;
    // both groups' rules must apply, not just the first
    val txt =
      """User-agent: *
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /tmp
        |Allow: /private/ok
        |""".stripMargin
    assert(!RobotsOps.allowed(txt, "anybot", "/private/x"))
    assert(!RobotsOps.allowed(txt, "anybot", "/tmp/y"))      // second group
    assert(RobotsOps.allowed(txt, "anybot", "/private/ok"))  // second group
    assert(RobotsOps.allowed(txt, "anybot", "/other"))
    // same-named specific groups combine too, and still beat *
    val named =
      """User-agent: mybot
        |Disallow: /a
        |
        |User-agent: *
        |Disallow: /everything
        |
        |User-agent: mybot
        |Disallow: /b
        |""".stripMargin
    assert(!RobotsOps.allowed(named, "mybot/1.0", "/a"))
    assert(!RobotsOps.allowed(named, "mybot/1.0", "/b"))
    assert(RobotsOps.allowed(named, "mybot/1.0", "/everything"))
  }

  test("expression: null-safe, codegen path over a DataFrame") {
    val txt = "User-agent: *\nDisallow: /no\n"
    val df = Seq(
      (1L, txt, "/no/way"), (2L, txt, "/yes"), (3L, null, "/no/way")
    ).toDF("id", "robots", "path")
    val out = df.select(col("id"),
      RobotsOps.robots_allowed(col("robots"), col("path"), "bot").as("a"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else Boolean.box(r.getBoolean(1)))).toMap
    assert(out(1L) == java.lang.Boolean.FALSE)
    assert(out(2L) == java.lang.Boolean.TRUE)
    assert(out(3L) == null)
  }

  test("sitemapUrls: file-wide, group-independent, comment-stripped, in order") {
    val txt =
      """# top comment
        |User-agent: googlebot
        |Disallow: /a
        |Sitemap: https://x.example/a.xml
        |
        |User-agent: *
        |Allow: /
        |sitemap: https://x.example/b.xml   # case-insensitive directive
        |SITEMAP: https://x.example/c.xml
        |Sitemap:
        |Crawl-delay: 5
        |""".stripMargin
    assert(RobotsOps.sitemapUrls(txt).toSeq == Seq(
      "https://x.example/a.xml", "https://x.example/b.xml",
      "https://x.example/c.xml"))
    assert(RobotsOps.sitemapUrls("").isEmpty)
    assert(RobotsOps.sitemapUrls(null).isEmpty)
    assert(RobotsOps.sitemapUrls("User-agent: *\nDisallow:").isEmpty)
  }

  test("crawl-delay: winning group's value in ms, specific beats *, fractions round") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 0.5
        |Disallow: /y
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    assert(RobotsOps.crawlDelayMs(txt, "graftbot") == 500L)
    assert(RobotsOps.crawlDelayMs(txt, "otherbot") == 10000L)
    // absent in the winner → null even when another group has one
    val only = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 3\n"
    assert(RobotsOps.crawlDelayMs(only, "graftbot") == null)
    // no matching group at all → null; garbage values → null
    assert(RobotsOps.crawlDelayMs("User-agent: other\nCrawl-delay: 9", "graftbot") == null)
    assert(RobotsOps.crawlDelayMs("User-agent: *\nCrawl-delay: soon", "graftbot") == null)
    assert(RobotsOps.crawlDelayMs("User-agent: *\nCrawl-delay: -2", "graftbot") == null)
    // combined same-specificity groups take the most conservative delay
    val two = "User-agent: *\nCrawl-delay: 2\nDisallow: /a\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert(RobotsOps.crawlDelayMs(two, "graftbot") == 7000L)
    // first value within one group wins; delay doesn't disturb rules
    val mixed = "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 4\nDisallow: /private\n"
    assert(RobotsOps.crawlDelayMs(mixed, "bot") == 1000L)
    assert(!RobotsOps.allowed(mixed, "bot", "/private/x"))
  }
}
