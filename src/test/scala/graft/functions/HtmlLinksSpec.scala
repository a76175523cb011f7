package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** href scanning + RFC 3986 §5.4 reference-resolution vectors. */
class HtmlLinksSpec extends AnyFunSuite {

  test("RFC 3986 5.4.1 normal resolution examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    for ((ref, want) <- cases)
      assert(HtmlOps.resolveUrl(base, ref) == want, s"ref <$ref>")
    // fragments drop (crawl-graph nodes are documents)
    assert(HtmlOps.resolveUrl(base, "#s") == "http://a/b/c/d;p?q")
    assert(HtmlOps.resolveUrl(base, "g#s") == "http://a/b/c/g")
    assert(HtmlOps.resolveUrl(base, "g?y#s") == "http://a/b/c/g?y")
  }

  test("RFC 3986 5.4.2 abnormal resolution examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "http:g" -> "http:g") // strict parsers keep absolute refs verbatim
    for ((ref, want) <- cases)
      assert(HtmlOps.resolveUrl(base, ref) == want, s"ref <$ref>")
  }

  test("href scanning: quote styles, attribute order, case, entities") {
    val html =
      """<html><body>
        |<a href="https://x.example/a?p=1&amp;q=2">double</a>
        |<A HREF='b.html'>single upper</A>
        |<a class=nav href=c.html>unquoted</a>
        |<a data-href="not-this.html" href = "d.html">spaced equals</a>
        |<a name="anchor-without-href">none</a>
        |<abbr href="not-an-anchor.html">abbr</abbr>
        |<!-- <a href="commented.html">x</a> -->
        |<script>var a = '<a href="scripted.html">';</script>
        |<style>a[href="styled.html"] { color: red }</style>
        |<a href="javascript:void(0)">js</a>
        |<a href="mailto:x@example.com">mail</a>
        |<a href="#frag-only">frag</a>
        |</body></html>""".stripMargin
    val got = HtmlOps.extractHrefs(html).toSeq
    assert(got == Seq("https://x.example/a?p=1&amp;q=2", "b.html", "c.html",
      "d.html", "javascript:void(0)", "mailto:x@example.com", "#frag-only"))
    val links = Option(HtmlOps.linksInternal(html,
      "https://base.example/dir/page.html")).get
    val arr = (0 until links.numElements()).map(links.getUTF8String(_).toString)
    assert(arr == Seq(
      "https://x.example/a?p=1&q=2", // entity-decoded
      "https://base.example/dir/b.html",
      "https://base.example/dir/c.html",
      "https://base.example/dir/d.html",
      "https://base.example/dir/page.html")) // fragment-only → the page
  }

  test("href token inside an earlier attribute's value is not an href") {
    // regression: a substring scan matched 'href' inside the title
    // value and returned 'evil', losing the real link
    val html = """<a title="use href=evil here" href="/real">x</a>"""
    assert(HtmlOps.extractHrefs(html).toSeq == Seq("/real"))
    // and a single-quoted decoy around an unquoted real value
    val h2 = """<a alt='see href="nope"' href=ok.html>y</a>"""
    assert(HtmlOps.extractHrefs(h2).toSeq == Seq("ok.html"))
    // bare boolean attributes before the href
    val h3 = """<a download hidden href="z.html">z</a>"""
    assert(HtmlOps.extractHrefs(h3).toSeq == Seq("z.html"))
    // a bare href with no value yields nothing, not a crash
    assert(HtmlOps.extractHrefs("""<a href>x</a>""").isEmpty)
  }

  test("'>' inside a quoted attribute value does not end the tag") {
    // legal HTML: '>' may appear in quoted attribute values — a
    // quote-unaware indexOf('>') truncated the tag and dropped the link
    val html = """<a href="/a?x>y">gt in href</a>"""
    assert(HtmlOps.extractHrefs(html).toSeq == Seq("/a?x>y"))
    // '>' in an EARLIER attribute's value, real href after it
    val h2 = """<a title="a > b" href="/real.html">t</a>"""
    assert(HtmlOps.extractHrefs(h2).toSeq == Seq("/real.html"))
    // single-quoted variant + following anchor still found
    val h3 = """<a alt='1>2' href='/one'>x</a><a href="/two">y</a>"""
    assert(HtmlOps.extractHrefs(h3).toSeq == Seq("/one", "/two"))
    // unterminated quote never hangs or throws
    assert(HtmlOps.extractHrefs("""<a href="/u unterminated""").toSeq
      .forall(_.startsWith("/u")))
  }

  test("nested entities decode exactly once, &amp; last") {
    // regression: decoding &amp; first turned &amp;lt; into a literal <
    val html = """<a href="/p?x=&amp;lt;b&amp;amp;c">x</a>"""
    val links = Option(HtmlOps.linksInternal(html,
      "https://h.example/")).get
    assert(links.getUTF8String(0).toString ==
      "https://h.example/p?x=&lt;b&amp;c")
  }

  test("malformed HTML never throws; unusable base yields no links") {
    for (h <- Seq("", "<", "<a", "<a href", "<a href=", "<a href=\"unclosed",
        "<script>never closed", "<!-- never closed", "<a href='x' <a href='y'>"))
      HtmlOps.extractHrefs(h) // must not throw
    val l = Option(HtmlOps.linksInternal("<a href='x.html'>x</a>", "not a url")).get
    assert(l.numElements() == 0)
  }

  // ---- canonicalizeUrl (RFC 3986 §6.2) ----

  test("canonical: case, default port, dot segments, empty path") {
    assert(HtmlOps.canonicalizeUrl("HTTP://Example.COM:80/a/./b/../c") ==
      "http://example.com/a/c")
    assert(HtmlOps.canonicalizeUrl("https://Host.ORG:443") ==
      "https://host.org/")
    assert(HtmlOps.canonicalizeUrl("https://h.io:8443/p") ==
      "https://h.io:8443/p") // non-default port kept
    assert(HtmlOps.canonicalizeUrl("ftp://F.example:21/d/../f.txt") ==
      "ftp://f.example/f.txt")
    // trailing slash is SIGNIFICANT — /a/ and /a are different resources
    assert(HtmlOps.canonicalizeUrl("http://h.com/a/") == "http://h.com/a/")
  }

  test("canonical: percent-escapes — unreserved decode, kept escapes uppercase") {
    assert(HtmlOps.canonicalizeUrl("http://h.com/%7Euser/%61bc") ==
      "http://h.com/~user/abc")
    // %2F is reserved — must stay encoded (decoding changes the path!)
    assert(HtmlOps.canonicalizeUrl("http://h.com/a%2fb?q=%2a") ==
      "http://h.com/a%2Fb?q=%2A")
    // invalid escape passes through untouched
    assert(HtmlOps.canonicalizeUrl("http://h.com/%zz/x") ==
      "http://h.com/%zz/x")
  }

  test("canonical: fragment dropped, query kept, userinfo kept, IPv6 port") {
    assert(HtmlOps.canonicalizeUrl("http://H.com/p?a=1&b=2#sec") ==
      "http://h.com/p?a=1&b=2")
    assert(HtmlOps.canonicalizeUrl("https://u:P@Host.io/x") ==
      "https://u:P@host.io/x") // userinfo is case-SENSITIVE
    assert(HtmlOps.canonicalizeUrl("http://[2001:DB8::1]:80/x") ==
      "http://[2001:db8::1]/x")
    assert(HtmlOps.canonicalizeUrl("http://[2001:db8::1]:8080/x") ==
      "http://[2001:db8::1]:8080/x")
  }

  test("canonical: non-URLs and authority-less forms are null, never a throw") {
    for (u <- Seq("", "not a url", "mailto:a@b.c", "/relative/only",
        "http:/one-slash", "http://", "scheme://:80/x"))
      assert(HtmlOps.canonicalizeUrl(u) == null, s"for '$u'")
  }

  test("canonical: idempotent — canonical(canonical(u)) == canonical(u)") {
    for (u <- Seq("HTTP://A.B:80/x/./y/../z%7E?q=%2a#f",
        "https://u@H.io:443/%41/", "ftp://X.example/a/b/../../c"))
      assert(HtmlOps.canonicalizeUrl(HtmlOps.canonicalizeUrl(u)) ==
        HtmlOps.canonicalizeUrl(u))
  }

  test("anchors: inner tags stripped, entities decoded, whitespace collapsed") {
    val html = """<a href="/a">Visit <b>the  hub</b>
      | now</a><a href='/b'> local &amp; co </a>""".stripMargin
    val got = HtmlOps.extractAnchors(html).toSeq
    assert(got == Seq("/a" -> "Visit the hub now", "/b" -> "local & co"))
  }

  test("anchors: implicit close by next <a>; unterminated anchor; empty text") {
    // second <a> closes the first (HTML parser behavior); the third has
    // no </a> and runs to end of input; the fourth is an image anchor
    val html = "<a href=/1>one<a href=/2>two</a>" +
      "<a href=/3>three<a href=/4><img src=x>"
    val got = HtmlOps.extractAnchors(html).toSeq
    assert(got == Seq("/1" -> "one", "/2" -> "two",
      "/3" -> "three", "/4" -> ""))
  }

  test("anchors: comments and script bodies inside the text are skipped") {
    val html = "<a href=/x>ke<!-- hidden <a href=/no>n --></a>..." +
      "<a href=/y>a<script>var s = '</a> fake';</script>b</a>"
    val got = HtmlOps.extractAnchors(html).toSeq
    assert(got.head == ("/x" -> "ke"))
    // script body is skipped wholesale, including the fake close tag
    assert(got(1) == ("/y" -> "ab"))
    assert(got.length == 2)
  }

  test("anchorsInternal resolves, skips non-navigational schemes, keeps text") {
    val arr = HtmlOps.anchorsInternal(
      "<a href=\"g?a=1&amp;b=2\">rel</a><a href=\"mailto:x@y\">m</a>" +
        "<a href=\"https://abs.example/p#f\">abs</a>",
      "http://a/b/c/d")
    assert(arr.numElements() == 2)
    val r0 = arr.getStruct(0, 2)
    assert(r0.getUTF8String(0).toString == "http://a/b/c/g?a=1&b=2")
    assert(r0.getUTF8String(1).toString == "rel")
    val r1 = arr.getStruct(1, 2)
    assert(r1.getUTF8String(0).toString == "https://abs.example/p")
    assert(r1.getUTF8String(1).toString == "abs")
  }
}
