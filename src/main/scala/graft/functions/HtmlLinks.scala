package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hyperlink harvesting — the step between WARC payloads and the link
  * graph ([[graft.operators.LinkGraph.pageRank]]): scan anchor tags
  * out of raw HTML and resolve each href against the page URL per
  * RFC 3986 §5 (merge + remove_dot_segments), so a crawl pipeline goes
  * bytes → absolute out-links in one projection.
  *
  * Contract: `<a ... href=...>` only (double/single/unquoted values,
  * any attribute order, case-insensitive), entity-decoded (`&amp;` and
  * friends — URLs in HTML are entity-encoded), fragments dropped,
  * non-navigational schemes (javascript/mailto/data/tel) skipped,
  * comments and script/style bodies ignored. Malformed HTML never
  * throws — the scanner just keeps walking. */
case class HtmlLinks(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "html_links"
  override def nullable: Boolean = true
  override def nullSafeEval(html: Any, base: Any): Any =
    HtmlOps.linksInternal(html.asInstanceOf[UTF8String].toString,
      base.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) => s"""
      ${ev.value} = graft.functions.HtmlOps.linksInternal(
        $h.toString(), $b.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlLinks =
    copy(left = newLeft, right = newRight)
}

/** Anchor harvesting WITH link text — the raw material of an
  * anchor-text corpus (the aggregated "what do other pages call this
  * URL" signal used for retrieval training data and crawl-time page
  * descriptions; see e.g. the MS MARCO / ORCAS line of public work).
  * Same scanner contract as [[HtmlLinks]] (quote-aware tags, comments
  * and script/style bodies skipped, entity-decoded, non-navigational
  * schemes dropped, RFC 3986 resolution against the page URL), plus
  * the anchor's INNER TEXT: everything up to the matching `</a>` (or
  * the next `<a`, which closes an unterminated anchor the way HTML
  * parsers do), inner tags stripped, entities decoded, whitespace
  * collapsed. Returns `array<struct<href string, text string>>`. */
case class HtmlAnchors(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false))))
  override def prettyName: String = "html_anchors"
  override def nullable: Boolean = true
  override def nullSafeEval(html: Any, base: Any): Any =
    HtmlOps.anchorsInternal(html.asInstanceOf[UTF8String].toString,
      base.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) => s"""
      ${ev.value} = graft.functions.HtmlOps.anchorsInternal(
        $h.toString(), $b.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlAnchors =
    copy(left = newLeft, right = newRight)
}

/** RFC 3986 §6.2 syntax-based URL normalization — the crawl-dedup
  * canonical form: lowercase scheme + host, default port dropped,
  * dot segments removed, unreserved percent-escapes decoded and the
  * rest uppercased, empty path → "/", fragment dropped. Two URLs that
  * normalize equal identify the same resource by syntax alone (§6.2.2
  * — no DNS, no fetch), which is what a URL-frontier dedup needs.
  * Null for anything without a `scheme://` authority form. */
case class CanonicalUrl(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"
  override def nullable: Boolean = true
  override def nullSafeEval(url: Any): Any = {
    val r = HtmlOps.canonicalizeUrl(url.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("canon")
    nullSafeCodeGen(ctx, ev, u => s"""
      String $r = graft.functions.HtmlOps.canonicalizeUrl($u.toString());
      ${ev.value} = $r == null ? null :
        org.apache.spark.unsafe.types.UTF8String.fromString($r);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object HtmlOps {

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:".r
  private val SkipSchemes = Set("javascript", "mailto", "data", "tel", "about")

  private val DefaultPorts =
    Map("http" -> "80", "https" -> "443", "ftp" -> "21",
      "ws" -> "80", "wss" -> "443")

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** §6.2.2.1–2: decode unreserved percent-escapes, uppercase the hex
    * of every escape that stays. Invalid escapes pass through. */
  def normalizePct(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** See [[CanonicalUrl]]. */
  def canonicalizeUrl(url0: String): String = {
    val (noFrag, _) = splitFragment(url0.trim)
    val sm = SchemeRe.findFirstIn(noFrag).orNull
    if (sm == null || !noFrag.regionMatches(sm.length, "//", 0, 2)) return null
    val scheme = sm.dropRight(1).toLowerCase(java.util.Locale.ROOT)
    val authStart = sm.length + 2
    val pathStart = {
      val i = noFrag.indexWhere(c => c == '/' || c == '?', authStart)
      if (i < 0) noFrag.length else i
    }
    val authority = noFrag.substring(authStart, pathStart)
    if (authority.isEmpty) return null
    val atIdx = authority.lastIndexOf('@')
    val userinfo = if (atIdx >= 0) authority.substring(0, atIdx + 1) else ""
    val hostPort = authority.substring(atIdx + 1)
    // IPv6 literals keep their brackets; the port colon is after ']'
    val colon = {
      val from = if (hostPort.startsWith("[")) hostPort.indexOf(']') else 0
      if (from < 0) -1 else hostPort.indexOf(':', from)
    }
    val host = (if (colon < 0) hostPort else hostPort.substring(0, colon))
      .toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return null
    val port = if (colon < 0) null else hostPort.substring(colon + 1)
    val keepPort = port != null && port.nonEmpty &&
      !DefaultPorts.get(scheme).contains(port)
    val (path0, query) = splitQuery(noFrag.substring(pathStart))
    val path1 = removeDotSegments(normalizePct(path0))
    val path = if (path1.isEmpty) "/" else path1
    s"$scheme://$userinfo$host${if (keepPort) ":" + port else ""}$path" +
      (if (query == null) "" else "?" + normalizePct(query))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val seg = if (next < 0) in else in.substring(0, next)
        out.append(seg)
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.toString
  }

  /** RFC 3986 §5.3 reference resolution (fragments dropped — a crawl
    * graph's node is the document, not the anchor within it). Returns
    * null for an unusable base. */
  def resolveUrl(base: String, ref0: String): String = {
    // split the base: scheme://authority path ?query
    val sm = SchemeRe.findFirstIn(base).orNull
    if (sm == null || !base.regionMatches(sm.length, "//", 0, 2)) return null
    val scheme = sm.dropRight(1)
    val authStart = sm.length + 2
    val pathStart = {
      val i = base.indexWhere(c => c == '/' || c == '?' || c == '#', authStart)
      if (i < 0) base.length else i
    }
    val authority = base.substring(authStart, pathStart)
    val afterAuth = base.substring(pathStart)
    val (basePathQ, _) = splitFragment(afterAuth)
    val (basePath, baseQuery) = splitQuery(basePathQ)

    val (refNoFrag, _) = splitFragment(ref0)
    val ref = refNoFrag
    val refScheme = SchemeRe.findFirstIn(ref).orNull
    if (refScheme != null)
      return ref // absolute; RFC keeps it verbatim (minus fragment)
    if (ref.startsWith("//")) return s"$scheme:$ref"
    if (ref.isEmpty)
      return s"$scheme://$authority$basePath" +
        (if (baseQuery == null) "" else s"?$baseQuery")
    if (ref.startsWith("?"))
      return s"$scheme://$authority$basePath$ref"
    val (refPath, refQuery) = splitQuery(ref)
    val merged =
      if (refPath.startsWith("/")) refPath
      else {
        // merge (§5.3.3): base path up to its last slash, else "/"
        val cut = basePath.lastIndexOf('/')
        (if (cut < 0) "/" else basePath.substring(0, cut + 1)) + refPath
      }
    s"$scheme://$authority${removeDotSegments(merged)}" +
      (if (refQuery == null) "" else s"?$refQuery")
  }

  private def splitFragment(s: String): (String, String) = {
    val i = s.indexOf('#')
    if (i < 0) (s, null) else (s.substring(0, i), s.substring(i + 1))
  }

  private def splitQuery(s: String): (String, String) = {
    val i = s.indexOf('?')
    if (i < 0) (s, null) else (s.substring(0, i), s.substring(i + 1))
  }

  /** The five entities HTML-encoded URLs actually carry. `&amp;` must
    * decode LAST: decoding it first turns `&amp;lt;` into `&lt;`,
    * which the next pass double-decodes into a character the page
    * never contained. */
  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  def linksInternal(html: String, base: String): GenericArrayData = {
    val hrefs = extractHrefs(html)
    if (hrefs == null) return null
    val out = new scala.collection.mutable.ArrayBuffer[Any](hrefs.length)
    var i = 0
    while (i < hrefs.length) {
      val raw = decodeEntities(hrefs(i)).trim
      val sch = SchemeRe.findFirstIn(raw).map(_.dropRight(1).toLowerCase).orNull
      if (raw.nonEmpty && (sch == null || !SkipSchemes.contains(sch))) {
        val resolved = resolveUrl(base, raw)
        if (resolved != null) out += UTF8String.fromString(resolved)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def anchorsInternal(html: String, base: String): GenericArrayData = {
    val pairs = extractAnchors(html)
    if (pairs == null) return null
    val out = new scala.collection.mutable.ArrayBuffer[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      val raw = decodeEntities(pairs(i)._1).trim
      val sch = SchemeRe.findFirstIn(raw).map(_.dropRight(1).toLowerCase).orNull
      if (raw.nonEmpty && (sch == null || !SkipSchemes.contains(sch))) {
        val resolved = resolveUrl(base, raw)
        if (resolved != null)
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](UTF8String.fromString(resolved),
              UTF8String.fromString(pairs(i)._2)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** (raw href, normalized inner text) of anchor tags, in document
    * order — the [[extractHrefs]] walker plus text capture. */
  def extractAnchors(html: String): Array[(String, String)] = {
    if (html == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) return out.toArray
      if (html.regionMatches(lt, "<!--", 0, 4)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (regionMatchesIgnoreCase(html, lt, "<script")) {
        i = skipElement(html, lt, "script")
      } else if (regionMatchesIgnoreCase(html, lt, "<style")) {
        i = skipElement(html, lt, "style")
      } else if ((html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
        (lt + 2 >= n || !Character.isLetterOrDigit(html.charAt(lt + 2)))) {
        val gt = tagEnd(html, lt)
        val end = if (gt < 0) n else gt
        val href = findHref(html, lt + 2, end)
        if (href != null) {
          val (text, next) = anchorInnerText(html, end + 1)
          out += ((href, text))
          i = next
        } else i = end + 1
      } else i = lt + 1
    }
    out.toArray
  }

  /** Collect the anchor's inner text from `from` to its `</a>` (or an
    * implicitly-closing `<a`, which is NOT consumed so the outer
    * walker sees it): inner tags stripped, comments and script/style
    * bodies skipped, entities decoded, whitespace collapsed. Returns
    * (text, resume index). */
  private def anchorInnerText(html: String, from: Int): (String, Int) = {
    val n = html.length
    val sb = new java.lang.StringBuilder
    var i = from
    var resume = n
    var done = false
    while (!done && i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { sb.append(html, i, n); resume = n; done = true }
      else {
        sb.append(html, i, lt)
        if (html.regionMatches(lt, "<!--", 0, 4)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (regionMatchesIgnoreCase(html, lt, "<script")) {
          i = skipElement(html, lt, "script")
        } else if (regionMatchesIgnoreCase(html, lt, "<style")) {
          i = skipElement(html, lt, "style")
        } else if (regionMatchesIgnoreCase(html, lt, "</a") &&
          (lt + 3 >= n || !Character.isLetterOrDigit(html.charAt(lt + 3)))) {
          val gt = html.indexOf('>', lt)
          resume = if (gt < 0) n else gt + 1
          done = true
        } else if (lt + 1 < n &&
          (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
          (lt + 2 >= n || !Character.isLetterOrDigit(html.charAt(lt + 2)))) {
          resume = lt // implicit close — the outer walker reprocesses it
          done = true
        } else {
          val gt = tagEnd(html, lt)
          i = if (gt < 0) n else gt + 1
        }
      }
    }
    if (!done) resume = n
    (collapseWs(decodeEntities(sb.toString)), resume)
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else { if (pendingSpace) { sb.append(' '); pendingSpace = false }; sb.append(c) }
      i += 1
    }
    sb.toString
  }

  /** Raw href values of anchor tags, in document order. Comments and
    * script/style element bodies are skipped wholesale. */
  def extractHrefs(html: String): Array[String] = {
    if (html == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) return out.toArray
      if (html.regionMatches(lt, "<!--", 0, 4)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (regionMatchesIgnoreCase(html, lt, "<script")) {
        i = skipElement(html, lt, "script")
      } else if (regionMatchesIgnoreCase(html, lt, "<style")) {
        i = skipElement(html, lt, "style")
      } else if ((html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
        (lt + 2 >= n || !Character.isLetterOrDigit(html.charAt(lt + 2)))) {
        val gt = tagEnd(html, lt)
        val end = if (gt < 0) n else gt
        val href = findHref(html, lt + 2, end)
        if (href != null) out += href
        i = end + 1
      } else i = lt + 1
    }
    out.toArray
  }

  private def regionMatchesIgnoreCase(s: String, off: Int, pat: String): Boolean =
    s.regionMatches(true, off, pat, 0, pat.length)

  /** Index of the tag-closing '>' from `lt`, quote-aware: '>' is legal
    * inside a quoted attribute value (href="/a?x>y"), so a bare
    * indexOf('>') would cut the tag short and drop the link. */
  private def tagEnd(html: String, lt: Int): Int = {
    var i = lt
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  /** Past the matching `</tag` close (or end of input). */
  private def skipElement(html: String, from: Int, tag: String): Int = {
    var i = html.indexOf('>', from)
    if (i < 0) return html.length
    val close = "</" + tag
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return html.length
      if (regionMatchesIgnoreCase(html, lt, close)) {
        val gt = html.indexOf('>', lt)
        return if (gt < 0) html.length else gt + 1
      }
      i = lt + 1
    }
    html.length
  }

  /** The href attribute value inside [from, end), by walking the
    * tag's attributes left-to-right (name, optional =value with either
    * quote style or bare). A substring scan would match 'href' INSIDE
    * an earlier attribute's quoted value ("use href=evil here") and
    * return garbage — tokenizing can't. */
  private def findHref(html: String, from: Int, end: Int): String = {
    var i = from
    while (i < end) {
      while (i < end && (Character.isWhitespace(html.charAt(i)) ||
        html.charAt(i) == '/')) i += 1
      if (i >= end) return null
      // attribute name
      val nameStart = i
      while (i < end && !Character.isWhitespace(html.charAt(i)) &&
        html.charAt(i) != '=' && html.charAt(i) != '/') i += 1
      val isHref = i - nameStart == 4 &&
        regionMatchesIgnoreCase(html, nameStart, "href")
      while (i < end && Character.isWhitespace(html.charAt(i))) i += 1
      if (i < end && html.charAt(i) == '=') {
        i += 1
        while (i < end && Character.isWhitespace(html.charAt(i))) i += 1
        if (i >= end) return null
        val c = html.charAt(i)
        if (c == '"' || c == '\'') {
          val close = html.indexOf(c, i + 1)
          if (close < 0 || close > end) return null
          if (isHref) return html.substring(i + 1, close)
          i = close + 1
        } else {
          val vStart = i
          while (i < end && !Character.isWhitespace(html.charAt(i))) i += 1
          if (isHref) return html.substring(vStart, i)
        }
      } else if (isHref) return null // bare href attribute, no value
    }
    null
  }

  // ---------------------------------------------------------- Column API

  def html_links(html: Column, base: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(HtmlLinks(
      org.apache.spark.sql.GraftSqlBridge.expression(html),
      org.apache.spark.sql.GraftSqlBridge.expression(base)))

  def html_anchors(html: Column, base: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(HtmlAnchors(
      org.apache.spark.sql.GraftSqlBridge.expression(html),
      org.apache.spark.sql.GraftSqlBridge.expression(base)))

  def canonical_url(url: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(CanonicalUrl(
      org.apache.spark.sql.GraftSqlBridge.expression(url)))
}
