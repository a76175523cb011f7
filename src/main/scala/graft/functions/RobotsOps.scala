package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation per RFC 9309 (the Robots Exclusion Protocol —
  * crawl-compliance filtering is a first-class step of any web-corpus
  * pipeline): group selection by most-specific matching User-agent
  * (falling back to `*`), Allow/Disallow path rules with `*` wildcards
  * and the `$` end anchor, longest-pattern-wins with Allow breaking
  * ties, no-match → allowed.
  *
  * `robots_allowed(robots_txt, path)` evaluates one URL path against
  * one robots body (the crawl-time shape: a domain-keyed robots table
  * broadcast-joined to the URL stream, then this filter — parse cost is
  * microseconds against typical files and stays inside codegen).
  * Null inputs → null; an empty/garbage robots body allows everything
  * (the protocol's permissive default). */
case class RobotsAllowed(left: Expression, right: Expression, agent: String)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(agent != null && agent.nonEmpty, "agent required")
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"
  override def nullSafeEval(txt: Any, path: Any): Any =
    RobotsOps.allowed(txt.asInstanceOf[UTF8String].toString, agent,
      path.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"""${ev.value} = graft.functions.RobotsOps.allowed(
         |  $t.toString(), $ref, $p.toString());""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

/** `Sitemap:` directives out of robots.txt — group-independent per
  * RFC 9309 §2.2.4, collected file-wide in order. */
case class RobotsSitemaps(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "robots_sitemaps"
  override def nullSafeEval(txt: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      RobotsOps.sitemapUtf8(txt.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.functions.RobotsOps.sitemapUtf8($t.toString()));
    """)
  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}

/** `Crawl-delay` of the agent's winning group, in milliseconds — the
  * de-facto politeness extension (fractional seconds legal). Null when
  * the winning group carries none or no group matches. */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(agent != null && agent.nonEmpty, "agent required")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "robots_crawl_delay"
  override def nullable: Boolean = true
  override def nullSafeEval(txt: Any): Any =
    RobotsOps.crawlDelayMs(txt.asInstanceOf[UTF8String].toString, agent)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    val d = ctx.freshName("delay")
    nullSafeCodeGen(ctx, ev, t => s"""
      java.lang.Long $d = graft.functions.RobotsOps.crawlDelayMs($t.toString(), $ref);
      ${ev.isNull} = $d == null;
      ${ev.value} = $d == null ? -1L : $d.longValue();
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): RobotsCrawlDelay =
    copy(child = newChild)
}

object RobotsOps {
  /** One rule: allow?, raw pattern. */
  private final case class Rule(allow: Boolean, pattern: String)

  /** One UA group: its agent tokens (lowercased), rules in file
    * order, and the group's Crawl-delay seconds if present. */
  private final case class Group(agents: List[String], rules: List[Rule],
      delay: Option[Double])

  /** Parse into groups: a group opens with one or more consecutive
    * User-agent lines and closes when a new User-agent follows rule
    * lines. Unknown directives and comments are skipped per spec;
    * Crawl-delay (the de-facto extension Bing/Yandex honor) is
    * captured per group. */
  private def parseGroups(txt: String): List[Group] = {
    var groups = List.empty[Group]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var curDelay: Option[Double] = None
    var inGroup = false       // currently collecting rules (past UA lines)
    def close(): Unit = {
      if (curAgents.nonEmpty)
        groups ::= Group(curAgents, curRules.reverse, curDelay)
      curAgents = Nil; curRules = Nil; curDelay = None; inGroup = false
    }
    txt.split("\n").foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw
      }
      val l = noComment.trim
      val c = l.indexOf(':')
      if (c > 0) {
        val key = l.substring(0, c).trim.toLowerCase
        val value = l.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inGroup) close()
            curAgents ::= value.toLowerCase
          case "allow" | "disallow" =>
            inGroup = true
            // empty Disallow means "allow all" — representable as a
            // rule that matches nothing (skip it, per spec)
            if (value.nonEmpty)
              curRules ::= Rule(key == "allow", value)
          case "crawl-delay" =>
            inGroup = true
            if (curDelay.isEmpty)
              curDelay = value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
          case _ => if (curAgents.nonEmpty) inGroup = true // sitemap etc.
        }
      }
    }
    close()
    groups.reverse
  }

  /** Group selection for `agent`: the groups whose UA token is the
    * LONGEST substring of `agent` (case-insensitive) win, `*` matches
    * any agent at the lowest specificity; RFC 9309 §2.2.1 combines
    * ALL groups at the winning specificity in file order. */
  private def selectGroups(txt: String, agent: String): List[Group] = {
    val la = agent.toLowerCase
    val withSpec = parseGroups(txt).map { g =>
      val spec = g.agents.map {
        case "*" => 0
        case ua if la.contains(ua) => ua.length
        case _ => -1
      }.max
      (spec, g)
    }
    val bestLen = if (withSpec.isEmpty) -1 else withSpec.map(_._1).max
    if (bestLen < 0) Nil
    else withSpec.collect { case (spec, g) if spec == bestLen => g }
  }

  private def rulesFor(txt: String, agent: String): Seq[Rule] =
    selectGroups(txt, agent).flatMap(_.rules)

  /** Crawl-delay for `agent` in MILLISECONDS (fractional seconds are
    * legal in the wild), or null when the winning group carries none —
    * the politeness input for [[graft.operators.TextAnalysis
    * .politenessSchedule]]. Combined same-specificity groups take the
    * most conservative (largest) delay. */
  def crawlDelayMs(txt: String, agent: String): java.lang.Long = {
    val ds = selectGroups(txt, agent).flatMap(_.delay)
    if (ds.isEmpty) null
    else java.lang.Long.valueOf(math.round(ds.max * 1000.0))
  }

  /** RFC 9309 pattern match: literal octets, `*` any run, `$` only as
    * a final end-anchor. Iterative greedy-with-backtrack (the classic
    * glob loop — no regex compilation per row). */
  private[functions] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    if (p.isEmpty) return !anchored || path.isEmpty
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < p.length && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi }
      else return false
      // unanchored patterns are prefix matches: pattern consumed → hit
      if (pi == p.length && !anchored) return true
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length // anchored: must also have consumed the whole path
  }

  /** The decision: longest matching pattern wins, Allow beats Disallow
    * at equal length, nothing matched → allowed. */
  def allowed(txt: String, agent: String, path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rulesFor(txt, agent).foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen && r.allow) bestAllow = true // Allow wins ties
      }
    }
    bestLen < 0 || bestAllow
  }

  /** `Sitemap:` directives, in file order — RFC 9309 §2.2.4 treats
    * them as group-independent, so they collect from the whole file
    * regardless of user-agent sections. The values are absolute URLs
    * per the sitemaps.org protocol; they feed [[Sitemap]] parsing to
    * seed the crawl frontier. */
  def sitemapUrls(txt: String): Array[String] = {
    if (txt == null) return Array.empty
    txt.split("\r?\n").iterator
      .map(l => { val c = l.indexOf('#'); if (c >= 0) l.substring(0, c) else l })
      .flatMap { l =>
        val i = l.indexOf(':')
        if (i <= 0) None
        else if (!l.substring(0, i).trim.equalsIgnoreCase("sitemap")) None
        else Some(l.substring(i + 1).trim).filter(_.nonEmpty)
      }.toArray
  }

  /** Codegen-facing form: the directive values as UTF8String[]. */
  def sitemapUtf8(txt: String): Array[AnyRef] =
    sitemapUrls(txt).map(UTF8String.fromString(_): AnyRef)

  def robots_allowed(txt: Column, path: Column, agent: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(RobotsAllowed(
      org.apache.spark.sql.GraftSqlBridge.expression(txt),
      org.apache.spark.sql.GraftSqlBridge.expression(path), agent))

  def robots_sitemaps(txt: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(RobotsSitemaps(
      org.apache.spark.sql.GraftSqlBridge.expression(txt)))

  def robots_crawl_delay(txt: Column, agent: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(RobotsCrawlDelay(
      org.apache.spark.sql.GraftSqlBridge.expression(txt), agent))
}
