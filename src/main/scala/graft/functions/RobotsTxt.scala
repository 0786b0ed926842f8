package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.BooleanType
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate between a
  * URL frontier and a fetch: a corpus built from web captures must be
  * able to audit which records a compliant crawler would have been
  * allowed to take. Pairs with [[UrlNorm]]: group URLs by host, join each
  * host's robots.txt body alongside, and evaluate per path — the rules
  * TEXT rides the join (small per host), the scan is map-side.
  *
  * Semantics (RFC 9309, with the documented industry tie-break):
  *  - groups are runs of `User-agent:` lines followed by rules; rules
  *    before any `User-agent` line are ignored; `#` comments strip;
  *    field names are case-insensitive, values trim;
  *  - group selection: every group naming the product token exactly
  *    (case-insensitive) applies; if none do, the `*` groups apply; if
  *    none of those, everything is allowed;
  *  - rule match: patterns anchor at the path start, `*` matches any
  *    span, a trailing `$` anchors the end; the MOST SPECIFIC matching
  *    rule wins, specificity = pattern length in characters; at equal
  *    specificity Allow beats Disallow; no matching rule → allowed;
  *    an empty-value `Disallow:` matches nothing (allow-all idiom).
  *
  * Scale shape: evaluation is a linear scan of the (per-host, small)
  * rules text per row, inside whole-stage codegen; nothing is cached
  * between rows, so the kernel is safe under any partitioning. At the
  * 100 TB shape the join that delivers the rules text is a broadcast
  * (robots bodies for the host set in play are tiny next to captures).
  */
object RobotsTxt {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftSqlBridge.column(e)
  private def ex(c: Column) = GraftSqlBridge.expression(c)

  /** Anchored wildcard match: `*` spans, trailing `$` anchors the end. */
  private def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // greedy with backtracking over '*' (classic two-pointer wildcard)
    var pi = 0; var si = 0
    var starP = -1; var starS = -1
    if (p.isEmpty && !anchored) return true
    while (si < path.length) {
      if (pi == p.length && !anchored) return true // pattern consumed: prefix hit
      if (pi < p.length && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') { starP = pi; pi += 1; starS = si }
      else if (starP >= 0) { pi = starP + 1; starS += 1; si = starS }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    if (pi < p.length) return false
    if (anchored) si == path.length
    else true
  }

  private final case class Rule(allow: Boolean, pattern: String)

  /** Parse groups, return the rules that apply to `agent` (see doc).
    * Group MEMBERSHIP is tracked independently of whether any usable
    * rule was collected: a group that names the agent but carries only
    * empty-valued rules (the "this bot may crawl everything" idiom) is
    * still THE applicable group — it must not fall through to `*`
    * (RFC 9309 group selection; caught by the r11 review).
    */
  private def applicableRules(robots: String, agent: String): java.util.ArrayList[Rule] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = new java.util.ArrayList[Rule]()
    val wild = new java.util.ArrayList[Rule]()
    var exactGroupExists = false
    var groupAgents: List[String] = Nil
    var inAgentRun = false // consecutive User-agent lines share a group
    for (line0 <- robots.split("\n", -1)) {
      var line = line0
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val v = value.toLowerCase(java.util.Locale.ROOT)
            if (inAgentRun) groupAgents ::= v
            else { groupAgents = List(v); inAgentRun = true }
            if (v == agentLc) exactGroupExists = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) { // empty Disallow matches nothing
              val r = Rule(key == "allow", value)
              if (groupAgents.contains(agentLc)) exact.add(r)
              else if (groupAgents.contains("*")) wild.add(r)
            }
          case _ => inAgentRun = false // sitemap/crawl-delay etc. end the run
        }
      }
    }
    if (exactGroupExists) exact else wild
  }

  // ---- static kernel (Catalyst-facing) ------------------------------------

  /** `Sitemap:` discovery lines of a robots body, in file order — the
    * link from the politeness dim (q105) to sitemap ingest (q110).
    * Per the sitemaps.org protocol the record is GROUP-INDEPENDENT
    * (valid anywhere in the file, regardless of User-agent runs), so
    * this is a flat scan: comments strip, the field name is
    * case-insensitive, values trim, empty values drop. NULL/absent
    * robots → empty array (no advertised sitemaps).
    */
  def sitemapsKernel(robots: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    if (robots != null) {
      for (line0 <- robots.toString.split("\n", -1)) {
        var line = line0
        val hash = line.indexOf('#')
        if (hash >= 0) line = line.substring(0, hash)
        line = line.trim
        val colon = line.indexOf(':')
        if (colon > 0 &&
            line.substring(0, colon).trim
              .equalsIgnoreCase("sitemap")) {
          val value = line.substring(colon + 1).trim
          if (value.nonEmpty) out.add(UTF8String.fromString(value))
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[UTF8String](out.size())))
  }

  /** De-facto `Crawl-delay` record (not in RFC 9309, but the public
    * industry convention Bing/Yandex document — group-scoped like
    * Allow/Disallow): seconds the named agent should wait between
    * fetches. Group selection mirrors [[allowedKernel]]: groups naming
    * the agent exactly take precedence over `*` groups; the FIRST
    * parseable non-negative value among the applicable groups wins;
    * absent/unparseable → -1 (the column surface maps it to NULL).
    */
  def crawlDelayKernel(robots: UTF8String, agent: UTF8String): Double = {
    if (robots == null || agent == null) return -1.0
    val agentLc = agent.toString.toLowerCase(java.util.Locale.ROOT)
    var exactDelay = -1.0
    var wildDelay = -1.0
    var exactGroupExists = false
    var groupAgents: List[String] = Nil
    var inAgentRun = false
    for (line0 <- robots.toString.split("\n", -1)) {
      var line = line0
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val v = value.toLowerCase(java.util.Locale.ROOT)
            if (inAgentRun) groupAgents ::= v
            else { groupAgents = List(v); inAgentRun = true }
            if (v == agentLc) exactGroupExists = true
          case "crawl-delay" =>
            inAgentRun = false
            val d = try value.toDouble
              catch { case _: NumberFormatException => -1.0 }
            if (d >= 0) {
              if (groupAgents.contains(agentLc)) {
                if (exactDelay < 0) exactDelay = d
              } else if (groupAgents.contains("*") && wildDelay < 0)
                wildDelay = d
            }
          case _ => inAgentRun = false
        }
      }
    }
    if (exactGroupExists) exactDelay else wildDelay
  }

  /** Would `agent` be allowed to fetch `path` under `robots`? */
  def allowedKernel(robots: UTF8String, agent: UTF8String,
      path: UTF8String): Boolean = {
    if (robots == null || agent == null || path == null) return true
    val rules = applicableRules(robots.toString, agent.toString)
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.size()) {
      val r = rules.get(i)
      if (patternMatches(r.pattern, p)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
      i += 1
    }
    if (bestLen < 0) true else bestAllow
  }

  // ---- column surface -----------------------------------------------------

  /** True when `agent` may fetch `path` under the `robots` body (NULL
    * robots/agent/path → allowed: no rules is no restriction).
    */
  def allowed(robots: Column, agent: Column, path: Column): Column =
    col(StaticInvoke(classOf[RobotsTxt.type], BooleanType, "allowedKernel",
      Seq(ex(robots), ex(agent), ex(path)), Nil, propagateNull = false,
      returnNullable = false))

  /** Crawl-delay seconds for `agent` under `robots`, NULL when the
    * applicable group advertises none (see kernel).
    */
  def crawlDelay(robots: Column, agent: Column): Column = {
    val raw = col(StaticInvoke(classOf[RobotsTxt.type],
      org.apache.spark.sql.types.DoubleType, "crawlDelayKernel",
      Seq(ex(robots), ex(agent)), Nil, propagateNull = false,
      returnNullable = false))
    org.apache.spark.sql.functions.when(
      raw >= 0, raw)
  }

  /** Advertised sitemap URLs of a `robots` body (array, file order;
    * NULL robots → empty array).
    */
  def sitemaps(robots: Column): Column =
    col(StaticInvoke(classOf[RobotsTxt.type],
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false),
      "sitemapsKernel", Seq(ex(robots)), Nil, propagateNull = false,
      returnNullable = false))
}
