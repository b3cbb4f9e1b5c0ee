package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) evaluation over a crawl.
  *
  * A crawl's admission control starts before any page is fetched or parsed:
  * the per-host `robots.txt` decides which URLs the crawler may request at
  * all. This op evaluates that decision over an already-crawled pages table
  * (the audit/compliance view a corpus pipeline needs: which of the pages we
  * hold would the publisher's current policy admit?), but the same
  * `gate` join works identically over a frontier of candidate URLs.
  *
  * Semantics implemented (RFC 9309 + the de-facto wildcard extensions):
  *  - `#` comments stripped, blank lines ignored, directive names
  *    case-insensitive, unknown directives tolerated (they close the
  *    current group's user-agent run but are otherwise ignored);
  *  - groups: one or more `User-agent` lines followed by `Allow`/`Disallow`
  *    rules; rules before any `User-agent` line are ignored per §2.2.1;
  *  - group selection: case-insensitive PREFIX match of the group's product
  *    token against the crawler token; the longest matching token wins and
  *    ALL groups carrying it merge (§2.2.1 "combine"); `*` groups are the
  *    fallback; no group at all → everything allowed;
  *  - rule match: patterns are path prefixes, `*` matches any byte
  *    sequence, a trailing `$` anchors the end; an empty pattern matches
  *    nothing (an empty `Disallow:` is the classic allow-all idiom);
  *  - precedence: among matching rules the LONGEST pattern wins (octet
  *    count, §2.2.2); `Allow` wins exact ties; no matching rule → allowed;
  *  - a host with no robots row → allowed (an unavailable robots.txt MUST
  *    be treated as full allow, §2.3.1.2 for 404).
  *
  * Scale shape: the robots table is one row per HOST — many orders of
  * magnitude smaller than the pages table at any crawl size — so rules are
  * parsed ONCE per host (not per page), and the pages⋈rules join broadcasts
  * the compiled rule table. Page rows never shuffle; evaluation is a typed
  * map over the joined rows with an allocation-free backtracking matcher
  * (no regex compilation in the hot path).
  */
object Robots {

  /** One compiled rule from the group selected for the crawler. */
  final case class RobotRule(allow: Boolean, pattern: String)

  // ---- parsing -------------------------------------------------------------

  /** Parse a robots.txt body and return the rules of the group that governs
    * `agent` (see selection semantics in the class doc), in file order.
    */
  def selectRules(body: String, agent: String): Array[RobotRule] = {
    final case class Group(agents: Vector[String], rules: Vector[RobotRule])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = Vector.empty[String]
    var curRules = Vector.empty[RobotRule]
    var inAgentRun = false // consecutive User-agent lines extend ONE group
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups += Group(curAgents, curRules)
      curAgents = Vector.empty; curRules = Vector.empty
    }
    for (raw <- body.linesIterator) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) flush()
            inAgentRun = true
            if (value.nonEmpty) curAgents :+= value.toLowerCase
          case "allow" | "disallow" =>
            inAgentRun = false
            // empty pattern matches nothing — recording it would only add a
            // zero-length rule that can never win precedence
            if (value.nonEmpty && curAgents.nonEmpty)
              curRules :+= RobotRule(key == "allow", value)
          case _ => inAgentRun = false // Crawl-delay, Sitemap, vendor noise
        }
      }
    }
    flush()
    val a = agent.trim.toLowerCase
    // longest product-token prefix match; merge every group with that token
    val best = groups.iterator.flatMap(_.agents).filter(t => t != "*" && a.startsWith(t))
      .foldLeft("")((acc, t) => if (t.length > acc.length) t else acc)
    val pick: String => Boolean = if (best.nonEmpty) (_ == best) else (_ == "*")
    groups.iterator.filter(_.agents.exists(pick)).flatMap(_.rules).toArray
  }

  // ---- matching ------------------------------------------------------------

  /** Full-string glob match: `*` matches any (possibly empty) sequence.
    * Iterative two-pointer with single-star backtracking — O(|p|·|s|) worst
    * case, zero allocation, no compiled automaton to cache per executor.
    */
  private def globMatch(p: String, s: String): Boolean = {
    var pi = 0; var si = 0; var star = -1; var mark = 0
    while (si < s.length) {
      if (pi < p.length && p.charAt(pi) == '*') { star = pi; mark = si; pi += 1 }
      else if (pi < p.length && p.charAt(pi) == s.charAt(si)) { pi += 1; si += 1 }
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** Whether a single rule pattern matches the path (prefix semantics
    * unless `$`-anchored).
    */
  def ruleMatches(pattern: String, path: String): Boolean =
    if (pattern.endsWith("$")) globMatch(pattern.dropRight(1), path)
    else globMatch(if (pattern.endsWith("*")) pattern else pattern + "*", path)

  /** RFC 9309 verdict for one path against a selected rule group. */
  def isAllowed(rules: Array[RobotRule], path: String): Boolean = {
    var bestLen = -1; var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.pattern.length >= bestLen && ruleMatches(r.pattern, path)) {
        // longest pattern wins; Allow wins exact-length ties
        if (r.pattern.length > bestLen) { bestLen = r.pattern.length; bestAllow = r.allow }
        else bestAllow = bestAllow || r.allow
      }
      i += 1
    }
    bestAllow
  }

  /** Host and match-target path(+query) of an absolute URL, without URI
    * normalization (robots patterns match the raw request target).
    */
  def hostPath(url: String): (String, String) = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return ("", url)
    val rest = url.substring(schemeEnd + 3)
    val slash = rest.indexOf('/')
    if (slash < 0) (rest.toLowerCase, "/")
    else (rest.substring(0, slash).toLowerCase, rest.substring(slash))
  }

  // ---- the distributed gate -------------------------------------------------

  /** Evaluate RFC 9309 admission for every row of `pages` (needs `doc_id`,
    * `url`) against a per-host robots table (`host`, `robots_txt`) for the
    * given crawler product token. Returns (doc_id, url, allowed).
    *
    * Plan shape: rules compile once per HOST row; the compiled table is
    * broadcast (one row per host — always the small side of a crawl join);
    * the pages side never shuffles and the verdict is a typed map.
    */
  def gate(pages: DataFrame, robots: DataFrame, agent: String): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val compiled = robots.select("host", "robots_txt").as[(String, String)]
      .map { case (h, body) => (h.toLowerCase, selectRules(body, agent)) }
      .toDF("host", "rules")
    pages.select(col("doc_id"), col("url"),
        lower(regexp_extract(col("url"), "://([^/]+)", 1)).as("host"))
      .join(broadcast(compiled), Seq("host"), "left")
      .select(col("doc_id"), col("url"), col("rules"))
      .as[(String, String, Array[RobotRule])]
      .map { case (id, url, rules) =>
        val (_, path) = hostPath(url)
        // missing robots row → null rules → full allow (RFC 9309 §2.3.1.2)
        (id, url, rules == null || isAllowed(rules, path))
      }
      .toDF("doc_id", "url", "allowed")
  }
}
