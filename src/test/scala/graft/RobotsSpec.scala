package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Robots
import graft.corpus.WebGen

/** RFC 9309 evaluator: parsing, group selection, precedence, wildcard and
  * anchor matching, and the distributed gate against the planted per-host
  * policies' closed form.
  */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# global policy          # comment noise everywhere
      |User-agent: otherbot
      |Disallow:
      |
      |user-AGENT: graftbot     # case-insensitive directives
      |DisAllow: /private/*.json$
      |Allow: /private/open/
      |Crawl-delay: 7
      |
      |User-agent: graftbot
      |Disallow: /tmp/
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("agent groups merge; star group ignored when a token matches") {
    val rules = Robots.selectRules(body, "graftbot/2.0")
    // both graftbot groups combine (RFC 9309 §2.2.1); the empty Disallow
    // and the star group contribute nothing
    assert(rules.map(_.pattern).toSet ===
      Set("/private/*.json$", "/private/open/", "/tmp/"))
    assert(Robots.isAllowed(rules, "/anything"))          // no rule matches
    assert(!Robots.isAllowed(rules, "/tmp/x"))            // prefix disallow
    assert(!Robots.isAllowed(rules, "/private/a/b.json")) // wildcard+anchor
    assert(Robots.isAllowed(rules, "/private/a/b.json?v=1")) // $ anchors END
    // the anchored wildcard (16 octets) outranks the shorter Allow (14)
    assert(!Robots.isAllowed(rules, "/private/open/c.json"))
    assert(Robots.isAllowed(rules, "/private/open/readme.txt"))
  }

  test("longest pattern wins; Allow wins exact-length ties") {
    val rules = Array(
      Robots.RobotRule(allow = false, "/a/"),
      Robots.RobotRule(allow = true, "/a/b/"),
      Robots.RobotRule(allow = false, "/x/y/"),
      Robots.RobotRule(allow = true, "/x/z/"))
    assert(!Robots.isAllowed(rules, "/a/q"))
    assert(Robots.isAllowed(rules, "/a/b/q"))
    val realTie = Array(
      Robots.RobotRule(allow = false, "/doc"),
      Robots.RobotRule(allow = true, "/d*c"))
    assert(Robots.isAllowed(realTie, "/doc")) // equal length 4 → Allow wins
  }

  test("unknown-agent crawler falls back to the star group") {
    val rules = Robots.selectRules(body, "somebody-else")
    assert(rules.map(_.pattern).toSeq === Seq("/"))
    assert(!Robots.isAllowed(rules, "/anything"))
  }

  test("longest product-token prefix selects the most specific group") {
    val b =
      """User-agent: graft
        |Disallow: /a/
        |User-agent: graftbot
        |Disallow: /b/
        |""".stripMargin
    val rules = Robots.selectRules(b, "graftbot/1.0")
    assert(rules.map(_.pattern).toSeq === Seq("/b/"))
    // "graft" still governs a crawler named graft-archiver
    assert(Robots.selectRules(b, "graft-archiver").map(_.pattern).toSeq === Seq("/a/"))
  }

  test("rules before any User-agent line are ignored") {
    val rules = Robots.selectRules("Disallow: /x/\nUser-agent: *\nDisallow: /y/\n", "bot")
    assert(rules.map(_.pattern).toSeq === Seq("/y/"))
  }

  test("wildcard matcher: backtracking, anchors, prefix semantics") {
    assert(Robots.ruleMatches("/case/*7$", "/case/17"))
    // a 77-ender still ENDS in 7 — the matcher matches; only the longer
    // Allow rule's precedence rescues it at evaluation time
    assert(Robots.ruleMatches("/case/*7$", "/case/177"))
    assert(Robots.ruleMatches("/case/*77$", "/case/177"))
    assert(!Robots.ruleMatches("/case/*7$", "/case/178"))
    assert(Robots.ruleMatches("/a*b*c", "/aXbYbZcQ")) // prefix + backtrack
    assert(!Robots.ruleMatches("/a*b*c$", "/aXbYbZcQ"))
    assert(Robots.ruleMatches("/a*b*c$", "/aXbYbZc"))
    assert(Robots.ruleMatches("/", "/anything"))
  }

  test("gate over the planted policies equals the closed form; missing host allows") {
    val spark = SparkSessions.spark
    import spark.implicits._
    val ids = (0L until 400L) :+ 100L // include a repost index
    val pages = ids.distinct.map(i => (WebGen.docId(i), WebGen.url(i)))
      .toDF("doc_id", "url")
    val robots = WebGen.hosts.map(h => (h, WebGen.robotsTxt(h)))
      .toDF("host", "robots_txt")
    val got = Robots.gate(pages, robots, "graftbot/1.2")
      .as[(String, String, Boolean)].collect().map(r => (r._2, r._3)).toMap
    for (i <- ids.distinct) {
      val u = WebGen.url(i)
      val n = i.toString
      val expected =
        if (u.contains("repost-archive")) n.startsWith("1")
        else if (u.contains("portal-3.")) !n.endsWith("3")
        else !n.endsWith("7") || n.endsWith("77")
      assert(got(u) === expected, s"id $i url $u")
    }
    // a host with no robots row is fully allowed (RFC 9309 §2.3.1.2)
    val offPolicy = Seq(("x-1", "https://nowhere.example/case/7")).toDF("doc_id", "url")
    val v = Robots.gate(offPolicy, robots, "graftbot/1.2")
      .as[(String, String, Boolean)].collect()
    assert(v.head._3)
  }
}
