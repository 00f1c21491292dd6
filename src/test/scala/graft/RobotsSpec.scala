package graft

import graft.sources.RobotsTxt
import graft.sources.RobotsTxt.Rule
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt semantics pins: group selection, stacked
  * user-agents, wildcard/$ path matching, longest-match precedence
  * with the allow tie-break, fail-open defaults, and the columnar
  * filter's join shape. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# crawl policy
      |User-agent: evilbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/open
      |Disallow: /*.gif$
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /starred/
      |""".stripMargin

  test("parse: group selection by longest ua prefix; * is the fallback") {
    val g = RobotsTxt.parse(body, "graftbot")
    assert(g === Seq(Rule(false, "/private/"), Rule(true, "/private/open"),
      Rule(false, "/*.gif$")))
    // stacked user-agent lines share ONE group
    assert(RobotsTxt.parse(body, "otherbot") === g)
    // unknown agent falls to the * group
    assert(RobotsTxt.parse(body, "somebot") === Seq(Rule(false, "/starred/")))
    // longest ua token wins: 'graftbot-news' matches 'graftbot', and a
    // more specific group beats a shorter one
    val two = "User-agent: graft\nDisallow: /a\n\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    assert(RobotsTxt.parse(two, "graftbot-news") === Seq(Rule(false, "/b")))
    // empty Disallow value = allow everything = no rule; unparseable
    // and null bodies fail open
    assert(RobotsTxt.parse("User-agent: *\nDisallow:\n", "x") === Seq.empty)
    assert(RobotsTxt.parse("%% not robots at all %%", "x") === Seq.empty)
    assert(RobotsTxt.parse(null, "x") === Seq.empty)
    // rules before any User-agent line belong to no group: ignored
    assert(RobotsTxt.parse("Disallow: /x\nUser-agent: *\nAllow: /y\n", "x")
      === Seq(Rule(true, "/y")))
  }

  test("isAllowed: prefix, wildcard, $ anchor, longest-match, allow tie") {
    val rules = RobotsTxt.parse(body, "graftbot")
    assert(RobotsTxt.isAllowed(rules, "/page/1"))            // no match
    assert(!RobotsTxt.isAllowed(rules, "/private/x"))        // prefix
    assert(RobotsTxt.isAllowed(rules, "/private/open/doc"))  // longer allow
    assert(!RobotsTxt.isAllowed(rules, "/img/x.gif"))        // wildcard+$
    assert(RobotsTxt.isAllowed(rules, "/img/x.gifx"))        // $ anchors
    assert(!RobotsTxt.isAllowed(rules, "/a/b/c.gif"))
    // evilbot: Disallow / kills everything
    val evil = RobotsTxt.parse(body, "evilbot")
    assert(!RobotsTxt.isAllowed(evil, "/"))
    assert(!RobotsTxt.isAllowed(evil, "/anything"))
    // equal-length allow/disallow tie resolves to allow
    val tie = Seq(Rule(false, "/ab"), Rule(true, "/ab"))
    assert(RobotsTxt.isAllowed(tie, "/abc"))
    // no rules: everything allowed
    assert(RobotsTxt.isAllowed(Seq.empty, "/x"))
    // mid-pattern wildcard
    val mid = Seq(Rule(false, "/a*z"))
    assert(!RobotsTxt.isAllowed(mid, "/a-middle-z-tail"))
    assert(RobotsTxt.isAllowed(mid, "/a-middle"))
    // $ with NO wildcard anchors the whole literal: '/a$' matches only
    // the exact path, not a path that merely starts and ends with it
    val exact = Seq(Rule(false, "/a$"))
    assert(!RobotsTxt.isAllowed(exact, "/a"))   // exact match -> denied
    assert(RobotsTxt.isAllowed(exact, "/a/a"))  // prefix+suffix but not
    assert(RobotsTxt.isAllowed(exact, "/ab"))   //   the whole path: allowed
    assert(RobotsTxt.isAllowed(exact, "/b"))
    // a bare '$' matches only the empty path; '*$' matches any tail
    assert(RobotsTxt.isAllowed(Seq(Rule(false, "$")), "/x"))
    assert(!RobotsTxt.isAllowed(Seq(Rule(false, "/*$")), "/anything"))
  }

  test("fuzz: parse/isAllowed/patternMatches never throw on garbage " +
    "(seeded), allow verdict is total") {
    val rnd = new scala.util.Random(43)
    val alphabet = "ab:*$/#= -\t\nUserAgentDisallow"
    (0 until 2000).foreach { _ =>
      val body = (0 until rnd.nextInt(120))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val path = "/" + (0 until rnd.nextInt(20))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val rules = RobotsTxt.parse(body, "graftbot")
      // the verdict is a total Boolean on any parsed body — never throws
      RobotsTxt.isAllowed(rules, path)
    }
  }

  test("urlPath extraction") {
    assert(RobotsTxt.urlPath("https://e.org/a/b?q=1") === "/a/b?q=1")
    assert(RobotsTxt.urlPath("https://e.org") === "/")
    assert(RobotsTxt.urlPath(null) === null)
  }

  test("filterByRobots: per-host policy, absent robots row keeps, " +
    "null url drops") {
    val pages = Seq(
      "https://a.org/keep/1",
      "https://a.org/private/2",
      "https://a.org/private/open/3",
      "https://b.org/anything",       // host with no robots row: kept
      null.asInstanceOf[String]
    ).toDF("url")
    val robots = Seq(("a.org", body)).toDF("host", "body")
    val kept = RobotsTxt.filterByRobots(pages, robots, "graftbot")
    assert(kept.columns.toSeq === Seq("url"))
    assert(kept.as[String].collect().sorted.toSeq === Seq(
      "https://a.org/keep/1", "https://a.org/private/open/3",
      "https://b.org/anything"))
  }
}
