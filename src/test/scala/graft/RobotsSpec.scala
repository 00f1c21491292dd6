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

  test("parse: rules of ALL groups matching at the winning length " +
    "combine (RFC 9309 §2.2.1), and all * groups merge on fallback") {
    // duplicated UA token across two separate groups — common in real
    // files; first/longest-only parsing would silently drop /b
    val dup = "User-agent: graftbot\nDisallow: /a\n\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    assert(RobotsTxt.parse(dup, "graftbot") ===
      Seq(Rule(false, "/a"), Rule(false, "/b")))
    // only the groups at the WINNING (longest) token length combine:
    // the shorter 'graft' group stays out
    val mixed = "User-agent: graft\nDisallow: /short\n\n" +
      "User-agent: graftbot\nDisallow: /a\n\n" +
      "User-agent: graftbot\nAllow: /a/open\n"
    assert(RobotsTxt.parse(mixed, "graftbot") ===
      Seq(Rule(false, "/a"), Rule(true, "/a/open")))
    // duplicated '*' groups merge the same way on fallback
    val stars = "User-agent: *\nDisallow: /x\n\n" +
      "User-agent: *\nDisallow: /y\n"
    assert(RobotsTxt.parse(stars, "unknownbot") ===
      Seq(Rule(false, "/x"), Rule(false, "/y")))
    // a group stacking the same token twice still contributes ONCE
    val stacked = "User-agent: graftbot\nUser-agent: graftbot\nDisallow: /a\n"
    assert(RobotsTxt.parse(stacked, "graftbot") === Seq(Rule(false, "/a")))
    // and the combined rules evaluate as one rule set
    assert(!RobotsTxt.isAllowed(RobotsTxt.parse(dup, "graftbot"), "/b/page"))
  }

  test("parseMeta: per-group crawl-delay (max over matching groups), " +
    "file-global sitemaps, fail-open on junk") {
    val m = RobotsTxt.parseMeta(body, "graftbot")
    assert(m.crawlDelay === Some(10.0))
    assert(m.sitemaps === Seq.empty)
    // the delay belongs to its group: other agents don't inherit it
    assert(RobotsTxt.parseMeta(body, "somebot").crawlDelay === None)
    // sitemaps are file-global (sitemaps.org: valid anywhere), and
    // several matching groups combine to the MOST CONSERVATIVE delay
    val full = "Sitemap: https://e.org/sm0.xml\n" +
      "User-agent: graftbot\nCrawl-delay: 2\nDisallow: /a\n\n" +
      "Sitemap: https://e.org/sm1.xml\n" +
      "User-agent: graftbot\nCrawl-delay: 7.5\n\n" +
      "User-agent: *\nCrawl-delay: 99\n"
    val fm = RobotsTxt.parseMeta(full, "graftbot")
    assert(fm.crawlDelay === Some(7.5))
    assert(fm.sitemaps ===
      Seq("https://e.org/sm0.xml", "https://e.org/sm1.xml"))
    // unknown agent gets the * group's delay
    assert(RobotsTxt.parseMeta(full, "somebot").crawlDelay === Some(99.0))
    // junk delays are ignored, never thrown
    assert(RobotsTxt.parseMeta(
      "User-agent: *\nCrawl-delay: soon\n", "x").crawlDelay === None)
    assert(RobotsTxt.parseMeta(
      "User-agent: *\nCrawl-delay: -3\n", "x").crawlDelay === None)
    assert(RobotsTxt.parseMeta(null, "x") === RobotsTxt.Meta(None, Seq.empty))
  }

  test("robotsMeta: per-host frame, one row per declared sitemap, " +
    "delay survives for hosts declaring none") {
    val robots = Seq(
      ("a.org", "Sitemap: https://a.org/s1.xml\nSitemap: https://a.org/s2.xml\n" +
        "User-agent: graftbot\nCrawl-delay: 3\n"),
      ("b.org", "User-agent: *\nCrawl-delay: 1\nDisallow: /x\n"),
      ("c.org", "User-agent: *\nDisallow: /y\n")
    ).toDF("host", "body")
    val meta = RobotsTxt.robotsMeta(robots, "graftbot")
    assert(meta.columns.toSeq === Seq("host", "crawl_delay", "sitemap"))
    val rows = meta.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getDouble(1),
      r.getString(2))).sortBy(r => (r._1, String.valueOf(r._3)))
    assert(rows.toSeq === Seq(
      ("a.org", 3.0, "https://a.org/s1.xml"),
      ("a.org", 3.0, "https://a.org/s2.xml"),
      ("b.org", 1.0, null),
      ("c.org", null, null)))
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
      RobotsTxt.parseMeta(body, "graftbot") // meta parse equally total
    }
  }

  test("urlPath extraction") {
    assert(RobotsTxt.urlPath("https://e.org/a/b?q=1") === "/a/b?q=1")
    assert(RobotsTxt.urlPath("https://e.org") === "/")
    assert(RobotsTxt.urlPath(null) === null)
  }

  test("politeSchedule: per-host slots x declared delay, default for " +
    "silent hosts, max of duplicate delay rows, broadcast delay side") {
    import graft.operators.Urls
    val frontier = Seq(
      "https://a.org/p2", "https://a.org/p1", "https://a.org/p3",
      "https://b.org/x", "https://b.org/y",
      "https://c.org/only",
      "not a url", // hostless junk: nothing to fetch, nothing to schedule
      null.asInstanceOf[String]
    ).toDF("url")
    // robotsMeta-shaped: duplicate host rows (one per sitemap) must
    // reduce to the most conservative delay; c.org declares none
    val delays = Seq(
      ("a.org", Some(2.0)), ("a.org", Some(10.0)),
      ("b.org", Some(0.5)), ("c.org", None)
    ).toDF("host", "crawl_delay")
    val out = Urls.politeSchedule(frontier, delays, defaultDelayMs = 1500L)
    val rows = out.select($"url", $"host", $"slot", $"delay_ms", $"fetch_after_ms")
      .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(rows.toSeq === Seq(
      // a.org: slots in url order, max(2, 10) s = 10000 ms
      ("https://a.org/p1", "a.org", 0L, 10000L, 0L),
      ("https://a.org/p2", "a.org", 1L, 10000L, 10000L),
      ("https://a.org/p3", "a.org", 2L, 10000L, 20000L),
      // b.org: 0.5 s rounds to exact 500 ms
      ("https://b.org/x", "b.org", 0L, 500L, 0L),
      ("https://b.org/y", "b.org", 1L, 500L, 500L),
      // c.org declared no delay -> the caller's default
      ("https://c.org/only", "c.org", 0L, 1500L, 0L)))
    // null-url and hostless rows drop; the delay side broadcasts
    // (host-cardinality)
    assert(out.count() === 6L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"delay join should broadcast:\n$plan")
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
