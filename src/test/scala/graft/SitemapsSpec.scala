package graft

import graft.sources.Sitemaps
import graft.sources.Sitemaps.Entry

/** Sitemap-protocol parser pins: urlset/sitemapindex blocks, optional
  * children, entity + CDATA decode, namespace prefixes, clean-prefix
  * truncation, never-throw fuzz. */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: urlset with optional children, entity + CDATA decode") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://e.org/a?x=1&amp;y=2</loc>
        |    <lastmod>2026-01-02</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc><![CDATA[https://e.org/cdata&raw]]></loc></url>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val es = Sitemaps.parse(xml)
    assert(es === Seq(
      Entry("https://e.org/a?x=1&y=2", "2026-01-02", "daily", "0.8", false),
      // CDATA loc passes through raw; missing children stay null
      Entry("https://e.org/cdata&raw", null, null, null, false)))
    // the loc-less third block was skipped entirely
  }

  test("parse: sitemapindex references and namespace prefixes") {
    val idx =
      """<sitemapindex>
        |  <sitemap><loc>https://e.org/s1.xml</loc>
        |    <lastmod>2026-02-01</lastmod></sitemap>
        |  <sitemap><loc>https://e.org/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.parse(idx) === Seq(
      Entry("https://e.org/s1.xml", "2026-02-01", null, null, true),
      Entry("https://e.org/s2.xml", null, null, null, true)))
    val ns = "<sm:urlset><sm:url><sm:loc>https://e.org/ns</sm:loc>" +
      "</sm:url></sm:urlset>"
    assert(Sitemaps.parse(ns) ===
      Seq(Entry("https://e.org/ns", null, null, null, false)))
  }

  test("parse: clean prefix on truncation; garbage and null never throw") {
    val trunc = "<urlset><url><loc>https://e.org/1</loc></url>" +
      "<url><loc>https://e.org/2</lo"
    assert(Sitemaps.parse(trunc).map(_.loc) === Seq("https://e.org/1"))
    // a self-closed <url/> is an empty block, not a reason to drop
    // everything after it
    val selfClosed = "<urlset><url/><url><loc>https://e.org/after</loc>" +
      "</url></urlset>"
    assert(Sitemaps.parse(selfClosed).map(_.loc) === Seq("https://e.org/after"))
    assert(Sitemaps.parse(null) === Seq.empty)
    assert(Sitemaps.parse("no xml here") === Seq.empty)
    val rnd = new scala.util.Random(44)
    val alphabet = "<>/urlsetmapindxoc&; \n"
    (0 until 2000).foreach { _ =>
      val s = (0 until rnd.nextInt(100))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      Sitemaps.parse(s) // never throws
    }
  }

  test("ingestSitemaps: one row per entry, parse inside the scan task") {
    val df = Seq(
      ("s1.xml", "<urlset><url><loc>https://e.org/1</loc></url></urlset>"),
      ("s2.xml", "<sitemapindex><sitemap><loc>https://e.org/sub.xml</loc>" +
        "</sitemap></sitemapindex>"),
      ("s3.xml", null.asInstanceOf[String])
    ).toDF("path", "body")
    val out = Sitemaps.ingestSitemaps(df).orderBy("path")
      .select("path", "loc", "is_index")
      .as[(String, String, Boolean)].collect().toSeq
    assert(out === Seq(("s1.xml", "https://e.org/1", false),
      ("s2.xml", "https://e.org/sub.xml", true)))
  }

  test("recrawlSchedule: changefreq periods, day-granular lastmod, " +
    "never disables, unknown/absent defaults, bad lastmod due " +
    "immediately, zero shuffle") {
    // now = 2026-01-11T00:00:00Z = 20464 days * 86400
    val now = 20464L * 86400L
    val entries = Seq(
      // lastmod 2026-01-01 = epoch day 20454
      ("u1", "2026-01-01", "daily"),        // due 20455d, overdue 9d
      ("u2", "2026-01-01T08:30:00+00:00", "weekly"), // time-of-day cut
      ("u3", "2026-01-01", "never"),        // never due
      ("u4", "2026-01-01", "junk"),         // unknown -> default 2d
      ("u5", "2026-01-01", null),           // absent -> default
      ("u6", "not a date", "daily"),        // bad lastmod -> due at 0
      ("u7", "2026-01-01", "ALWAYS")        // case-insensitive, period 0
    ).toDF("loc", "lastmod", "changefreq")
    val out = Sitemaps.recrawlSchedule(entries, now,
      defaultPeriodSec = 2L * 86400L)
    val rows = out.select($"loc", $"period_sec", $"due_at_sec",
        $"overdue_sec", $"fetch_due")
      .as[(String, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().sortBy(_._1)
    val d20454 = 20454L * 86400L
    assert(rows.toSeq === Seq(
      ("u1", Some(86400L), Some(d20454 + 86400L),
        Some(now - d20454 - 86400L), true),
      ("u2", Some(604800L), Some(d20454 + 604800L),
        Some(now - d20454 - 604800L), true),
      ("u3", None, None, None, false),
      ("u4", Some(172800L), Some(d20454 + 172800L),
        Some(now - d20454 - 172800L), true),
      ("u5", Some(172800L), Some(d20454 + 172800L),
        Some(now - d20454 - 172800L), true),
      ("u6", Some(86400L), Some(0L), Some(now), true),
      ("u7", Some(0L), Some(d20454), Some(now - d20454), true)))
    // narrow projection: no exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"recrawlSchedule must not shuffle:\n$plan")
  }
}
