package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org XML protocol) — the crawl-DISCOVERY
  * half of the front door: a site's sitemap enumerates the URLs worth
  * fetching (with optional freshness hints), and a training-data crawl
  * seeds its frontier from them before robots filtering
  * ([[RobotsTxt]]) and post-fetch canonical collapse
  * ([[graft.operators.Urls.canonicalCollapse]]).
  *
  * Hand-rolled scan, not an XML library: sitemap files in the wild are
  * frequently malformed (unclosed tags, stray bytes, truncated tails),
  * and the never-throw / parse-the-clean-prefix posture of the WARC
  * reader applies. Supported per the protocol:
  *  - `<urlset>` entries: `<url>` blocks with `<loc>` (required —
  *    blocks without one are skipped), `<lastmod>`, `<changefreq>`,
  *    `<priority>`;
  *  - `<sitemapindex>` entries: `<sitemap>` blocks with `<loc>` —
  *    returned with `is_index = true` so the caller can fetch the
  *    referenced sub-sitemaps (fetching is the crawler's job, not the
  *    parser's);
  *  - the five predefined XML entities, decoded in text content
  *    (`&amp;` in a loc URL is the common case); CDATA-wrapped locs;
  *    namespace-prefixed tags (`<sm:loc>`) matched by local name.
  *
  * Scale shape: one pure `String => Seq[...]` kernel per sitemap body,
  * run inside whatever task holds the payload (binaryFile scan, WARC
  * explode) — parallelism unit is the sitemap file, zero shuffle. */
object Sitemaps {

  /** One parsed entry: the target URL, freshness hints (null when
    * absent), and whether it points at a sub-sitemap. */
  final case class Entry(loc: String, lastmod: String, changefreq: String,
                         priority: String, is_index: Boolean)

  private def decodeXml(s: String): String = {
    val t = s.trim
    val unCdata =
      if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
        t.substring(9, t.length - 3)
      else t
    unCdata
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&") // LAST: '&amp;lt;' decodes to '&lt;' literal
      .trim
  }

  /** The text content of the FIRST `<name>`/`<ns:name>` child inside
    * `block`, decoded; null when absent or unclosed. */
  private def childText(block: String, name: String): String = {
    val lower = block.toLowerCase
    var i = 0
    while (i >= 0 && i < block.length) {
      i = lower.indexOf("<", i)
      if (i < 0) return null
      // match <name…> or <ns:name…> (local-name rule)
      var j = i + 1
      while (j < lower.length && lower.charAt(j) != '>' &&
        !Character.isWhitespace(lower.charAt(j))) j += 1
      if (j <= lower.length) {
        val tag = lower.substring(i + 1, j)
        val local = tag.substring(tag.indexOf(':') + 1)
        if (local == name) {
          val open = lower.indexOf('>', i)
          if (open < 0) return null
          val close = lower.indexOf(s"</", open)
          // accept any close tag whose local name matches
          var c = close
          while (c >= 0) {
            var k = c + 2
            while (k < lower.length && lower.charAt(k) != '>') k += 1
            val ctag = lower.substring(c + 2, math.min(k, lower.length))
            if (ctag.substring(ctag.indexOf(':') + 1).trim == name)
              return decodeXml(block.substring(open + 1, c))
            c = lower.indexOf("</", c + 2)
          }
          return null
        }
      }
      i = j
    }
    null
  }

  /** Every `<open>…</open>` block body in `body` (case-insensitive,
    * namespace-prefix-blind); unclosed tails are dropped (the
    * clean-prefix rule). */
  private def blocks(body: String, name: String): Iterator[String] =
    new Iterator[String] {
      private val lower = body.toLowerCase
      private var i = 0
      private var nxt: String = null
      private def advance(): Unit = {
        nxt = null
        while (nxt == null && i >= 0 && i < body.length) {
          i = lower.indexOf("<", i)
          if (i < 0) return
          var j = i + 1
          while (j < lower.length && lower.charAt(j) != '>' &&
            !Character.isWhitespace(lower.charAt(j))) j += 1
          val tag = lower.substring(i + 1, math.min(j, lower.length))
          val local = tag.substring(tag.indexOf(':') + 1)
          if (local == name) {
            val open = lower.indexOf('>', i)
            if (open < 0) { i = -1; return }
            if (body.charAt(open - 1) == '/') {
              // self-closed <url/>: an empty (loc-less) block — skip
              // it, do NOT drop the rest of the document
              i = open + 1
            } else {
              val close = lower.indexOf(s"</$tag>", open)
              val closeAlt = lower.indexOf(s"</$name>", open)
              val c = if (close >= 0 && (closeAlt < 0 || close <= closeAlt)) close
                      else closeAlt
              if (c < 0) { i = -1; return } // unclosed tail: drop
              nxt = body.substring(open + 1, c)
              i = c + 2
            }
          } else i = j
        }
      }
      advance()
      override def hasNext: Boolean = nxt != null
      override def next(): String = { val b = nxt; advance(); b }
    }

  /** Parse one sitemap body — `<urlset>` entries and/or
    * `<sitemapindex>` references, in document order. Never throws;
    * null/garbage bodies parse to empty. */
  def parse(body: String): Seq[Entry] = {
    if (body == null) return Seq.empty
    val urls = blocks(body, "url").flatMap { b =>
      Option(childText(b, "loc")).filter(_.nonEmpty).map { loc =>
        Entry(loc, childText(b, "lastmod"), childText(b, "changefreq"),
          childText(b, "priority"), is_index = false)
      }
    }
    val subs = blocks(body, "sitemap").flatMap { b =>
      Option(childText(b, "loc")).filter(_.nonEmpty).map { loc =>
        Entry(loc, childText(b, "lastmod"), null, null, is_index = true)
      }
    }
    (urls ++ subs).toSeq
  }

  /** Explode a frame of sitemap payloads into one row per entry:
    * (srcCol, loc, lastmod, changefreq, priority, is_index). The parse
    * runs inside the scan task; rows with a null body yield nothing. */
  def ingestSitemaps(sitemaps: DataFrame, srcCol: String = "path",
                     bodyCol: String = "body"): DataFrame = {
    val u = udf((b: String) => parse(b))
    sitemaps
      .select(col(srcCol), explode(u(col(bodyCol))).as("e"))
      .select(col(srcCol), col("e.loc").as("loc"),
        col("e.lastmod").as("lastmod"),
        col("e.changefreq").as("changefreq"),
        col("e.priority").as("priority"),
        col("e.is_index").as("is_index"))
  }

  /** Seconds per `<changefreq>` token (sitemaps.org vocabulary,
    * matched case-insensitively): `always` re-fetches every visit
    * (period 0), `never` disables recrawl (None), the rest take their
    * calendar meaning with the 30-day month convention. Unknown or
    * absent tokens fall back to the caller's default. */
  private val ChangefreqSec: Map[String, Long] = Map(
    "always" -> 0L, "hourly" -> 3600L, "daily" -> 86400L,
    "weekly" -> 604800L, "monthly" -> 2592000L, "yearly" -> 31536000L)

  /** Recrawl scheduling from the freshness hints [[ingestSitemaps]]
    * already parses — the consumer that makes `lastmod`/`changefreq`
    * actionable: per entry, `period_sec` (the changefreq mapping,
    * `defaultPeriodSec` for unknown/absent, null for `never`),
    * `due_at_sec` = lastmod + period, `overdue_sec` = now − due, and
    * `fetch_due`. The lastmod is consumed at DAY granularity (the
    * first 10 chars of the W3C datetime, the granularity sitemaps
    * carry in practice): epoch-day × 86400, via `try_to_date` so an
    * unparseable value never throws — it means never-crawled-as-far-
    * as-we-know and is due immediately (due_at 0). `never` entries
    * are not due, ever. `nowEpochSec` is an explicit input: the
    * schedule is a pure function of its arguments, so two engines (or
    * two runs) produce bit-identical plans — the oracle replays the
    * same integer arithmetic.
    *
    * Scale shape: a narrow per-row projection in the scan task — zero
    * shuffle; order or partition downstream (e.g. feed the due rows
    * into [[graft.operators.Urls.politeSchedule]]). */
  def recrawlSchedule(entries: DataFrame, nowEpochSec: Long,
                      defaultPeriodSec: Long = 86400L,
                      lastmodCol: String = "lastmod",
                      changefreqCol: String = "changefreq"): DataFrame = {
    require(defaultPeriodSec >= 0,
      s"defaultPeriodSec must be >= 0, got $defaultPeriodSec")
    val freq = lower(trim(col(changefreqCol)))
    val period = ChangefreqSec.foldLeft(
        when(freq === "never", lit(null).cast("long"))) {
      case (acc, (tok, sec)) => acc.when(freq === tok, lit(sec))
    }.otherwise(lit(defaultPeriodSec))
    val lastmodDay = try_to_date(substring(col(lastmodCol), 1, 10),
      "yyyy-MM-dd")
    val lastmodSec = datediff(lastmodDay, to_date(lit("1970-01-01")))
      .cast("long") * 86400L
    entries
      .withColumn("period_sec", period)
      .withColumn("due_at_sec",
        when(col("period_sec").isNull, lit(null).cast("long"))
          .otherwise(coalesce(lastmodSec + col("period_sec"), lit(0L))))
      .withColumn("overdue_sec", lit(nowEpochSec) - col("due_at_sec"))
      .withColumn("fetch_due", coalesce(col("overdue_sec") >= 0, lit(false)))
  }
}
