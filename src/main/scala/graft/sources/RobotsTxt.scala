package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt parsing and allow/deny evaluation — the fetch-
  * policy half of the crawl front door (WARC ingest + HTML extraction
  * + canonical collapse are the content half; a training-data crawl
  * must also HONOR the site's exclusion rules, and re-checking them at
  * curation time catches pages fetched before a policy changed).
  *
  * Implemented semantics (the RFC's normative core):
  *  - groups: one or more stacked `User-agent:` lines followed by
  *    `Allow:`/`Disallow:` rules until the next `User-agent:` line;
  *  - group selection: the group whose user-agent token is the
  *    LONGEST case-insensitive prefix of the caller's product token
  *    wins; the `*` group applies only when no specific group matches;
  *  - path matching: byte-wise prefix with `*` as a multi-character
  *    wildcard and `$` anchoring the pattern end;
  *  - precedence: the MOST SPECIFIC match (longest pattern) wins;
  *    an allow/disallow tie at equal length resolves to ALLOW;
  *  - no matching rule, no matching group, empty `Disallow:` value,
  *    or an unparseable body → allowed (the RFC's fail-open rule);
  *  - `#` comments, blank lines, unknown fields and case-insensitive
  *    field names are tolerated;
  *  - `Crawl-delay:` (per-group politeness, seconds) and `Sitemap:`
  *    (file-global declared sitemap URLs) are parsed via [[parseMeta]]
  *    so the discovery loop can be seeded from robots.txt — the way
  *    real crawlers find sitemaps.
  *
  * Scale shape: [[rulesColumn]] parses each host's body ONCE into an
  * array of (allow, pattern) structs on the (small) robots frame;
  * [[filterByRobots]] joins pages to their host's parsed rules and
  * evaluates the matcher per page inside the scan task — the page
  * frame shuffles once on the host key (or zero times when the robots
  * side is broadcast by the optimizer).
  */
object RobotsTxt {

  /** One parsed rule: allow/disallow + its raw path pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** One parsed group: its user-agent tokens (lowercased), its
    * allow/disallow rules, and an optional per-group crawl-delay. */
  private final case class Group(
      uas: scala.collection.mutable.ArrayBuffer[String],
      rules: scala.collection.mutable.ArrayBuffer[Rule],
      var crawlDelay: Option[Double])

  /** Per-host metadata beyond allow/deny: the governing group's
    * politeness delay (seconds) and the file-global declared sitemap
    * URLs — the way real crawlers seed sitemap discovery. */
  final case class Meta(crawlDelay: Option[Double], sitemaps: Seq[String])

  /** Parse the full file into groups + global sitemap list. Never
    * throws: an unparseable body yields no groups. */
  private def parseGroups(body: String): (Seq[Group], Seq[String]) = {
    if (body == null) return (Seq.empty, Seq.empty)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur: Group = null
    var inUaRun = false // stacked User-agent lines extend ONE group
    body.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inUaRun || cur == null) {
              cur = Group(
                scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Rule], None)
              groups += cur
            }
            cur.uas += value.toLowerCase
            inUaRun = true
          case "allow" | "disallow" =>
            inUaRun = false
            // rules before any User-agent line have no group: ignored
            // (the RFC treats them as belonging to no group)
            if (cur != null) {
              // empty Disallow value = "allow everything" = no rule;
              // empty Allow value is equally vacuous
              if (value.nonEmpty)
                cur.rules += Rule(field == "allow", value)
            }
          case "crawl-delay" =>
            inUaRun = false
            if (cur != null && cur.crawlDelay.isEmpty)
              try {
                val d = value.toDouble
                if (d >= 0 && !d.isNaN && !d.isInfinite) cur.crawlDelay = Some(d)
              } catch { case _: NumberFormatException => }
          case "sitemap" =>
            // file-global per sitemaps.org: valid anywhere, absolute URL
            inUaRun = false
            if (value.nonEmpty) sitemaps += value
          case _ => inUaRun = false // unknown field
        }
      } else if (line.nonEmpty) inUaRun = false
    }
    (groups.toSeq, sitemaps.toSeq)
  }

  /** The groups governing `userAgent` (lowercased product token).
    * RFC 9309 group selection: the LONGEST user-agent token that
    * prefixes ours wins; `*` groups apply only when nothing specific
    * matched. §2.2.1: when more than one group matches (duplicated UA
    * tokens are common in real files), ALL groups matching at the
    * winning length combine — likewise all `*` groups on fallback. */
  private def selectGroups(groups: Seq[Group], ua: String): Seq[Group] = {
    var bestLen = -1
    groups.foreach { g =>
      g.uas.foreach { tok =>
        if (tok != "*" && ua.startsWith(tok) && tok.length > bestLen)
          bestLen = tok.length
      }
    }
    if (bestLen >= 0)
      groups.filter(_.uas.exists(tok =>
        tok != "*" && tok.length == bestLen && ua.startsWith(tok)))
    else groups.filter(_.uas.contains("*"))
  }

  /** Parse a robots.txt body and return the combined rules of the
    * groups that govern `userAgent`. Never throws: an unparseable
    * body yields no rules, i.e. everything allowed. */
  def parse(body: String, userAgent: String): Seq[Rule] = {
    val (groups, _) = parseGroups(body)
    selectGroups(groups, userAgent.toLowerCase).flatMap(_.rules)
  }

  /** Parse the non-rule metadata: the governing groups' crawl-delay
    * (most conservative — maximum — when several matching groups
    * declare one) and the file-global sitemap URLs. */
  def parseMeta(body: String, userAgent: String): Meta = {
    val (groups, sitemaps) = parseGroups(body)
    val delays = selectGroups(groups, userAgent.toLowerCase).flatMap(_.crawlDelay)
    Meta(if (delays.isEmpty) None else Some(delays.max), sitemaps)
  }

  /** Does `pattern` match `path` under RFC 9309 wildcard semantics?
    * `*` matches any character run; a trailing `$` anchors the end;
    * otherwise the match is a prefix match. */
  private[sources] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // segments between '*' must appear in order; first segment must be
    // a prefix; with '$' the last segment must END the path
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) {
      val last = segs.last
      if (last.isEmpty)
        // pattern ends in '*$': any tail matches; a bare '$' with no
        // '*' anchors the end of the empty prefix = only the empty path
        segs.length > 1 || path.isEmpty
      else if (segs.length == 1)
        // no '*' anywhere: '$' makes the literal match EXACT ('/a$'
        // must not match '/a/a', which is prefix AND suffix but not
        // the whole path)
        path == pat
      else
        // ≥1 '*' before the last segment: in-order occurrences (the
        // loop above) + a terminal occurrence suffice — the terminal
        // occurrence is the maximal one, so if any in-order match
        // exists, the terminal one is also in order
        path.endsWith(last)
    } else true
  }

  /** Is `path` allowed under `rules`? Longest-pattern match wins;
    * an equal-length allow/disallow tie resolves to allow; no match =
    * allowed (RFC 9309 precedence). */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    if (path == null) return false
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.pattern.length >= bestLen && patternMatches(r.pattern, path)) {
        if (r.pattern.length > bestLen) {
          bestLen = r.pattern.length
          bestAllow = r.allow
        } else if (r.allow) bestAllow = true // tie → allow
      }
    }
    bestAllow
  }

  /** The path component (incl. query) of an absolute URL, '/' when
    * absent — the matching unit robots rules apply to. */
  def urlPath(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return url
    val p = url.indexOf('/', schemeEnd + 3)
    if (p < 0) "/" else url.substring(p)
  }

  /** Parse a robots BODY column into an array<struct<allow,pattern>>
    * of the group governing `userAgent` — run ONCE per host on the
    * robots frame, so the per-page matcher never re-parses a body. */
  def rulesColumn(body: Column, userAgent: String): Column = {
    val u = udf((b: String) => parse(b, userAgent).map(r => (r.allow, r.pattern)))
    u(body)
  }

  /** Parse a robots BODY column into struct<crawl_delay double,
    * sitemaps array<string>> — per-host politeness + declared sitemap
    * seeds, one parse per host on the (small) robots frame. A host
    * with no declared delay yields a null crawl_delay. */
  def metaColumn(body: Column, userAgent: String): Column = {
    val u = udf((b: String) => {
      val m = parseMeta(b, userAgent)
      (m.crawlDelay.map(Double.box).orNull, m.sitemaps)
    })
    u(body).cast("struct<crawl_delay:double,sitemaps:array<string>>")
  }

  /** Per-host fetch-policy metadata frame: (host, crawl_delay,
    * sitemap) with one row per declared sitemap URL (hosts declaring
    * none keep one row with a null sitemap, so the politeness delay
    * survives for them). Feed the `sitemap` column into
    * [[Sitemaps]]-based discovery to seed the crawl frontier. */
  def robotsMeta(robots: DataFrame, userAgent: String,
                 hostCol: String = "host", bodyCol: String = "body"): DataFrame = {
    robots
      .select(col(hostCol).as("host"),
        metaColumn(col(bodyCol), userAgent).as("__m"))
      .select(col("host"), col("__m.crawl_delay").as("crawl_delay"),
        explode_outer(col("__m.sitemaps")).as("sitemap"))
  }

  /** Keep only the pages whose URL path the host's robots rules allow.
    * `pages` carries `urlCol`; `robots` carries (hostCol, bodyCol) one
    * row per host. Pages of hosts with NO robots row are kept (absent
    * robots.txt = allowed, the fetch-side convention). The body parses
    * once per host; the page side joins on its extracted host and the
    * matcher runs in the scan task. */
  def filterByRobots(pages: DataFrame, robots: DataFrame, userAgent: String,
                     urlCol: String = "url", hostCol: String = "host",
                     bodyCol: String = "body"): DataFrame = {
    val matchU = udf((rules: Seq[org.apache.spark.sql.Row], path: String) =>
      rules == null ||
        isAllowed(rules.map(r => Rule(r.getBoolean(0), r.getString(1))), path))
    val parsed = robots.select(col(hostCol).as("__rhost"),
      rulesColumn(col(bodyCol), userAgent).as("__rules"))
    pages
      // null-hygiene (the canonicalCollapse rule): a URL-less page has
      // no host to check a policy for — drop it rather than letting it
      // ride the no-robots-row keep path
      .filter(col(urlCol).isNotNull)
      .withColumn("__phost", graft.operators.Urls.host(col(urlCol)))
      .join(parsed, col("__phost") === col("__rhost"), "left_outer")
      .filter(matchU(col("__rules"),
        udf((u: String) => urlPath(u)).apply(col(urlCol))))
      .drop("__phost", "__rhost", "__rules")
  }
}
