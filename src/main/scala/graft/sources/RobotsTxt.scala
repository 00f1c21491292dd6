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
  *  - `#` comments, blank lines, unknown fields (Sitemap, Crawl-delay)
  *    and case-insensitive field names are tolerated.
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

  /** Parse a robots.txt body and return the rules of the group that
    * governs `userAgent` (RFC 9309 group selection — longest matching
    * user-agent token, `*` as fallback). Never throws: an unparseable
    * body yields no rules, i.e. everything allowed. */
  def parse(body: String, userAgent: String): Seq[Rule] = {
    if (body == null) return Seq.empty
    val ua = userAgent.toLowerCase
    // group accumulation: (uaTokens, rules) per group
    val groups = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var curUas: scala.collection.mutable.ArrayBuffer[String] = null
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
            if (!inUaRun || curUas == null) {
              curUas = scala.collection.mutable.ArrayBuffer.empty[String]
              groups += ((curUas, scala.collection.mutable.ArrayBuffer.empty[Rule]))
            }
            curUas += value.toLowerCase
            inUaRun = true
          case "allow" | "disallow" =>
            inUaRun = false
            // rules before any User-agent line have no group: ignored
            // (the RFC treats them as belonging to no group)
            if (groups.nonEmpty) {
              // empty Disallow value = "allow everything" = no rule;
              // empty Allow value is equally vacuous
              if (value.nonEmpty)
                groups.last._2 += Rule(field == "allow", value)
            }
          case _ => inUaRun = false // Sitemap, Crawl-delay, unknown
        }
      } else if (line.nonEmpty) inUaRun = false
    }
    // group selection: longest ua token that is a prefix of OUR token
    // (RFC: match the product token, most specific group governs);
    // '*' only when nothing specific matched
    var bestLen = -1
    var best: Seq[Rule] = Seq.empty
    var starSeen = false
    var star: Seq[Rule] = Seq.empty
    groups.foreach { case (uas, rules) =>
      uas.foreach { tok =>
        if (tok == "*") {
          // first * group wins among * groups (RFC: combine is
          // permitted but first-match is the common interpretation)
          if (!starSeen) { star = rules.toSeq; starSeen = true }
        } else if (ua.startsWith(tok) && tok.length > bestLen) {
          bestLen = tok.length
          best = rules.toSeq
        }
      }
    }
    if (bestLen >= 0) best else star
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
