package graft

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.functions._

import graft.sources.{HtmlText, WarcIngest}

/** HTML boilerplate strip + WARC container ingest edge pins
  * (VERDICT r13 Next #1: nested tags, entities, malformed markup,
  * charset sniff; plus the WARC record grammar, gzip members, chunked
  * decode, and the quarantine rules). */
class WebIngestSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- HtmlText.extractText ----------------

  test("strips tags; inline tags join, block tags break") {
    assert(HtmlText.extractText("a<b>b</b>c") === "abc")
    assert(HtmlText.extractText("<p>one</p><p>two</p>") === "one two")
    assert(HtmlText.extractText("x<br>y<hr/>z") === "x y z")
    assert(HtmlText.extractText("<div>a<span>b</span>c</div>") === "abc")
  }

  test("script/style/noscript/template contents dropped, incl fake closes") {
    assert(HtmlText.extractText(
      "<p>a</p><script>var x = \"<p>no</p>\"; if (1<2 && 3>1) f();</script><p>b</p>")
      === "a b")
    assert(HtmlText.extractText(
      "<style>p { color: red; } /* </div> */</style>text") === "text")
    // case-insensitive close, attributes on close tolerated
    assert(HtmlText.extractText("<SCRIPT>x<y</ScRiPt >after") === "after")
    // unclosed raw-text element drops the rest, deterministically
    assert(HtmlText.extractText("before<script>var x = 1;") === "before")
  }

  test("comments, doctype, CDATA, processing instructions dropped") {
    assert(HtmlText.extractText("a<!-- <p>gone</p> -->b") === "ab")
    assert(HtmlText.extractText("a<!-- unterminated") === "a")
    assert(HtmlText.extractText("<!DOCTYPE html><p>x</p>") === "x")
    assert(HtmlText.extractText("<?xml version=\"1.0\"?><p>x</p>") === "x")
  }

  test("entities: named, decimal, hex, supplementary, unknown, bare &") {
    assert(HtmlText.extractText("&amp;&lt;&gt;&quot;&apos;") === "&<>\"'")
    assert(HtmlText.extractText("&#68;&#111;&#99;") === "Doc")
    assert(HtmlText.extractText("&#x44;&#x6F;&#x63;") === "Doc")
    assert(HtmlText.extractText("&#x1F600;") === new String(Character.toChars(0x1F600)))
    assert(HtmlText.extractText("&copy; &mdash; &hellip;") === "© — …")
    // unknown/malformed entities stay literal
    assert(HtmlText.extractText("&notanentity; &amp &#; &#xZZ; a&b") ===
      "&notanentity; &amp &#; &#xZZ; a&b")
    // nbsp participates in whitespace collapse
    assert(HtmlText.extractText("a&nbsp;&nbsp;b") === "a b")
    // NUL / surrogate / out-of-range numeric references → U+FFFD (the
    // HTML spec rule; a lone surrogate would round-trip differently
    // per engine)
    assert(HtmlText.extractText("&#0;&#xD800;&#xDFFF;&#x110000;") ===
      "����")
  }

  test("malformed markup: bare '<', quoted '>', ragged input never throw") {
    assert(HtmlText.extractText("1 < 2 and 2 > 1") === "1 < 2 and 2 > 1")
    assert(HtmlText.extractText("<p data-x=\"a > b\">kept</p>") === "kept")
    assert(HtmlText.extractText("<p data-x='5 > 4'>kept</p>") === "kept")
    assert(HtmlText.extractText("<p unterminated") === "")
    // '</' not followed by a letter is not a close tag — literal text
    assert(HtmlText.extractText("</>text<//>") === "</>text<//>")
    assert(HtmlText.extractText("") === "")
    assert(HtmlText.extractText(null) === "")
  }

  test("whitespace normalization collapses and trims") {
    assert(HtmlText.extractText("  a \n\t b\r\nc  ") === "a b c")
    assert(HtmlText.normalizeWs(" a \f b ") === "a b")
  }

  test("extractBlocks: segmentation, word counts, link density") {
    val html = "<nav><a href=\"/\">Home</a> <a href=\"/x\">More</a></nav>" +
      "<p>real body prose with several words here</p>" +
      "<footer>short <a href=\"/y\">link</a> tail</footer>"
    val bs = HtmlText.extractBlocks(html)
    assert(bs.map(_.text) === Seq("Home More",
      "real body prose with several words here", "short link tail"))
    assert(bs.map(_.words) === Seq(2, 7, 3))
    assert(bs(0).linkDensity > 0.85) // only the inter-anchor space is unlinked
    assert(bs(1).linkDensity === 0.0)
    assert(bs(2).linkDensity > 0.2 && bs(2).linkDensity < 0.5)
    // extractText is DEFINED as the block join — no drift possible
    assert(HtmlText.extractText(html) === bs.map(_.text).mkString(" "))
    // unclosed anchor: density accrues to end of block, never negative
    val open = HtmlText.extractBlocks("<p><a href=x>all linked text here now</a></p>")
    assert(open.head.linkDensity === 1.0)
    assert(HtmlText.extractBlocks("</a>plain</a>").head.linkDensity === 0.0)
  }

  test("mainText: keeps prose blocks, drops short + link-farm boilerplate") {
    val html = "<title>T9</title><nav><a href=\"/\">Home</a></nav>" +
      "<h1>Doc D9</h1><p>one two three four five six</p>" +
      "<footer>© 2026 — graft</footer>"
    assert(HtmlText.mainText(html) === "one two three four five six")
    // minWords boundary: a 5-word block survives, 4-word does not
    assert(HtmlText.mainText("<p>a b c d e</p>") === "a b c d e")
    assert(HtmlText.mainText("<p>a b c d</p>") === "")
    // link density boundary: fully-linked long block dropped
    assert(HtmlText.mainText(
      "<p><a href=x>one two three four five six</a></p>") === "")
  }

  test("mainText neighborhood rule: short blocks between good prose are " +
    "rescued, table- and list-heavy pages keep their data") {
    val prose1 = "opening paragraph with plenty of body words here"
    val prose2 = "closing paragraph also has plenty of body words"
    // TABLE-HEAVY page: every cell is a short block; surrounded by
    // good prose the whole table must survive (a data table inside an
    // article IS content), while the same table alone is boilerplate
    val table = "<table><tr><th>name</th><th>score</th></tr>" +
      "<tr><td>alpha</td><td>97</td></tr>" +
      "<tr><td>beta</td><td>88</td></tr></table>"
    val article = s"<p>$prose1</p>$table<p>$prose2</p>"
    assert(HtmlText.mainText(article) ===
      s"$prose1 name score alpha 97 beta 88 $prose2")
    assert(HtmlText.mainText(table) === "") // no good neighbors: dropped
    // LIST-HEAVY page: items embedded in prose are rescued; a bare
    // nav-like list (edge on one side) is not
    val list = "<ul><li>first item</li><li>second item</li></ul>"
    assert(HtmlText.mainText(s"<p>$prose1</p>$list<p>$prose2</p>") ===
      s"$prose1 first item second item $prose2")
    assert(HtmlText.mainText(s"$list<p>$prose1</p>") === prose1)
    // a BAD (link-farm) block between the prose and the shorts blocks
    // the rescue — the boilerplate frontier is respected
    assert(HtmlText.mainText(
      s"<p>$prose1</p><nav><a href=\"/\">x y z w</a></nav>$list<p>$prose2</p>") ===
      s"$prose1 $prose2")
    // heading directly between two good paragraphs is rescued
    assert(HtmlText.mainText(
      s"<p>$prose1</p><h2>Results</h2><p>$prose2</p>") ===
      s"$prose1 Results $prose2")
  }

  test("canonicalUrl + metaRobots: head metadata extraction") {
    val html = "<html><head>" +
      "<link href=\"https://e.org/canon\" rel=canonical>" +
      "<link rel=\"stylesheet\" href=\"/s.css\">" +
      "<meta name=\"robots\" content=\"NoIndex, nofollow\">" +
      "</head><body>x</body></html>"
    assert(HtmlText.canonicalUrl(html) === Some("https://e.org/canon"))
    assert(HtmlText.metaRobots(html) === Set("noindex", "nofollow"))
    // first canonical wins; attribute order and quoting are free
    val two = "<LINK REL='canonical' HREF='/a'><link rel=canonical href=/b>"
    assert(HtmlText.canonicalUrl(two) === Some("/a"))
    assert(HtmlText.canonicalUrl("<link rel=\"stylesheet\" href=\"/x\">") === None)
    assert(HtmlText.canonicalUrl("<p>no links</p>") === None)
    assert(HtmlText.canonicalUrl(null) === None)
    assert(HtmlText.metaRobots("<meta charset=\"utf-8\">") === Set.empty)
    // quoted '>' inside an attribute does not end the tag
    assert(HtmlText.canonicalUrl(
      "<link data-x=\"a > b\" rel=canonical href=\"/q\">") === Some("/q"))
  }

  test("head metadata ignores comments and script/style raw text " +
    "(a commented-out noindex must not drop the page)") {
    // the extractor already skips these spans; the head scanners must
    // apply the same rules or real crawl pages get false drops
    val commented = "<head><!-- <meta name=\"robots\" content=\"noindex\"> " +
      "<link rel=canonical href=/wrong> --></head>" +
      "<link rel=canonical href=/right>"
    assert(HtmlText.metaRobots(commented) === Set.empty)
    assert(HtmlText.canonicalUrl(commented) === Some("/right"))
    val scripted = "<script>var s = '<meta name=\"robots\" " +
      "content=\"noindex\">';</script>" +
      "<style>/* <link rel=canonical href=/styled> */</style>" +
      "<meta name=robots content=nofollow>"
    assert(HtmlText.metaRobots(scripted) === Set("nofollow"))
    assert(HtmlText.canonicalUrl(scripted) === None)
    // unterminated comment swallows the rest (the extractor rule)
    assert(HtmlText.metaRobots(
      "<!-- <meta name=robots content=noindex>") === Set.empty)
    // a self-closed excluded element does not swallow what follows
    assert(HtmlText.canonicalUrl(
      "<script src=x.js/><link rel=canonical href=/after>") === Some("/after"))
  }

  test("mainText stopword refinement: zero-stopword listing drops, " +
    "neargood resolves by neighbor, empty lexicon == legacy rule") {
    val sw = Set("the", "a", "of", "and", "in")
    // 16 words, 7 lexicon hits -> density 0.4375 >= 0.32 -> GOOD
    val prose =
      "<p>the cat sat on a mat and the dog sat in the hall of fame</p>"
    // 8 words, 0 links, 0 stopwords: the density-only rule KEEPS this
    // (>= 5 words), the refined rule drops it — the refinement's point
    val listing = "<div>products pricing download catalog sitemap " +
      "archive support contact</div>"
    val page = prose + listing
    assert(HtmlText.mainText(page).contains("products"),
      "length-only rule should keep the listing (the gap under test)")
    val refined = HtmlText.mainText(page, stopwords = sw)
    assert(refined.contains("the cat sat") && !refined.contains("products"))
    // NEARGOOD (10 words, 3 hits = 0.30 exactly): promoted beside a
    // good block, demoted when every decided neighbor is bad
    val nearGood =
      "<p>the cat and a dog walked home every single day</p>"
    val besideGood = HtmlText.mainText(prose + nearGood, stopwords = sw)
    assert(besideGood.contains("walked home"),
      "neargood beside good must promote")
    val isolated = HtmlText.mainText(nearGood + listing, stopwords = sw)
    assert(isolated === "", "neargood with only bad neighbors must demote")
    // SHORT rescue consults RESOLVED classes: a heading between good
    // prose and a PROMOTED neargood block survives
    val sandwich = HtmlText.mainText(
      prose + "<h2>heading words</h2>" + nearGood, stopwords = sw)
    assert(sandwich.contains("heading words"))
    // …but not between good prose and a DEMOTED long block
    val sandwichBad = HtmlText.mainText(
      prose + "<h2>heading words</h2>" + listing, stopwords = sw)
    assert(!sandwichBad.contains("heading words"))
    // empty lexicon: EXACTLY the pre-refinement rule (same call path,
    // pinned on the shapes above)
    for (p <- Seq(page, prose + nearGood, nearGood + listing,
        "<p>one two</p>" + prose, ""))
      assert(HtmlText.mainText(p) ===
        HtmlText.mainText(p, stopwords = Set.empty))
  }

  test("headSignals: fused single-pass scan == the two-pass form on " +
    "every signal combination (seeded parity)") {
    // hand-picked shapes covering every (noindex?, canonical?) cell
    // plus the comment/raw-text skip rules
    val pages = Seq(
      "<html><head><link rel=canonical href=/c>" +
        "<meta name=robots content=\"noindex\"></head><body>x</body></html>",
      "<head><meta name=\"robots\" content=\"NoIndex, nofollow\"></head>",
      "<head><link href=\"https://e.org/canon\" rel=canonical></head>",
      "<LINK REL='canonical' HREF='/a'><link rel=canonical href=/b>",
      "<meta name=robots content=nofollow><link rel=stylesheet href=/s>",
      "<!-- <meta name=robots content=noindex> --><link rel=canonical href=/r>",
      "<script>var s='<meta name=\"robots\" content=\"noindex\">';</script>",
      "<p>nothing here</p>", "", null,
      "<link data-x=\"a > b\" rel=canonical href=\"/q\">" +
        "<meta name=robots content=\"none,noindex\">")
    pages.foreach { h =>
      val (noindex, canon) = HtmlText.headSignals(h)
      assert(noindex ===
        (if (h == null) false else HtmlText.metaRobots(h).contains("noindex")),
        s"noindex diverged on: $h")
      // two-pass canonical compares only when the page SURVIVES — the
      // fused scan stops early on noindex (the page is dropped
      // regardless of its canonical), so parity is over kept pages
      if (!noindex)
        assert(canon === HtmlText.canonicalUrl(h), s"canonical diverged on: $h")
    }
    // regression (found by this fuzz): attribute soup whose token
    // starts with '='/'>' (a quoted-junk "attribute" with no name)
    // must terminate, not stall the scanner — real crawls hit
    // adversarial markup
    assert(HtmlText.canonicalUrl(
      "<link \"a > b\" rel=canonical href=/q>") === Some("/q"))
    assert(HtmlText.headSignals("<meta \"= >\" name=robots content=noindex>")
      ._1 === true)
    // seeded fuzz: random tag soup, same parity contract
    val rnd = new scala.util.Random(11)
    val frags = Seq("<meta name=robots ", "content=\"noindex\"", "<link ",
      "rel=canonical ", "href=/x", ">", "<!--", "-->", "<script>", "</script>",
      " text ", "\"", "'", "content=nofollow ", "<p>", "rel=stylesheet ")
    (0 until 500).foreach { _ =>
      val h = (0 until rnd.nextInt(12)).map(_ => frags(rnd.nextInt(frags.length))).mkString
      val (noindex, canon) = HtmlText.headSignals(h)
      assert(noindex === HtmlText.metaRobots(h).contains("noindex"), s"on: $h")
      if (!noindex) assert(canon === HtmlText.canonicalUrl(h), s"on: $h")
    }
  }

  test("fuzz: extractText/extractBlocks/mainText/canonicalUrl never throw, " +
    "normalization idempotent (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab <>&;/\"'=!-#xD8p" + "\t\n\r\f"
    (0 until 2000).foreach { _ =>
      val s = (0 until rnd.nextInt(80))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val t = HtmlText.extractText(s)
      assert(t === HtmlText.normalizeWs(t)) // output is normal form
      HtmlText.extractBlocks(s).foreach { b =>
        assert(b.linkDensity >= 0.0 && b.linkDensity <= 1.0)
        assert(b.words >= 1) // empty blocks are never emitted
      }
      HtmlText.mainText(s)
      HtmlText.canonicalUrl(s)
      HtmlText.metaRobots(s)
    }
  }

  // ---------------- charset sniffing ----------------

  test("sniffCharset precedence: BOM > header > meta > utf-8") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "<meta charset=\"euc-kr\">x".getBytes("UTF-8")
    assert(HtmlText.sniffCharset(bom, Some("text/html; charset=iso-8859-1"))
      === StandardCharsets.UTF_8)
    val plain = "<html><body>x</body></html>".getBytes("UTF-8")
    assert(HtmlText.sniffCharset(plain, Some("text/html; charset=ISO-8859-1"))
      === StandardCharsets.ISO_8859_1)
    val meta = "<html><head><meta charset=euc-kr></head></html>".getBytes("UTF-8")
    assert(HtmlText.sniffCharset(meta, Some("text/html"))
      === Charset.forName("EUC-KR"))
    val metaHttpEquiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=utf-16le\">").getBytes("UTF-8")
    assert(HtmlText.sniffCharset(metaHttpEquiv, None) === StandardCharsets.UTF_16LE)
    assert(HtmlText.sniffCharset("plain".getBytes, None) === StandardCharsets.UTF_8)
    // unsupported charset names fall through to the default
    assert(HtmlText.sniffCharset(plain, Some("text/html; charset=bogus-enc"))
      === StandardCharsets.UTF_8)
  }

  test("decode: EUC-KR via meta tag round-trips; BOM stripped") {
    val kr = "한국어 본문"
    val html = s"""<html><head><meta charset="euc-kr"></head><body>$kr</body></html>"""
    val bytes = html.getBytes(Charset.forName("EUC-KR"))
    assert(HtmlText.extractText(HtmlText.decode(bytes, Some("text/html"))) === kr)
    val withBom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "abc".getBytes("UTF-8")
    assert(HtmlText.decode(withBom, None) === "abc")
    // header-declared UTF-16 WITHOUT a BOM keeps its first character
    val noBom16 = "<p>x</p>".getBytes(StandardCharsets.UTF_16LE)
    assert(HtmlText.decode(noBom16, Some("text/html; charset=utf-16le"))
      === "<p>x</p>")
    // with a BOM, the BOM (and only the BOM) is stripped
    val bom16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++ noBom16
    assert(HtmlText.decode(bom16, Some("text/html; charset=utf-16le"))
      === "<p>x</p>")
  }

  test("meta prescan is scoped to meta tags and to HTML payloads") {
    // 'charset=' inside an href must NOT hijack the decode
    val href = "<a href=\"/conv?charset=iso-8859-1\">x</a>".getBytes("UTF-8")
    assert(HtmlText.sniffCharset(href, Some("text/html"))
      === StandardCharsets.UTF_8)
    // a text/plain body MENTIONING a charset is content, not a
    // declaration — extractRecord disables the prescan
    val mention = "use <meta charset=euc-kr> in your header".getBytes("UTF-8")
    assert(HtmlText.sniffCharset(mention, Some("text/plain"),
      htmlPrescan = false) === StandardCharsets.UTF_8)
    val wet = mkRecord("conversion", "http://w", "text/plain", mention)
    assert(WarcIngest.extractRecord(WarcIngest.parseRecords(wet).head)
      === Right("use <meta charset=euc-kr> in your header"))
  }

  // ---------------- WARC parsing ----------------

  private def mkRecord(recType: String, uri: String, ct: String,
                       block: Array[Byte]): Array[Byte] = {
    val h = s"WARC/1.0\r\nWARC-Type: $recType\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n"
    h.getBytes(StandardCharsets.UTF_8) ++ block ++ "\r\n\r\n".getBytes
  }

  private def httpOk(ct: String, body: Array[Byte],
                     extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val h = new StringBuilder("HTTP/1.1 200 OK\r\n")
    (Seq("Content-Type" -> ct) ++ extra).foreach { case (k, v) =>
      h.append(k).append(": ").append(v).append("\r\n") }
    h.append("\r\n")
    h.toString.getBytes(StandardCharsets.UTF_8) ++ body
  }

  test("parseRecords: response + conversion round-trip, plain and gzip") {
    val html = "<p>hello web</p>".getBytes("UTF-8")
    val plainWarc =
      mkRecord("response", "http://a", "application/http; msgtype=response",
        httpOk("text/html; charset=utf-8", html)) ++
      mkRecord("conversion", "http://b", "text/plain", "wet text".getBytes("UTF-8"))
    val rs = WarcIngest.parseRecords(plainWarc)
    assert(rs.map(_.recType) === Seq("response", "conversion"))
    assert(rs.head.httpStatus === 200)
    assert(rs.head.httpContentType === "text/html; charset=utf-8")
    assert(WarcIngest.extractRecord(rs.head) === Right("hello web"))
    assert(WarcIngest.extractRecord(rs(1)) === Right("wet text"))
    // gzip: one member per record (the Common Crawl layout)
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    val gzWarc = gz(mkRecord("response", "http://a",
      "application/http; msgtype=response",
      httpOk("text/html", html))) ++
      gz(mkRecord("conversion", "http://b", "text/plain", "wet text".getBytes))
    val rs2 = WarcIngest.parseRecords(gzWarc)
    assert(rs2.map(_.recType) === Seq("response", "conversion"))
  }

  test("parseRecords: truncated tail quarantined, clean prefix kept") {
    val good = mkRecord("conversion", "http://a", "text/plain", "ok".getBytes)
    val truncated = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 999\r\n\r\nshort"
      .getBytes(StandardCharsets.UTF_8)
    val rs = WarcIngest.parseRecords(good ++ truncated)
    assert(rs.length === 1)
    assert(WarcIngest.extractRecord(rs.head) === Right("ok"))
    assert(WarcIngest.parseRecords("garbage not warc".getBytes).isEmpty)
  }

  test("chunked transfer-encoding is de-chunked") {
    val body = "<p>chunk one two</p>"
    val chunked = ("9\r\n" + body.substring(0, 9) + "\r\n" +
      Integer.toHexString(body.length - 9) + "\r\n" + body.substring(9) +
      "\r\n0\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val rec = mkRecord("response", "http://c",
      "application/http; msgtype=response",
      httpOk("text/html", chunked, Seq("Transfer-Encoding" -> "chunked")))
    val rs = WarcIngest.parseRecords(rec)
    assert(rs.length === 1)
    assert(WarcIngest.extractRecord(rs.head) === Right("chunk one two"))
  }

  test("extractRecord dispatch: status >= 400, non-html mime, bookkeeping") {
    val err = mkRecord("response", "http://e",
      "application/http; msgtype=response",
      ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>gone</p>")
        .getBytes(StandardCharsets.UTF_8))
    assert(WarcIngest.extractRecord(WarcIngest.parseRecords(err).head)
      === Left("http status 404"))
    val gif = mkRecord("response", "http://g",
      "application/http; msgtype=response",
      httpOk("image/gif", Array[Byte](0x47, 0x49)))
    assert(WarcIngest.extractRecord(WarcIngest.parseRecords(gif).head)
      === Left("unsupported mime: image/gif"))
    val info = mkRecord("warcinfo", "", "application/warc-fields",
      "software: x\r\n".getBytes)
    assert(WarcIngest.extractRecord(WarcIngest.parseRecords(info).head)
      === Left("non-content record type: warcinfo"))
  }

  test("writeWet round-trip: exported WET segments re-ingest unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("wet").toFile
    try {
      val docs = Seq(
        ("https://e.org/1", "alpha beta gamma"),
        ("https://e.org/2", "second doc text"),
        ("https://e.org/3", null.asInstanceOf[String]), // skipped: no payload
        ("https://e.org/4", "fourth one")
      ).toDF("uri", "text").repartition(2)
      WarcIngest.writeWet(docs, "uri", "text", tmp.getAbsolutePath)
      val back = WarcIngest.ingestWarcs(
          spark.read.format("binaryFile").load(tmp.getAbsolutePath))
        .select(col("rec_type"), col("target_uri"), col("ok"), col("text"))
        .collect()
      assert(back.forall(_.getString(0) === "conversion"))
      assert(back.forall(_.getBoolean(2)))
      val got = back.map(r => r.getString(1) -> r.getString(3)).toMap
      assert(got === Map("https://e.org/1" -> "alpha beta gamma",
        "https://e.org/2" -> "second doc text",
        "https://e.org/4" -> "fourth one"))
      // the segments are per-record gzip members readable standalone
      val seg = new java.io.File(tmp, tmp.list().filter(_.endsWith(".warc.gz")).head)
      val bytes = java.nio.file.Files.readAllBytes(seg.toPath)
      assert((bytes(0) & 0xff) === 0x1f && (bytes(1) & 0xff) === 0x8b)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(tmp)
    }
  }

  test("writeWet re-run cleans stale segments and orphaned temp files") {
    withTempDir("wet-rerun") { tmp =>
      val wide = Seq.tabulate(4)(i => (s"https://e.org/$i", s"doc $i"))
        .toDF("uri", "text").repartition(4)
      WarcIngest.writeWet(wide, "uri", "text", tmp.getAbsolutePath)
      // simulate an orphaned temp from a lost attempt
      val orphan = new java.io.File(tmp, "_tmp-part-00002-attempt-99.warc.gz")
      java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
      // re-run with FEWER partitions: stale part-0000{2,3} from the
      // first run must not survive for directory readers to mix in
      val narrow = Seq(("https://e.org/a", "only doc"))
        .toDF("uri", "text").repartition(1)
      WarcIngest.writeWet(narrow, "uri", "text", tmp.getAbsolutePath)
      // ignore the local-FS checksum sidecars (".…crc"), invisible to
      // readers; the visible directory must hold ONLY the new segment
      val files = tmp.list().filterNot(_.startsWith(".")).sorted.toSeq
      assert(files === Seq("part-00000.warc.gz"), files.toString)
      val back = WarcIngest.ingestWarcs(
          spark.read.format("binaryFile").load(tmp.getAbsolutePath))
        .select(col("target_uri")).as[String].collect().toSeq
      assert(back === Seq("https://e.org/a"))
    }
  }

  test("ingestWarcs + warcStatus: lattice over content records only") {
    val warc =
      mkRecord("warcinfo", "", "application/warc-fields", "s: x\r\n".getBytes) ++
      mkRecord("response", "http://a", "application/http; msgtype=response",
        httpOk("text/html", "<p>a</p>".getBytes)) ++
      mkRecord("response", "http://g", "application/http; msgtype=response",
        httpOk("image/gif", Array[Byte](1, 2))) ++
      mkRecord("conversion", "http://w", "text/plain", "wet".getBytes)
    val bin = Seq(("mem://t.warc", warc)).toDF("path", "content")
    val ing = WarcIngest.ingestWarcs(bin)
    assert(ing.count() === 4)
    assert(ing.filter(col("ok")).count() === 2)
    val st = WarcIngest.warcStatus(ing).collect()
    assert(st.length === 1)
    assert(st.head.getAs[String]("status") === "partial_success")
    assert(st.head.getAs[Long]("n_members") === 3) // warcinfo excluded
    assert(st.head.getAs[Long]("n_ok") === 2)
  }
}
