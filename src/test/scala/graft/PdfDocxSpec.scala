package graft

import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.sources.{DocxText, PdfSamples, PdfText, ZipIngest}

/** B1 loader fidelity: pure-JVM PDF + DOCX text extraction. */
class PdfDocxSpec extends SparkSpec {
  import spark.implicits._

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  /** Minimal one-page PDF whose content stream is `content`. */
  private def makePdf(content: String, compress: Boolean = true): Array[Byte] = {
    val raw = content.getBytes("ISO-8859-1")
    val data = if (compress) deflate(raw) else raw
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${data.length}$filter >>\nstream\n")
    bos.write(data)
    w("\nendstream\nendobj\n%%EOF\n")
    bos.toByteArray
  }

  private def makeDocx(documentXml: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("[Content_Types].xml"))
    zos.write("<Types/>".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(documentXml.getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  test("PdfText: Flate-compressed content stream round-trips") {
    val pdf = makePdf("BT /F1 12 Tf 72 720 Td (Hello) Tj ET\n" +
      "BT 72 700 Td [(Wor) -50 (ld) -300 (again)] TJ ET")
    assert(PdfText.extract(pdf) === Right("Hello\nWorld again"))
  }

  test("PdfText: uncompressed stream, ' and \" line-show operators") {
    val pdf = makePdf("BT (first) Tj (second) ' (third) \" ET", compress = false)
    assert(PdfText.extract(pdf) === Right("first\nsecond\nthird"))
  }

  test("PdfText: string escape grammar — octal, nesting, escaped parens") {
    val pdf = makePdf("BT (A\\101B) Tj ( ) Tj (a(b)c) Tj ( ) Tj (x\\(y\\)z) Tj ET")
    assert(PdfText.extract(pdf) === Right("AAB a(b)c x(y)z"))
  }

  test("PdfText: hex strings, including UTF-16BE BOM-tagged") {
    val pdf = makePdf("BT <48656C6C6F> Tj ( ) Tj <FEFFD55CAD6D> Tj ET")
    assert(PdfText.extract(pdf) === Right("Hello 한국"))
  }

  test("PdfText: TJ kerning — small kerns join, word gaps separate") {
    val pdf = makePdf("BT [(V) -40 (A) -500 (W)] TJ ET")
    assert(PdfText.extract(pdf) === Right("VA W"))
  }

  test("PdfText: non-PDF and empty-content degrade to Left") {
    assert(PdfText.extract("plain text".getBytes("UTF-8")).isLeft)
    assert(PdfText.extract(Array[Byte]()).isLeft)
    // valid header but no text operators
    val pdf = makePdf("0 0 612 792 re f")
    assert(PdfText.extract(pdf).isLeft)
  }

  test("PdfText: truncated Flate stream keeps the clean prefix") {
    val full = makePdf("BT (recoverable text here) Tj ET")
    // chop the last 200 bytes: endstream vanishes -> stream skipped, Left;
    // this must not throw
    val chopped = full.take(full.length - 12)
    PdfText.extract(chopped) // no exception = pass
  }

  test("PdfText: composite-font glyph-index strings are skipped, not garbage") {
    // Identity-H show strings carry 2-byte glyph ids (<0003004F...>);
    // without the CMap they must be dropped entirely
    val pdf = makePdf("BT <00030048004F> Tj (real text) Tj ET")
    assert(PdfText.extract(pdf) === Right("real text"))
    // a PDF with ONLY glyph-index text yields Left, not gibberish
    val allGlyphs = makePdf("BT <00030048004F> Tj <00260051> Tj ET")
    assert(PdfText.extract(allGlyphs).isLeft)
  }

  test("PdfText: parseCMap — bfchar, bfrange increment + array forms, codespace width") {
    val cm = PdfText.parseCMap(
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0003> <0020>
        |<0048> <D55C>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0021> [<00660066> <AC00>]
        |endbfrange
        |endcmap
        |""".stripMargin)
    assert(cm.codeBytes === 2)
    assert(cm.map(0x0003) === " ")
    assert(cm.map(0x0048) === "한")
    assert(cm.map(0x0010) === "a" && cm.map(0x0011) === "b" && cm.map(0x0012) === "c")
    assert(cm.map(0x0020) === "ff") // multi-unit destination (ligature)
    assert(cm.map(0x0021) === "가")
    // 1-byte codespace
    val cm1 = PdfText.parseCMap(
      "begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfchar\n<41> <0041>\nendbfchar\nendcmap")
    assert(cm1.codeBytes === 1)
    assert(cm1.decode(Array[Byte](0x41)) === "A")
  }

  test("PdfText: parseCMap — corrupt oversized bfrange is capped, not OOM") {
    val cm = PdfText.parseCMap(
      "1 beginbfrange\n<0000> <FFFFFF> <0041>\nendbfrange\nendcmap")
    assert(cm.map.size <= 65536 + 1)
    assert(cm.map(0) === "A")
  }

  test("PdfText: Identity-H + ToUnicode CMap round-trips Korean text") {
    val text = "한국어 PDF 문서의 텍스트 추출 검증"
    assert(PdfText.extract(PdfSamples.identityHSample(text)) === Right(text))
  }

  test("PdfText: Tf switches fonts — CMap'd and simple strings coexist") {
    val cmap = PdfSamples.toUnicodeCMap(Seq(3 -> "한", 4 -> "글"))
    val pdf = PdfSamples.identityHPdf(cmap,
      "BT /F1 12 Tf <00030004> Tj /F9 12 Tf ( and latin) Tj ET")
    // F9 is not a CMap'd resource → falls back to the simple-font decode
    assert(PdfText.extract(pdf) === Right("한글 and latin"))
  }

  test("PdfText: split /Contents, indirect /Resources, decoy headers in stream bytes") {
    // Tf lands in content stream A, the show string in stream B — the
    // font state must survive the stream boundary (ISO 32000 treats a
    // /Contents array as one concatenated stream); resources resolve
    // through an indirect dict; and a decoy stream body containing
    // "10 0 obj ... /F1 99 0 R" must not shadow the real bindings
    val text = "한글 상태 유지"
    assert(PdfText.extract(PdfSamples.identityHSplitSample(text)) === Right(text))
  }

  test("PdfText: two pages binding /F1 to different fonts decode page-scoped") {
    // both pages reuse glyph ids 3,4,... — global first-wins binding
    // would decode page 2 as page 1's characters
    val pdf = PdfSamples.twoPageConflictingF1("한국어 문서", "일본어 자료")
    assert(PdfText.extract(pdf) === Right("한국어 문서\n일본어 자료"))
  }

  test("PdfText: operand/operator split across streams, no fabricated line break") {
    val cmap = PdfSamples.toUnicodeCMap(Seq(3 -> "한", 4 -> "글"))
    // ISO 32000 allows the /Contents division to fall between an operand
    // and its operator: string in stream A, Tj in stream B
    val pdf = PdfSamples.identityHPdfSplit(cmap, "BT /F1 12 Tf <00030004>", "Tj ET")
    assert(PdfText.extract(pdf) === Right("한글"))
    // text continuing across the boundary with no line operator must not
    // acquire a newline
    val pdf2 = PdfSamples.identityHPdfSplit(cmap, "BT /F1 12 Tf <0003> Tj", "<0004> Tj ET")
    assert(PdfText.extract(pdf2) === Right("한글"))
  }

  test("PdfText: CMap'd font drops unmapped glyph ids instead of emitting garbage") {
    val cmap = PdfSamples.toUnicodeCMap(Seq(3 -> "가"))
    val pdf = PdfSamples.identityHPdf(cmap, "BT /F1 12 Tf <000300FF0003> Tj ET")
    assert(PdfText.extract(pdf) === Right("가가"))
  }

  test("DocxText: br with attributes, open/close form, and cr all break lines") {
    val xml = "<w:document><w:body><w:p><w:r>" +
      "<w:t>end of page1</w:t><w:br w:type=\"page\"/><w:t>Heading2</w:t>" +
      "<w:br></w:br><w:t>third</w:t><w:cr/><w:t>fourth</w:t>" +
      "</w:r></w:p></w:body></w:document>"
    assert(DocxText.extract(makeDocx(xml)) ===
      Right("end of page1\nHeading2\nthird\nfourth"))
  }

  test("DocxText: paragraphs, runs, entities, br and tab") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body>
        |<w:p><w:r><w:t>First para</w:t></w:r></w:p>
        |<w:p><w:r><w:t xml:space="preserve">A &amp; B</w:t></w:r><w:r><w:t xml:space="preserve"> &#x48;&#105;</w:t></w:r></w:p>
        |<w:p><w:r><w:t>line1</w:t><w:br/><w:t>line2</w:t><w:tab/><w:t>after-tab</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    assert(DocxText.extract(makeDocx(xml)) ===
      Right("First para\nA & B Hi\nline1\nline2\tafter-tab"))
  }

  test("DocxText: non-docx inputs degrade to Left") {
    assert(DocxText.extract(Array[Byte]()).isLeft)
    assert(DocxText.extract("not a zip".getBytes("UTF-8")).isLeft)
    // a zip without word/document.xml
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("other.txt")); zos.write(1); zos.closeEntry(); zos.close()
    assert(DocxText.extract(bos.toByteArray).isLeft)
  }

  test("parseDocument: full dispatch surface (.md/.markdown/.pdf/.docx)") {
    assert(ZipIngest.parseDocument("n.md", "# h\nbody".getBytes("UTF-8")) === Right("# h\nbody"))
    assert(ZipIngest.parseDocument("n.markdown", "x".getBytes("UTF-8")) === Right("x"))
    assert(ZipIngest.parseDocument("n.pdf",
      makePdf("BT (from pdf) Tj ET")) === Right("from pdf"))
    val xml = "<w:document><w:body><w:p><w:r><w:t>from docx</w:t></w:r></w:p></w:body></w:document>"
    assert(ZipIngest.parseDocument("n.docx", makeDocx(xml)) === Right("from docx"))
    // legacy .doc routes to the docx parser and degrades to Left cleanly
    assert(ZipIngest.parseDocument("n.doc", "old binary".getBytes("UTF-8")).isLeft)
    assert(ZipIngest.parseDocument("n.csv", "a,b".getBytes("UTF-8")).isLeft)
  }

  test("ingestZips: pdf/docx/md members flow end-to-end with real text") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def add(name: String, bytes: Array[Byte]): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    }
    add("a.pdf", makePdf("BT (pdf body text) Tj ET"))
    add("b.docx", makeDocx(
      "<w:document><w:body><w:p><w:r><w:t>docx body</w:t></w:r></w:p></w:body></w:document>"))
    add("c.md", "md body".getBytes("UTF-8"))
    add("d.xyz", Array[Byte](1, 2))
    zos.close()
    val bin = Seq(("mem://mixed.zip", bos.toByteArray)).toDF("path", "content")
    val rows = ZipIngest.ingestZips(bin).orderBy($"member_name")
      .select($"member_name", $"ok", $"text").as[(String, Boolean, String)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      Seq(("a.pdf", true), ("b.docx", true), ("c.md", true), ("d.xyz", false)))
    assert(rows(0)._3 === "pdf body text")
    assert(rows(1)._3 === "docx body")
    assert(rows(2)._3 === "md body")
  }
}
