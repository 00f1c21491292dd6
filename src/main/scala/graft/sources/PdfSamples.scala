package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Fixture-grade assembly of composite-font (Type0 / Identity-H) PDFs —
  * the encoding real Korean Word/HWP-exported PDFs use (the reference's
  * domain, document_processor.py:111-117). Used by PdfDocxSpec and by
  * the self-contained `b2_zip_ingest` gate query so the ToUnicode CMap
  * path in [[PdfText]] is exercised end-to-end, not just in unit tests.
  *
  * The emitted files are valid headerless-xref PDFs for readers that
  * scan objects sequentially (as [[PdfText]] does); they are fixtures,
  * not a general-purpose PDF writer.
  */
object PdfSamples {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  /** ToUnicode CMap text from explicit code→string pairs plus optional
    * incrementing ranges (lo, hi, dstStart). */
  def toUnicodeCMap(bfchars: Seq[(Int, String)],
                    bfranges: Seq[(Int, Int, String)] = Nil): String = {
    def hexOf(s: String): String = s.map(ch => f"${ch.toInt}%04X").mkString
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    if (bfchars.nonEmpty) {
      sb.append(s"${bfchars.size} beginbfchar\n")
      bfchars.foreach { case (c, s) => sb.append(f"<$c%04X> <${hexOf(s)}>%n") }
      sb.append("endbfchar\n")
    }
    if (bfranges.nonEmpty) {
      sb.append(s"${bfranges.size} beginbfrange\n")
      bfranges.foreach { case (lo, hi, dst) =>
        sb.append(f"<$lo%04X> <$hi%04X> <${hexOf(dst)}>%n")
      }
      sb.append("endbfrange\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString
  }

  /** One-page PDF with a single Identity-H font `/F1` carrying the given
    * ToUnicode CMap (Flate-compressed, as real writers emit it); the
    * content stream body is caller-supplied operator text. */
  def identityHPdf(cmapText: String, contentOps: String): Array[Byte] = {
    val content = contentOps.getBytes(StandardCharsets.ISO_8859_1)
    val cmap = deflate(cmapText.getBytes(StandardCharsets.ISO_8859_1))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >>\nstream\n")
    bos.write(content)
    w("\nendstream\nendobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /NotoSansKR " +
      "/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${cmap.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(cmap)
    w("\nendstream\nendobj\n")
    w("7 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /NotoSansKR " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >> endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** An Identity-H PDF showing `text` through a generated CMap: each
    * distinct character gets a synthetic glyph id (3, 4, ...), exactly
    * how subset-embedded Korean fonts look in the wild. */
  def identityHSample(text: String): Array[Byte] = {
    val (cmap, hex) = textToCMapAndHex(text)
    identityHPdf(cmap, s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET")
  }

  private def textToCMapAndHex(text: String): (String, String) = {
    val glyphOf = text.distinct.zipWithIndex.map { case (ch, i) => ch -> (i + 3) }.toMap
    val cmap = toUnicodeCMap(glyphOf.toSeq.sortBy(_._2).map { case (ch, g) => g -> ch.toString })
    (cmap, text.map(ch => f"${glyphOf(ch)}%04X").mkString)
  }

  /** The adversarial layout real writers produce: /Contents split across
    * TWO streams (Tf in the first, show strings in the second — font
    * state must survive the boundary), font resources reached through an
    * INDIRECT /Resources dict, and an optional decoy stream whose body
    * mimics object headers (the header scan must mask stream spans or a
    * phantom object shadows the real one). */
  def identityHPdfSplit(cmapText: String, contentOpsA: String, contentOpsB: String,
                        decoy: Option[String] = None): Array[Byte] = {
    val a = contentOpsA.getBytes(StandardCharsets.ISO_8859_1)
    val b = contentOpsB.getBytes(StandardCharsets.ISO_8859_1)
    val cmap = deflate(cmapText.getBytes(StandardCharsets.ISO_8859_1))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources 10 0 R /Contents [4 0 R 8 0 R] >> endobj\n")
    decoy.foreach { d =>
      w(s"11 0 obj << /Length ${d.length} >>\nstream\n")
      w(d)
      w("\nendstream\nendobj\n")
    }
    w(s"4 0 obj << /Length ${a.length} >>\nstream\n")
    bos.write(a)
    w("\nendstream\nendobj\n")
    w(s"8 0 obj << /Length ${b.length} >>\nstream\n")
    bos.write(b)
    w("\nendstream\nendobj\n")
    w("10 0 obj << /Font << /F1 5 0 R >> >> endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /NotoSansKR " +
      "/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${cmap.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(cmap)
    w("\nendstream\nendobj\n")
    w("7 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /NotoSansKR >> endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** Two pages that BOTH name their font `/F1` but bind it to different
    * Type0 fonts with different ToUnicode CMaps — the layout that
    * breaks document-global (first-wins) name resolution and requires
    * page-scoped /Resources handling. Both pages reuse the same glyph
    * ids (3, 4, ...), so decoding page 2 through page 1's CMap yields
    * page 1's characters: the test is unambiguous. */
  def twoPageConflictingF1(textA: String, textB: String): Array[Byte] = {
    val (cmapA, hexA) = textToCMapAndHex(textA)
    val (cmapB, hexB) = textToCMapAndHex(textB)
    val a = s"BT /F1 12 Tf 72 720 Td <$hexA> Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val b = s"BT /F1 12 Tf 72 720 Td <$hexB> Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val ca = deflate(cmapA.getBytes(StandardCharsets.ISO_8859_1))
    val cb = deflate(cmapB.getBytes(StandardCharsets.ISO_8859_1))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 13 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${a.length} >>\nstream\n"); bos.write(a); w("\nendstream\nendobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /FontA " +
      "/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${ca.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(ca); w("\nendstream\nendobj\n")
    w("7 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /FontA >> endobj\n")
    w("13 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 15 0 R >> >> /Contents 14 0 R >> endobj\n")
    w(s"14 0 obj << /Length ${b.length} >>\nstream\n"); bos.write(b); w("\nendstream\nendobj\n")
    w("15 0 obj << /Type /Font /Subtype /Type0 /BaseFont /FontB " +
      "/Encoding /Identity-H /DescendantFonts [17 0 R] /ToUnicode 16 0 R >> endobj\n")
    w(s"16 0 obj << /Length ${cb.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(cb); w("\nendstream\nendobj\n")
    w("17 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /FontB >> endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** Split/indirect/decoy sample carrying `text` (see [[identityHPdfSplit]]). */
  def identityHSplitSample(text: String): Array[Byte] = {
    val (cmap, hex) = textToCMapAndHex(text)
    identityHPdfSplit(cmap,
      "BT /F1 12 Tf 72 720 Td",
      s"<$hex> Tj ET",
      decoy = Some("10 0 obj << /Font << /F1 99 0 R >> >>"))
  }

  /** The Korean demo document used by the b2 gate zip. */
  def koreanIdentityH: Array[Byte] =
    identityHSample("한국어 PDF 문서의 텍스트 추출 검증")
}
