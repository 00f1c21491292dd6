package graft.sources

import java.nio.charset.StandardCharsets

/** Pure-JVM `.docx` text extraction (SURVEY §2.B1 tail) — the Spark-side
  * equivalent of the reference's `UnstructuredWordDocumentLoader` branch
  * (document_processor.py:48-50). A docx is a zip whose main part is
  * `word/document.xml`; visible text lives in `<w:t>` runs, with
  * paragraphs (`</w:p>`), line breaks (`<w:br/>`) and tabs (`<w:tab/>`)
  * as the only structure a text loader surfaces. The zip walk reuses
  * [[ZipIngest.explodeZip]].
  */
object DocxText {

  private val TextRun = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>".r
  private val NumericEntity = "&#(x?)([0-9a-fA-F]+);".r

  def isDocx(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      ZipIngest.explodeZip(bytes).exists(_._1 == "word/document.xml")

  def extract(bytes: Array[Byte]): Either[String, String] = {
    val members = ZipIngest.explodeZip(bytes)
    members.find(_._1 == "word/document.xml") match {
      case None => Left("Not a DOCX (missing word/document.xml)")
      case Some((_, xmlBytes)) =>
        val xml = new String(xmlBytes, StandardCharsets.UTF_8)
        val text = extractFromDocumentXml(xml)
        if (text.isEmpty) Left("No text in DOCX body") else Right(text)
    }
  }

  /** Paragraph-preserving text from the document.xml body: one output
    * line per `<w:p>`, `<w:br/>`/`<w:tab/>` surfaced as newline/tab. */
  private[sources] def extractFromDocumentXml(xml: String): String = {
    val body = xml
      // surface break/tab elements as synthetic runs so one pass collects
      // them; br/cr may carry attributes (<w:br w:type="page"/>) or be
      // written as open+close pairs. <w:tab/> stays attribute-free to
      // avoid matching tab-stop DEFINITIONS (<w:tab w:val=... w:pos=...>
      // inside <w:tabs>), which are layout config, not text.
      .replaceAll("<w:(?:br|cr)\\b[^>]*?/>", "<w:t>\n</w:t>")
      .replaceAll("<w:(br|cr)\\b[^>]*>\\s*</w:\\1>", "<w:t>\n</w:t>")
      .replaceAll("<w:tab\\s*/>", "<w:t>\t</w:t>")
    val lines = body.split("</w:p>").iterator
      .map(p => TextRun.findAllMatchIn(p).map(m => unescapeXml(m.group(1))).mkString)
      .filter(_.nonEmpty)
    lines.mkString("\n").replaceAll("\\n{3,}", "\n\n").trim
  }

  /** XML entity decode: numeric first, `&amp;` last, so `&amp;#65;`
    * stays the literal `&#65;`. */
  private[sources] def unescapeXml(s: String): String = {
    val numeric = NumericEntity.replaceAllIn(s, m => {
      val cp =
        try Integer.parseInt(m.group(2), if (m.group(1).nonEmpty) 16 else 10)
        catch { case _: NumberFormatException => '?'.toInt }
      val safe = if (Character.isValidCodePoint(cp)) cp else '?'.toInt
      java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(safe)))
    })
    numeric
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
  }
}
