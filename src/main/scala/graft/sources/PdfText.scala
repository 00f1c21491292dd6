package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM PDF text extraction (SURVEY §2.B1) — the Spark-side
  * replacement for the reference's `DoclingLoader` PDF branch
  * (document_processor.py:46-47, 103-111). No external parser library is
  * available offline, so this implements the subset of ISO 32000 needed
  * to recover text from text-based PDFs:
  *
  *   - locates `stream ... endstream` segments and inflates
  *     `/FlateDecode` (or passes raw) content streams;
  *   - tokenizes content streams (literal/hex strings with the full
  *     escape grammar, names, numbers, arrays, dicts, comments);
  *   - assembles text from the show operators `Tj ' " TJ`, inserting
  *     spaces for word-gap kerns in `TJ` arrays and newlines at the
  *     line operators `Td TD T* ' "` and `ET`.
  *
  * Composite fonts (Type0 / Identity-H — the encoding virtually every
  * Korean Word/HWP-exported PDF uses, the reference's entire domain,
  * document_processor.py:111-117): show strings carry 2-byte glyph
  * indices, which are mapped back to Unicode through the font's
  * embedded /ToUnicode CMap (`bfchar`/`bfrange` sections, ISO 32000
  * §9.10.3). The object graph is resolved just far enough for that:
  * indirect-object headers → font dicts (`/ToUnicode N 0 R`) → page
  * resource names (`/Font << /F1 N 0 R >>`), and the content-stream
  * interpreter tracks the current font via the `Tf` operator.
  *
  * Out of scope (rare in text PDFs, degrade to skipped streams, never
  * to garbage output): non-Flate filters, composite fonts WITHOUT a
  * ToUnicode CMap (pure glyph ids are unrecoverable), encrypted files.
  * Strings decode as Latin-1 bytes (standard simple-font encodings are
  * Latin-1-compatible for the printable range) or UTF-16BE when
  * BOM-tagged.
  */
object PdfText {

  /** Word-gap threshold for TJ kern values, in thousandths of a text-space
    * unit: adjustments more negative than this render as inter-word space. */
  private val WordGapKern = -180.0

  def isPdf(bytes: Array[Byte]): Boolean = {
    val head = new String(bytes.take(1024), StandardCharsets.ISO_8859_1)
    head.contains("%PDF-")
  }

  /** Extract text from PDF bytes. Left(reason) when the bytes are not a
    * PDF or no text stream decodes. Streams are located and inflated
    * exactly once and shared by font resolution and text assembly. */
  def extract(bytes: Array[Byte]): Either[String, String] = {
    if (!isPdf(bytes)) return Left("Not a PDF (missing %PDF- header)")
    val streams = decodedStreams(bytes)
    val idx = new ObjIndex(bytes, streams)
    val globalFonts = fontCMapsIdx(idx, streams)
    // page-scoped interpretation: each page's /Contents streams run as
    // ONE concatenated stream against that page's own font bindings
    // (two pages may bind /F1 to different fonts); pages without
    // resolvable resources — e.g. inherited from the /Pages parent —
    // fall back to the merged document-global bindings, as do content
    // streams no page claims
    val pages = pageFontCMapsIdx(idx, streams)
    val owned = for {
      rs <- streams
      d <- rs.data if looksLikeContent(d)
      o <- idx.ownerOf(rs.kwPos)
    } yield (o, d)
    val byOwner = owned.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val claimed = pages.flatMap(_._1).toSet
    val pageTexts = pages.map { case (contents, fontsOpt) =>
      val cs = contents.flatMap(byOwner.getOrElse(_, Nil))
      extractFromContent(cs, fontsOpt.filter(_.nonEmpty).getOrElse(globalFonts))
    }
    val orphanText = extractFromContent(
      owned.collect { case (o, d) if !claimed.contains(o) => d }, globalFonts)
    val joined = (pageTexts :+ orphanText).filter(_.nonEmpty).mkString("\n")
      .replaceAll("[ \\t]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{3,}", "\n\n")
      .trim
    if (joined.isEmpty) Left("No extractable text streams in PDF")
    else Right(joined)
  }

  /** One located stream: the `stream` keyword offset and raw-data span
    * (for masking binary regions during object-header scans — recorded
    * for EVERY stream, decodable or not, because undecodable payloads
    * like DCTDecode images are exactly the binary runs most likely to
    * contain phantom "N M obj" bytes) plus the decoded payload when the
    * filter is supported. */
  private[sources] final case class RawStream(kwPos: Int, dataStart: Int,
                                              dataEnd: Int, data: Option[Array[Byte]])

  /** All located streams with their byte positions; `data` is defined
    * for the ones that decoded. */
  private[graft] def decodedStreams(bytes: Array[Byte]): Seq[RawStream] = {
    val out = ArrayBuffer.empty[RawStream]
    var i = 0
    while (i >= 0 && i < bytes.length) {
      i = indexOf(bytes, "stream", i)
      if (i >= 0) {
        // `stream` must be followed by EOL per spec (reject `endstream` hits
        // via the preceding-char check below)
        val kwEnd = i + "stream".length
        val precededByEnd = i >= 3 && bytes(i - 1) == 'd' && bytes(i - 2) == 'n' && bytes(i - 3) == 'e'
        var dataStart = kwEnd
        if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
        if (!precededByEnd && dataStart < bytes.length) {
          val end = indexOf(bytes, "endstream", dataStart)
          if (end < 0) { i = bytes.length }
          else {
            var dataEnd = end
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
            val dict = precedingDict(bytes, i)
            val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            val decoded =
              if (dict.contains("/FlateDecode")) inflate(data)
              else if (dict.contains("/Filter")) None // unsupported filter
              else Some(data)
            out += RawStream(i, dataStart, dataEnd, decoded)
            i = end + "endstream".length
          }
        } else i = kwEnd
      }
    }
    out.toSeq
  }

  private def looksLikeContent(d: Array[Byte]): Boolean = {
    val s = new String(d, StandardCharsets.ISO_8859_1)
    s.contains("Tj") || s.contains("TJ") || s.contains("BT")
  }

  /** Decoded stream payloads that look like page content. */
  private[sources] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] =
    decodedStreams(bytes).flatMap(_.data).filter(looksLikeContent)

  /** The dictionary text immediately preceding the `stream` keyword. A
    * bounded backward window, CUT at the last `obj`/`endstream` keyword
    * inside it: the stream's own dict starts after its object header,
    * and without the cut an EARLIER object's dict leaks in — e.g. a
    * compressed stream's `/FlateDecode` within 512 bytes of a plain
    * stream's keyword made the plain stream fail inflation and vanish. */
  private def precedingDict(bytes: Array[Byte], streamKw: Int): String = {
    val from = math.max(0, streamKw - 512)
    val w = new String(bytes, from, streamKw - from, StandardCharsets.ISO_8859_1)
    val cut = math.max(w.lastIndexOf("obj"), w.lastIndexOf("endstream"))
    if (cut >= 0) w.substring(cut) else w
  }

  private def indexOf(haystack: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    val limit = haystack.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && haystack(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Raw-deflate or zlib inflate; tolerates truncated tails (returns what
    * decompressed cleanly) — corrupt streams must not fail the document. */
  private[sources] def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    def run(nowrap: Boolean): Option[Array[Byte]] = {
      val inf = new Inflater(nowrap)
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      try {
        var n = inf.inflate(buf)
        while (n > 0) { out.write(buf, 0, n); n = inf.inflate(buf) }
        if (out.size() > 0) Some(out.toByteArray) else None
      } catch {
        case _: java.util.zip.DataFormatException =>
          if (out.size() > 0) Some(out.toByteArray) else None
      } finally inf.end()
    }
    run(false).orElse(run(true))
  }

  /** A font's ToUnicode CMap: fixed-width character codes → Unicode
    * strings (a code may map to several UTF-16 units, e.g. ligatures).
    * Identity-H codespaces are 2-byte; 1-byte simple-font CMaps occur
    * too, so the width comes from the CMap's codespacerange. */
  private[graft] final case class ToUnicodeCMap(codeBytes: Int, map: Map[Int, String]) {
    /** Decode a show-string's raw bytes through the CMap. Unmapped codes
      * are dropped (never garbage); a string with NO mapped code decodes
      * to "" so CMap-less glyph runs degrade exactly like before. */
    def decode(raw: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      while (i + codeBytes <= raw.length) {
        var code = 0
        var k = 0
        while (k < codeBytes) { code = (code << 8) | (raw(i + k) & 0xff); k += 1 }
        map.get(code).foreach(sb.append)
        i += codeBytes
      }
      sb.toString
    }
  }

  /** Total bfrange expansion cap — a corrupt `<0000> <FFFFFF> ...` range
    * must not allocate unboundedly. 64K covers the full 2-byte codespace. */
  private val MaxCMapEntries = 65536

  /** Parse ToUnicode CMap text (ISO 32000 §9.10.3): codespacerange for
    * the code width, `bfchar` pairs, and `bfrange` triples in both the
    * incrementing-destination and explicit-array forms. */
  private[graft] def parseCMap(text: String): ToUnicodeCMap = {
    val hex = "<([0-9a-fA-F]+)>"
    // destination hex = big-endian UTF-16 code units (surrogates included)
    def utf16(h: String): String = {
      if (h.length == 2) return (Integer.parseInt(h, 16) & 0xff).toChar.toString
      val sb = new StringBuilder
      var i = 0
      while (i + 4 <= h.length) {
        sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
        i += 4
      }
      sb.toString
    }
    val entries = scala.collection.mutable.HashMap.empty[Int, String]

    val codeBytes = ("""begincodespacerange\s*<([0-9a-fA-F]+)>""".r)
      .findFirstMatchIn(text).map(_.group(1).length / 2)
      .filter(w => w == 1 || w == 2).getOrElse(2)

    val charEntry = (hex + """\s*""" + hex).r
    """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text).foreach { b =>
      charEntry.findAllMatchIn(b.group(1)).foreach { e =>
        val code = Integer.parseInt(e.group(1), 16)
        if (!entries.contains(code)) entries(code) = utf16(e.group(2))
      }
    }

    // <lo> <hi> <dstStart>  |  <lo> <hi> [<dst1> <dst2> ...]
    val rangeEntry = (hex + """\s*""" + hex + """\s*(?:""" + hex +
      """|\[((?:\s*<[0-9a-fA-F]+>)+)\s*\])""").r
    """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text).foreach { b =>
      rangeEntry.findAllMatchIn(b.group(1)).foreach { e =>
        val lo = Integer.parseInt(e.group(1), 16)
        val hi = math.min(Integer.parseInt(e.group(2), 16),
          lo + (MaxCMapEntries - entries.size).max(0))
        if (e.group(3) != null) {
          // incrementing form: offset is added to the LAST UTF-16 unit
          val base = utf16(e.group(3))
          var c = lo
          while (c <= hi) {
            if (!entries.contains(c) && base.nonEmpty)
              entries(c) = base.dropRight(1) + (base.last + (c - lo)).toChar
            c += 1
          }
        } else {
          val dsts = "<([0-9a-fA-F]+)>".r.findAllMatchIn(e.group(4)).map(_.group(1)).toVector
          var c = lo
          var k = 0
          while (c <= hi && k < dsts.length) {
            if (!entries.contains(c)) entries(c) = utf16(dsts(k))
            c += 1; k += 1
          }
        }
      }
    }
    ToUnicodeCMap(codeBytes, entries.toMap)
  }

  /** Resolve page-resource font names (the `/F1` in `/F1 12 Tf`) to
    * their ToUnicode CMaps. Resolution path: indirect-object headers →
    * streams containing bfchar/bfrange sections (keyed by owning object)
    * → font dicts carrying `/ToUnicode N 0 R` → `/Font` resource dicts,
    * direct (`/Font << /F1 5 0 R >>`) or indirect (`/Font 9 0 R`).
    * Page-aware resolution ([[pageFontCMaps]]) scopes bindings to each
    * page's own /Resources; this document-global form is the fallback
    * (and covers streams no page claims): all bindings merge, first
    * wins on a name collision. */
  private[graft] def fontCMaps(bytes: Array[Byte]): Map[String, ToUnicodeCMap] =
    fontCMaps(bytes, decodedStreams(bytes))

  /** Shared object-graph machinery: the file as Latin-1 text,
    * indirect-object headers (with stream-data spans masked so binary
    * payloads cannot fake "N M obj" headers), owner lookup and bounded
    * dictionary extraction. */
  private final class ObjIndex(bytes: Array[Byte], streams: Seq[RawStream]) {
    val text = new String(bytes, StandardCharsets.ISO_8859_1)
    private val spans = streams.map(s => (s.dataStart, s.dataEnd)).sortBy(_._1).toIndexedSeq
    def inStream(pos: Int): Boolean = {
      var lo = 0; var hi = spans.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (spans(mid)._1 <= pos) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans >= 0 && pos < spans(ans)._2
    }
    val headers: Vector[(Int, Int, Int)] = // (objNum, start, end)
      """(\d+)\s+\d+\s+obj\b""".r.findAllMatchIn(text)
        .filterNot(m => inStream(m.start))
        .map(m => (m.group(1).toInt, m.start, m.end)).toVector
    // owning object of a byte offset = nearest header starting before it
    def ownerOf(pos: Int): Option[Int] = {
      var lo = 0; var hi = headers.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (headers(mid)._2 < pos) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (ans >= 0) Some(headers(ans)._1) else None
    }
    // an object's dictionary text: header end → nearest stream/endobj
    // (bounded — stream dicts, font dicts and page dicts are small)
    def dictAt(idx: Int): String = {
      val from = headers(idx)._3
      val slice = text.substring(from, math.min(text.length, from + 2048))
      val cuts = Seq(slice.indexOf("stream"), slice.indexOf("endobj")).filter(_ >= 0)
      if (cuts.isEmpty) slice else slice.substring(0, cuts.min)
    }
    def dictOfObj(objNum: Int): Option[String] =
      headers.indexWhere(_._1 == objNum) match {
        case -1 => None
        case i  => Some(dictAt(i))
      }
  }

  /** fontObj → CMap for every font dict carrying `/ToUnicode N 0 R`. */
  private def cmapByFontObj(idx: ObjIndex,
                            streams: Seq[RawStream]): Map[Int, ToUnicodeCMap] = {
    val cmapsByObj: Map[Int, ToUnicodeCMap] = streams.flatMap { rs =>
      rs.data.flatMap { d =>
        val s = new String(d, StandardCharsets.ISO_8859_1)
        if (s.contains("beginbfchar") || s.contains("beginbfrange")) {
          val cm = parseCMap(s)
          if (cm.map.nonEmpty) idx.ownerOf(rs.kwPos).map(_ -> cm) else None
        } else None
      }
    }.toMap
    if (cmapsByObj.isEmpty) return Map.empty
    val toUniRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
    idx.headers.indices.flatMap { i =>
      toUniRe.findFirstMatchIn(idx.dictAt(i))
        .flatMap(m => cmapsByObj.get(m.group(1).toInt))
        .map(idx.headers(i)._1 -> _)
    }.toMap
  }

  private val FontPairRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r

  /** Resolve `/F1 5 0 R`-style pairs against the font→CMap table. */
  private def bindPairs(pairsText: String, fonts: Map[Int, ToUnicodeCMap],
                        out: scala.collection.mutable.LinkedHashMap[String, ToUnicodeCMap]): Unit =
    FontPairRe.findAllMatchIn(pairsText).foreach { p =>
      fonts.get(p.group(2).toInt).foreach { cm =>
        if (!out.contains(p.group(1))) out(p.group(1)) = cm
      }
    }

  private[graft] def fontCMaps(bytes: Array[Byte],
                               streams: Seq[RawStream]): Map[String, ToUnicodeCMap] =
    fontCMapsIdx(new ObjIndex(bytes, streams), streams)

  private def fontCMapsIdx(idx: ObjIndex,
                           streams: Seq[RawStream]): Map[String, ToUnicodeCMap] = {
    if (idx.headers.isEmpty) return Map.empty
    val byFontObj = cmapByFontObj(idx, streams)
    if (byFontObj.isEmpty) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap.empty[String, ToUnicodeCMap]
    // direct resource dicts: /Font << /F1 5 0 R ... >> (stream spans
    // masked here too — decoy bytes must not bind resource names)
    """/Font\s*<<([^<>]*)>>""".r.findAllMatchIn(idx.text)
      .filterNot(m => idx.inStream(m.start)).foreach(m => bindPairs(m.group(1), byFontObj, out))
    // indirect resource dicts: /Font 9 0 R → pairs live in object 9
    """/Font\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(idx.text)
      .filterNot(m => idx.inStream(m.start)).foreach { m =>
        idx.dictOfObj(m.group(1).toInt).foreach(bindPairs(_, byFontObj, out))
      }
    out.toMap
  }

  /** Per-page font resolution: each `/Type /Page` object's /Contents
    * stream objects paired with the fonts bound by THAT page's
    * /Resources (inline, or an indirect `/Resources N 0 R`). Two pages
    * may bind the same name (`/F1`) to different fonts without
    * clobbering each other — the Word/HWP-export layout. Pages with no
    * resolvable resources fall back to the caller's global map. */
  private[graft] def pageFontCMaps(bytes: Array[Byte], streams: Seq[RawStream])
      : Seq[(Seq[Int], Option[Map[String, ToUnicodeCMap]])] =
    pageFontCMapsIdx(new ObjIndex(bytes, streams), streams)

  private def pageFontCMapsIdx(idx: ObjIndex, streams: Seq[RawStream])
      : Seq[(Seq[Int], Option[Map[String, ToUnicodeCMap]])] = {
    if (idx.headers.isEmpty) return Nil
    val byFontObj = cmapByFontObj(idx, streams)
    val contentsRefRe = """/Contents\s+(\d+)\s+\d+\s+R""".r
    val contentsArrRe = """/Contents\s*\[([^\]]*)\]""".r
    val refRe = """(\d+)\s+\d+\s+R""".r
    val fontDictRe = """/Font\s*<<([^<>]*)>>""".r
    val fontRefRe = """/Font\s+(\d+)\s+\d+\s+R""".r
    val resRefRe = """/Resources\s+(\d+)\s+\d+\s+R""".r
    idx.headers.indices.flatMap { i =>
      val d = idx.dictAt(i)
      // \b won't do: "/Type /Pages" must not match "/Page"
      if (!"""/Type\s*/Page[^s]""".r.findFirstIn(d + " ").isDefined) None
      else {
        val contents: Seq[Int] =
          contentsArrRe.findFirstMatchIn(d)
            .map(m => refRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
            .orElse(contentsRefRe.findFirstMatchIn(d).map(m => Seq(m.group(1).toInt)))
            .getOrElse(Nil)
        // page resources: inline /Font dict, or /Resources N 0 R whose
        // object carries the /Font dict (directly or as /Font M 0 R)
        val resText: Option[String] =
          if (fontDictRe.findFirstIn(d).isDefined || fontRefRe.findFirstIn(d).isDefined) Some(d)
          else resRefRe.findFirstMatchIn(d).flatMap(m => idx.dictOfObj(m.group(1).toInt))
        val fonts: Option[Map[String, ToUnicodeCMap]] = resText.map { rt =>
          val out = scala.collection.mutable.LinkedHashMap.empty[String, ToUnicodeCMap]
          fontDictRe.findAllMatchIn(rt).foreach(m => bindPairs(m.group(1), byFontObj, out))
          fontRefRe.findAllMatchIn(rt).foreach { m =>
            idx.dictOfObj(m.group(1).toInt).foreach(bindPairs(_, byFontObj, out))
          }
          out.toMap
        }
        if (contents.isEmpty) None else Some((contents, fonts))
      }
    }
  }

  /** A `/Name` token captured as an operand (needed for `Tf`). */
  private final case class PdfName(value: String)

  /** Single-stream convenience overload (specs, simple callers). */
  private[sources] def extractFromContent(content: Array[Byte],
                                          fonts: Map[String, ToUnicodeCMap]): String =
    extractFromContent(Seq(content), fonts)

  private[sources] def extractFromContent(content: Array[Byte]): String =
    extractFromContent(Seq(content), Map.empty[String, ToUnicodeCMap])

  /** Text assembly from the document's content streams, interpreted as
    * ONE stream in document order: ISO 32000 §7.8.2 treats a split
    * /Contents array as the concatenation of its streams (divisions may
    * fall between lexical tokens — even between an operand and its
    * operator), so the streams are physically joined with a single
    * whitespace byte (a token separator, never emitted as text) and
    * interpreted in one pass. Graphics state (the active font's CMap)
    * therefore survives boundaries for free. `fonts` maps page resource
    * names to ToUnicode CMaps; the `Tf` operator switches the active
    * one, and show strings under a CMap'd font decode through it. */
  private[sources] def extractFromContent(contents: Seq[Array[Byte]],
                                          fonts: Map[String, ToUnicodeCMap]): String = {
    if (contents.isEmpty) return ""
    val content =
      if (contents.lengthCompare(1) == 0) contents.head
      else {
        val bos = new java.io.ByteArrayOutputStream()
        contents.foreach { s => if (bos.size() > 0) bos.write('\n'); bos.write(s) }
        bos.toByteArray
      }
    val sb = new StringBuilder
    // pending operand stack for the current operator (strings + numbers)
    val operands = ArrayBuffer.empty[Any]
    // active font's CMap (None = simple font → Latin-1/UTF-16BE decode)
    var currentCMap: Option[ToUnicodeCMap] = None
    var i = 0
    val n = content.length

    def c(k: Int): Char = (content(k) & 0xff).toChar
    def isDelim(ch: Char) = "()<>[]{}/%".indexOf(ch) >= 0
    def isWs(ch: Char) = ch == ' ' || ch == '\t' || ch == '\r' || ch == '\n' || ch == '\f' || ch == 0

    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n')

    def showString(s: String): Unit = sb.append(s)

    def showTJ(items: Seq[Any]): Unit = items.foreach {
      case s: String => sb.append(s)
      case d: Double => if (d < WordGapKern && (sb.isEmpty || sb.last != ' ')) sb.append(' ')
      case _         => ()
    }

    def decodeStringBytes(raw: Array[Byte]): String = currentCMap match {
      case Some(cmap) => cmap.decode(raw)
      case None =>
        val s =
          if (raw.length >= 2 && (raw(0) & 0xff) == 0xfe && (raw(1) & 0xff) == 0xff)
            new String(raw, 2, raw.length - 2, StandardCharsets.UTF_16BE)
          else new String(raw, StandardCharsets.ISO_8859_1)
        // Composite-font (Identity-H) show strings carry 2-byte GLYPH
        // INDICES, not character codes — without the font's ToUnicode
        // CMap they are unrecoverable. They betray themselves as control
        // characters (glyph ids are small: 0x0003, 0x004F, ... → NULs and
        // C0 bytes after byte decode). Drop such strings entirely —
        // "degrade to skipped, never to garbage".
        var ctl = 0
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c < ' ' && c != '\n' && c != '\r' && c != '\t') ctl += 1
          i += 1
        }
        if (ctl > 0) "" else s
    }

    while (i < n) {
      val ch = c(i)
      if (isWs(ch)) i += 1
      else if (ch == '%') { while (i < n && c(i) != '\n' && c(i) != '\r') i += 1 }
      else if (ch == '(') {
        // literal string with nesting + escape grammar
        val raw = new java.io.ByteArrayOutputStream()
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val x = c(i)
          if (x == '\\' && i + 1 < n) {
            val e = c(i + 1)
            e match {
              case 'n' => raw.write('\n'); i += 2
              case 'r' => raw.write('\r'); i += 2
              case 't' => raw.write('\t'); i += 2
              case 'b' => raw.write('\b'); i += 2
              case 'f' => raw.write('\f'); i += 2
              case '(' => raw.write('('); i += 2
              case ')' => raw.write(')'); i += 2
              case '\\' => raw.write('\\'); i += 2
              case '\r' => i += 2; if (i < n && c(i) == '\n') i += 1 // continuation
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && c(i) >= '0' && c(i) <= '7') { v = v * 8 + (c(i) - '0'); i += 1; k += 1 }
                raw.write(v & 0xff)
              case other => raw.write(other); i += 2
            }
          } else if (x == '(') { depth += 1; raw.write('('); i += 1 }
          else if (x == ')') { depth -= 1; if (depth > 0) raw.write(')'); i += 1 }
          else { raw.write(x); i += 1 }
        }
        operands += decodeStringBytes(raw.toByteArray)
      }
      else if (ch == '<' && i + 1 < n && c(i + 1) == '<') { i += 2 } // dict open: skip token
      else if (ch == '>' && i + 1 < n && c(i + 1) == '>') { i += 2 }
      else if (ch == '<') {
        // hex string
        val hex = new StringBuilder
        i += 1
        while (i < n && c(i) != '>') { val x = c(i); if (!isWs(x)) hex.append(x); i += 1 }
        i += 1
        val h = if (hex.length % 2 == 1) hex.append('0') else hex
        val raw = new Array[Byte](h.length / 2)
        var k = 0
        var bad = false
        while (k < raw.length) {
          val hi = Character.digit(h.charAt(2 * k), 16)
          val lo = Character.digit(h.charAt(2 * k + 1), 16)
          if (hi < 0 || lo < 0) bad = true
          raw(k) = ((math.max(hi, 0) << 4) | math.max(lo, 0)).toByte
          k += 1
        }
        if (!bad) operands += decodeStringBytes(raw)
      }
      else if (ch == '[') { operands += '['; i += 1 }
      else if (ch == ']') {
        // fold everything back to the matching '[' into one array operand
        val start = operands.lastIndexOf('[')
        if (start >= 0) {
          val items = operands.slice(start + 1, operands.length).toSeq
          operands.remove(start, operands.length - start)
          operands += items
        }
        i += 1
      }
      else if (ch == '/') {
        // name token — captured for Tf font switches
        val start = i + 1
        i += 1
        while (i < n && !isWs(c(i)) && !isDelim(c(i))) i += 1
        operands += PdfName(new String(content, start, i - start, StandardCharsets.ISO_8859_1))
      }
      else if (ch == '{' || ch == '}') i += 1
      else if ((ch >= '0' && ch <= '9') || ch == '+' || ch == '-' || ch == '.') {
        val start = i
        i += 1
        while (i < n && ((c(i) >= '0' && c(i) <= '9') || c(i) == '.' || c(i) == '-' || c(i) == '+')) i += 1
        val tok = new String(content, start, i - start, StandardCharsets.ISO_8859_1)
        try operands += tok.toDouble catch { case _: NumberFormatException => () }
      }
      else {
        // operator token
        val start = i
        while (i < n && !isWs(c(i)) && !isDelim(c(i))) i += 1
        val op = new String(content, start, i - start, StandardCharsets.ISO_8859_1)
        op match {
          case "Tj" =>
            operands.lastOption.collect { case s: String => s }.foreach(showString)
          case "'" =>
            newline()
            operands.lastOption.collect { case s: String => s }.foreach(showString)
          case "\"" =>
            newline()
            operands.lastOption.collect { case s: String => s }.foreach(showString)
          case "TJ" =>
            operands.lastOption.collect { case items: Seq[_] => items }
              .foreach(items => showTJ(items.asInstanceOf[Seq[Any]]))
          case "Td" | "TD" | "T*" | "ET" => newline()
          case "Tf" =>
            operands.collect { case PdfName(nm) => nm }.lastOption
              .foreach(nm => currentCMap = fonts.get(nm))
          case _ => ()
        }
        if (op.nonEmpty) operands.clear()
        else i += 1 // lone delimiter char not consumed above — never stall
      }
    }
    sb.toString.trim
  }
}
