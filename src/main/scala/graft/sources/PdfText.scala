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
  * Out of scope (rare in text PDFs, degrade to skipped streams, never
  * to garbage output): non-Flate filters, CMap-mapped composite fonts
  * (Identity-H glyph indices), encrypted files. Strings decode as
  * Latin-1 bytes (standard simple-font encodings are Latin-1-compatible
  * for the printable range) or UTF-16BE when BOM-tagged.
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
    * PDF or no text stream decodes. */
  def extract(bytes: Array[Byte]): Either[String, String] = {
    if (!isPdf(bytes)) return Left("Not a PDF (missing %PDF- header)")
    val streams = contentStreams(bytes)
    val texts = streams.flatMap { s =>
      val t = extractFromContent(s)
      if (t.nonEmpty) Some(t) else None
    }
    val joined = texts.mkString("\n")
      .replaceAll("[ \\t]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{3,}", "\n\n")
      .trim
    if (joined.isEmpty) Left("No extractable text streams in PDF")
    else Right(joined)
  }

  /** All decoded stream payloads that look like page content. */
  private[sources] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
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
            decoded.foreach { d =>
              val s = new String(d, StandardCharsets.ISO_8859_1)
              if (s.contains("Tj") || s.contains("TJ") || s.contains("BT")) out += d
            }
            i = end + "endstream".length
          }
        } else i = kwEnd
      }
    }
    out.toSeq
  }

  /** The dictionary text immediately preceding the `stream` keyword
    * (between the nearest `<<` pair-balanced open and the keyword). A
    * bounded backward window is enough: stream dicts are small. */
  private def precedingDict(bytes: Array[Byte], streamKw: Int): String = {
    val from = math.max(0, streamKw - 512)
    new String(bytes, from, streamKw - from, StandardCharsets.ISO_8859_1)
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

  /** Text assembly from one decoded content stream. */
  private[sources] def extractFromContent(content: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    val n = content.length
    // pending operand stack for the current operator (strings + numbers)
    val operands = ArrayBuffer.empty[Any]

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

    def decodeStringBytes(raw: Array[Byte]): String = {
      val s =
        if (raw.length >= 2 && (raw(0) & 0xff) == 0xfe && (raw(1) & 0xff) == 0xff)
          new String(raw, 2, raw.length - 2, StandardCharsets.UTF_16BE)
        else new String(raw, StandardCharsets.ISO_8859_1)
      // Composite-font (Identity-H) show strings carry 2-byte GLYPH
      // INDICES, not character codes — without the font's CMap they are
      // unrecoverable. They betray themselves as control characters
      // (glyph ids are small: 0x0003, 0x004F, ... → NULs and C0 bytes
      // after byte decode). Drop such strings entirely — "degrade to
      // skipped, never to garbage".
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
      else if (ch == '/') { i += 1; while (i < n && !isWs(c(i)) && !isDelim(c(i))) i += 1 } // name: skip
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
          case _ => ()
        }
        if (op.nonEmpty) operands.clear()
        else i += 1 // lone delimiter char not consumed above — never stall
      }
    }
    sb.toString.trim
  }
}
