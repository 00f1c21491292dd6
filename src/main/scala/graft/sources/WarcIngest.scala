package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET ingestion (ISO 28500 — the Common Crawl container), the
  * web generalization of [[ZipIngest]]'s archive-explode shape and the
  * front door the LLM-data-pipeline curation suite was missing: every
  * downstream stage this repo already ships (Gopher rules, C4 line
  * dedup, decontamination, PII scrub, URL blocklists) runs over text
  * that a real 100 TB pipeline obtains from exactly this extraction.
  *
  * Record grammar parsed here (WARC/1.0 and 1.1):
  * {{{
  *   WARC/1.0\r\n  <headers: Name: value>\r\n \r\n  <Content-Length
  *   block bytes>  \r\n\r\n  (next record …)
  * }}}
  *  - `.warc.gz` files are concatenated per-record gzip members (the
  *    Common Crawl layout) — decompressed as one stream (JDK
  *    GZIPInputStream reads all members);
  *  - `response` records carry an HTTP response in the block: the
  *    status line + headers are split off, `Transfer-Encoding:
  *    chunked` payloads are de-chunked;
  *  - `conversion` records (WET) carry extracted text directly — the
  *    fast path when upstream already ran extraction;
  *  - `warcinfo` / `request` / `metadata` records are surfaced with
  *    their type so a rollup can count them, but produce no text;
  *  - a truncated or malformed tail quarantines (the records that
  *    parsed cleanly are kept — [[ZipIngest.explodeZip]]'s rule).
  *
  * Text extraction per record: HTML payloads (text/html,
  * application/xhtml+xml) go through [[HtmlText.extractText]] after
  * charset sniffing (BOM → HTTP header charset → meta prescan →
  * UTF-8); text/plain and WET payloads decode without the tag strip.
  * Anything else (images, pdf bytes, …) reports `ok = false` with the
  * mime in `error` — the B13 status-lattice convention.
  *
  * Scale shape: `spark.read.format("binaryFile")` rows → flatMap; the
  * parallelism unit is the WARC file (Common Crawl ships ~1 GB
  * gzipped segments, ~64k of them per crawl), which matches the
  * object-store layout; each archive explodes inside its task with no
  * shuffle, and the extraction kernel is pure per-record CPU. Filters
  * on rec_type/mime run before any wide stage downstream.
  */
object WarcIngest {

  /** One parsed WARC record. `httpStatus`/`httpContentType` are -1/""
    * for non-response records; `payload` is the content block with
    * HTTP headers stripped and chunked encoding decoded. */
  final case class Record(recType: String, targetUri: String, date: String,
                          contentType: String, httpStatus: Int,
                          httpContentType: String, payload: Array[Byte])

  private val GzipMagic0 = 0x1f
  private val GzipMagic1 = 0x8b.toByte

  /** Decompress iff gzip (multi-member streams read fully). */
  private[sources] def inflate(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == GzipMagic0 &&
      bytes(1) == GzipMagic1) {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      val out = new ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](1 << 16)
      try {
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } catch {
        // truncated member: keep what inflated — the record parser
        // quarantines the ragged tail
        case _: java.io.IOException => ()
      } finally in.close()
      out.toByteArray
    } else bytes

  /** Index of the header/body separator (\r\n\r\n, or tolerate \n\n)
    * at/after `from`; returns (bodyStart, -1-flavored miss as n). */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && i + 3 < b.length && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i + 4
      if (b(i) == '\n' && b(i + 1) == '\n') return i + 2
      i += 1
    }
    -1
  }

  /** Parse "Name: value" header lines (case-insensitive names). */
  private def parseHeaders(s: String): Map[String, String] =
    s.split("\r?\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** De-chunk an HTTP/1.1 chunked transfer-encoded body; malformed
    * chunk framing returns what decoded cleanly. */
  private[sources] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    var i = 0
    var done = false
    while (!done && i < b.length) {
      // read the size line up to CRLF
      var e = i
      while (e < b.length && b(e) != '\n') e += 1
      if (e >= b.length) done = true
      else {
        val line = new String(b, i, e - i, StandardCharsets.US_ASCII).trim
        val sizeStr = line.takeWhile(c => Character.digit(c, 16) >= 0)
        if (sizeStr.isEmpty) done = true
        else {
          val size = try Integer.parseInt(sizeStr, 16)
          catch { case _: NumberFormatException => -1 }
          if (size <= 0) done = true // 0 = terminal chunk; -1 = malformed
          else {
            val start = e + 1
            val end = math.min(start + size, b.length)
            out.write(b, start, end - start)
            i = end
            // skip the trailing CRLF after the chunk data
            if (i < b.length && b(i) == '\r') i += 1
            if (i < b.length && b(i) == '\n') i += 1
          }
        }
        if (!done && (i >= b.length)) done = true
        else if (!done && out.size() == 0 && i == e + 1) done = true // no progress
      }
    }
    out.toByteArray
  }

  /** Parse all records in one (possibly gzipped) WARC file's bytes.
    * Malformed/truncated input yields the cleanly-parsed prefix. */
  def parseRecords(warcBytes: Array[Byte]): Seq[Record] = {
    val b = inflate(warcBytes)
    val out = ArrayBuffer.empty[Record]
    var i = 0
    var ok = true
    while (ok && i < b.length) {
      // skip inter-record CRLFs
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i >= b.length) ok = false
      else if (!(i + 5 <= b.length &&
        new String(b, i, 5, StandardCharsets.US_ASCII) == "WARC/")) ok = false
      else {
        val bodyStart = headerEnd(b, i)
        if (bodyStart < 0) ok = false
        else {
          val hdrs = parseHeaders(
            new String(b, i, bodyStart - i, StandardCharsets.UTF_8))
          val len = hdrs.get("content-length").flatMap(v =>
            try Some(v.toInt) catch { case _: NumberFormatException => None })
          len match {
            case Some(n) if bodyStart + n <= b.length =>
              val recType = hdrs.getOrElse("warc-type", "")
              val uri = hdrs.getOrElse("warc-target-uri", "")
              val date = hdrs.getOrElse("warc-date", "")
              val ct = hdrs.getOrElse("content-type", "")
              val block = java.util.Arrays.copyOfRange(b, bodyStart, bodyStart + n)
              out += parseBlock(recType, uri, date, ct, block)
              i = bodyStart + n
            case _ => ok = false // truncated/malformed: quarantine the tail
          }
        }
      }
    }
    out.toSeq
  }

  /** Split the HTTP envelope off a response record's block; other
    * record types pass the block through. */
  private def parseBlock(recType: String, uri: String, date: String,
                         ct: String, block: Array[Byte]): Record = {
    val isHttp = recType == "response" &&
      ct.toLowerCase.startsWith("application/http")
    if (!isHttp) Record(recType, uri, date, ct, -1, "", block)
    else {
      val he = headerEnd(block, 0)
      if (he < 0 ||
        !(block.length >= 5 &&
          new String(block, 0, 5, StandardCharsets.US_ASCII) == "HTTP/"))
        // response record without a parseable HTTP envelope: surface
        // the raw block so the caller's mime check reports it
        Record(recType, uri, date, ct, -1, "", block)
      else {
        val headText = new String(block, 0, he, StandardCharsets.UTF_8)
        val lines = headText.split("\r?\n")
        val status = lines.headOption.map(_.split(" "))
          .filter(_.length >= 2)
          .flatMap(a => try Some(a(1).toInt)
          catch { case _: NumberFormatException => None })
          .getOrElse(-1)
        val hh = parseHeaders(lines.drop(1).mkString("\n"))
        val body0 = java.util.Arrays.copyOfRange(block, he, block.length)
        val body =
          if (hh.get("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
            dechunk(body0)
          else body0
        Record(recType, uri, date, ct, status,
          hh.getOrElse("content-type", ""), body)
      }
    }
  }

  private def isHtmlMime(mime: String): Boolean = {
    val m = mime.toLowerCase
    m.startsWith("text/html") || m.startsWith("application/xhtml")
  }
  private def isTextMime(mime: String): Boolean =
    mime.toLowerCase.startsWith("text/plain")

  /** Extract text from one parsed record following the dispatch in
    * the object doc: Right(text) or Left(error). */
  def extractRecord(r: Record): Either[String, String] = r.recType match {
    case "conversion" => // WET: the block IS the extracted text — no
      // meta prescan (a body mentioning 'charset=' is content)
      Right(HtmlText.normalizeWs(
        HtmlText.decode(r.payload, Some(r.contentType), htmlPrescan = false)))
    case "response" =>
      if (r.httpStatus >= 400)
        Left(s"http status ${r.httpStatus}")
      else if (isHtmlMime(r.httpContentType))
        Right(HtmlText.extractText(
          HtmlText.decode(r.payload, Some(r.httpContentType))))
      else if (isTextMime(r.httpContentType))
        Right(HtmlText.normalizeWs(
          HtmlText.decode(r.payload, Some(r.httpContentType),
            htmlPrescan = false)))
      else
        Left(s"unsupported mime: ${if (r.httpContentType.isEmpty) "(none)"
        else r.httpContentType}")
    case t => Left(s"non-content record type: $t")
  }

  /** All records of the WARC files in `binaryFiles` (path, content) →
    * one row per record. */
  def records(binaryFiles: DataFrame,
              pathCol: String = "path", contentCol: String = "content"): DataFrame = {
    val u = udf((bytes: Array[Byte]) => parseRecords(bytes).map(r =>
      (r.recType, r.targetUri, r.date, r.httpStatus, r.httpContentType,
        r.contentType, r.payload)))
    binaryFiles
      .select(col(pathCol).as("warc_path"), explode(u(col(contentCol))).as("r"))
      .select(col("warc_path"),
        col("r._1").as("rec_type"), col("r._2").as("target_uri"),
        col("r._3").as("warc_date"), col("r._4").as("http_status"),
        col("r._5").as("mime"), col("r._6").as("warc_content_type"),
        col("r._7").as("payload"))
  }

  /** Full ingest: records → per-record text extraction with the B13
    * ok/error lattice. One flatMap from raw bytes (parse + extract in
    * the same task; no payload column survives to shuffle). */
  def ingestWarcs(binaryFiles: DataFrame,
                  pathCol: String = "path", contentCol: String = "content"): DataFrame = {
    val u = udf((bytes: Array[Byte]) => parseRecords(bytes).map { r =>
      extractRecord(r) match {
        case Right(t) => (r.recType, r.targetUri, r.httpStatus, r.httpContentType,
          true, t, null: String)
        case Left(e) => (r.recType, r.targetUri, r.httpStatus, r.httpContentType,
          false, null: String, e)
      }
    })
    binaryFiles
      .select(col(pathCol).as("warc_path"), explode(u(col(contentCol))).as("r"))
      .select(col("warc_path"),
        col("r._1").as("rec_type"), col("r._2").as("target_uri"),
        col("r._3").as("http_status"), col("r._4").as("mime"),
        col("r._5").as("ok"), col("r._6").as("text"), col("r._7").as("error"))
  }

  /** One standalone gzip member (the per-record compression unit of
    * the Common Crawl `.warc.gz` layout, readable by [[inflate]]'s
    * multi-member stream) — the ONE shared implementation for the
    * exporter, the fixture builders, and the specs. */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(record); g.close()
    bos.toByteArray
  }

  /** One WARC/1.0 `conversion` (WET) record for an extracted text —
    * the exact record shape [[parseRecords]] reads back. `date` is a
    * parameter (not wall-clock) so writers are deterministic and
    * replayable. */
  def conversionRecord(uri: String, text: String,
                       date: String = "2026-01-01T00:00:00Z"): Array[Byte] = {
    val body = text.getBytes(StandardCharsets.UTF_8)
    val h = new StringBuilder()
    h.append("WARC/1.0\r\n")
    h.append("WARC-Type: conversion\r\n")
    h.append("WARC-Target-URI: ").append(uri).append("\r\n")
    h.append("WARC-Date: ").append(date).append("\r\n")
    h.append("Content-Type: text/plain\r\n")
    h.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = h.toString.getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head); out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  /** WET EXPORT — the write half of the round trip: persist extracted
    * text as `.warc.gz` conversion segments, one file per partition,
    * each record its own gzip member (the Common Crawl WET layout, so
    * [[parseRecords]]/[[ingestWarcs]] read the output back
    * unchanged). Writes go through the Hadoop FileSystem of the
    * target path, so the same code lands on file://, hdfs:// or an
    * object store; `repartition(n)` upstream picks the segment count
    * (real WET segments are ~150 MB — size partitions accordingly).
    * Rows with a null text are skipped (they carry no conversion
    * payload; quarantine them upstream). Stale segments from a
    * PREVIOUS run (`part-*` names this run did not produce — e.g. a
    * re-run with fewer partitions — plus orphaned `_tmp-*` attempt
    * files) are removed only AFTER the new write commits: a re-run
    * that fails mid-job leaves the old stale-but-complete data in
    * place instead of an empty/partial directory, and same-name
    * collisions are already handled per-partition by the
    * delete+rename commit. */
  def writeWet(docs: DataFrame, uriCol: String, textCol: String,
               outDir: String, date: String = "2026-01-01T00:00:00Z"): Unit = {
    val rows = docs.select(col(uriCol).cast("string").as("uri"),
      col(textCol).cast("string").as("text"))
    // collect the segment names this run commits, so the post-commit
    // sweep can tell fresh segments from stale ones (empty partitions
    // write nothing, so the name set is NOT derivable from the
    // partition count alone)
    val written = docs.sparkSession.sparkContext
      .collectionAccumulator[String]("writeWetSegments")
    // ship the SESSION Hadoop conf to the tasks (spark.hadoop.* —
    // object-store credentials, custom filesystems); a bare
    // `new Configuration()` on the executor would see only classpath
    // defaults. Configuration is not Serializable, so carry the
    // entries; the array is small (hundreds of strings).
    val confEntries = {
      val it = docs.sparkSession.sparkContext.hadoopConfiguration.iterator()
      val buf = ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toArray
    }
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val finalPath = new org.apache.hadoop.fs.Path(
          f"$outDir/part-$pid%05d.warc.gz")
        // task-attempt-unique temp + rename-on-success: a retried or
        // speculative duplicate attempt never truncates the committed
        // segment (losers leave only a temp file the next overwrite
        // cleans, and the delete+rename pair is idempotent per
        // partition — both attempts carry identical bytes)
        val tmpPath = new org.apache.hadoop.fs.Path(
          f"$outDir/_tmp-part-$pid%05d-attempt-${tc.taskAttemptId()}.warc.gz")
        val fs = finalPath.getFileSystem(conf)
        val out = fs.create(tmpPath, true)
        try {
          it.foreach { r =>
            if (!r.isNullAt(1))
              out.write(gzipMember(
                conversionRecord(r.getString(0), r.getString(1), date)))
          }
        } finally out.close()
        if (fs.exists(finalPath)) fs.delete(finalPath, false)
        if (!fs.rename(tmpPath, finalPath)) {
          fs.delete(tmpPath, false)
          throw new java.io.IOException(
            s"writeWet: rename $tmpPath -> $finalPath failed")
        }
        written.add(finalPath.getName)
      }
    }
    // post-commit sweep: the job succeeded, so any part-* segment this
    // run did NOT write is stale (previous run, different partition
    // count) and any _tmp-* file is an orphaned loser attempt. Only
    // plain files are touched (a matching-name DIRECTORY is not ours
    // to remove, and a non-recursive delete on one would throw).
    locally {
      val fresh = new java.util.HashSet[String](written.value)
      val dirPath = new org.apache.hadoop.fs.Path(outDir)
      val fs = dirPath.getFileSystem(
        docs.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(dirPath)) {
        fs.listStatus(dirPath).foreach { st =>
          val nm = st.getPath.getName
          if (st.isFile &&
            ((nm.startsWith("part-") && !fresh.contains(nm)) ||
              nm.startsWith("_tmp-")))
            fs.delete(st.getPath, false)
        }
      }
    }
  }

  /** Per-file status rollup — [[ZipIngest.uploadStatus]]'s lattice
    * over WARC files (content records only; warcinfo/request/metadata
    * records are bookkeeping, not payload). */
  def warcStatus(ingested: DataFrame,
                 allFiles: Option[DataFrame] = None,
                 pathCol: String = "path"): DataFrame =
    ZipIngest.uploadStatus(
      ingested.filter(col("rec_type").isin("response", "conversion"))
        .withColumnRenamed("warc_path", "zip_path"),
      allFiles, pathCol)
      .withColumnRenamed("zip_path", "warc_path")
}
