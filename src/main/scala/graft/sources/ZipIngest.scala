package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.{Charset, StandardCharsets, CodingErrorAction}
import java.text.Normalizer
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary/zip ingestion (SURVEY §2.B1-B3, B12-B13).
  *
  * Spark shape: `spark.read.format("binaryFile")` rows → a flatMap that
  * yields one row per archive member — the distributed generalization of
  * the reference's temp-dir extraction loop (`app.py:160-294`). Each zip
  * explodes independently inside its task; no shuffle. At 100 TB the
  * parallelism unit is the archive, which matches object-store layouts
  * (many medium zips), and `binaryFile` splits listing across executors.
  */
object ZipIngest {

  /** B3: zip member-name decode chain exactly as the reference
    * (`app.py:171-194`), which branches on the entry's UTF-8 flag: EFS
    * entries are already proper Unicode (Java's ZipInputStream decodes
    * them as UTF-8 regardless of the configured charset) → NFC only;
    * non-EFS names arrive as CP437-preserved raw bytes → reinterpret as
    * UTF-8, fall back to EUC-KR (ignoring errors), then NFC. A name the
    * CP437 encoder cannot round-trip is necessarily an already-decoded
    * EFS name (CP437 maps all 256 raw byte values). */
  def decodeZipName(name: String): String = {
    val cp437 = Charset.forName("CP437")
    if (!cp437.newEncoder().canEncode(name))
      return Normalizer.normalize(name, Normalizer.Form.NFC)
    val bytes = name.getBytes(cp437)
    val utf8 = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val decoded =
      try utf8.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      catch {
        case _: java.nio.charset.CharacterCodingException =>
          // EUC-KR strictly: if the bytes are not valid EUC-KR either,
          // the name was NOT raw bytes — it is an EFS name whose chars
          // all exist in CP437 (e.g. "café.txt"): keep it as-is rather
          // than destroying it with a lossy decode. (The reference reads
          // the flag bit directly, app.py:173-186; ZipInputStream hides
          // it, so strict-decode-or-keep is the faithful equivalent.)
          try Charset.forName("EUC-KR").newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
            .decode(java.nio.ByteBuffer.wrap(bytes)).toString
          catch { case _: java.nio.charset.CharacterCodingException => name }
      }
    Normalizer.normalize(decoded, Normalizer.Form.NFC)
  }

  /** B2 core: explode one zip's bytes into (memberName, bytes) pairs.
    * Directory entries are skipped; empty FILE members are kept (the
    * reference extracts them too — they surface as zero-chunk docs). */
  def explodeZip(zipBytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = ArrayBuffer.empty[(String, Array[Byte])]
    val zis = new ZipInputStream(new ByteArrayInputStream(zipBytes), Charset.forName("CP437"))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = zis.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = zis.read(tmp) }
          out += ((decodeZipName(e.getName), buf.toByteArray))
        }
        e = zis.getNextEntry
      }
    } catch {
      // corrupt/truncated archive: keep whatever extracted cleanly (zero
      // members for garbage bytes) — the B13 rollup reports it as error
      // instead of failing the whole ingest task
      case _: java.util.zip.ZipException | _: java.io.IOException => ()
    } finally zis.close()
    out.toSeq
  }

  /** B2 as a DataFrame op over `binaryFile` rows (path, content) →
    * one row per member (zip_path, member_name, member_bytes). */
  def explodeZips(binaryFiles: DataFrame,
                  pathCol: String = "path", contentCol: String = "content"): DataFrame = {
    val u = udf((bytes: Array[Byte]) => explodeZip(bytes))
    binaryFiles
      .select(col(pathCol).as("zip_path"), explode(u(col(contentCol))).as("m"))
      .select(col("zip_path"), col("m._1").as("member_name"), col("m._2").as("member_bytes"))
  }

  /** B1: loader dispatch by extension, matching the reference's
    * `load_document` surface (`document_processor.py:46-52`: Docling for
    * .pdf, Unstructured for .docx/.doc, TextLoader for .txt/.md/
    * .markdown) with its ValueError for anything else
    * (`document_processor.py:100-117`). PDF and DOCX extraction are
    * pure-JVM implementations ([[PdfText]], [[DocxText]]); a parse
    * failure surfaces as Left so the B13 status lattice reports the
    * member as error instead of failing the task. */
  def parseDocument(name: String, bytes: Array[Byte]): Either[String, String] = {
    val ext = name.lastIndexOf('.') match {
      case -1 => ""
      case i  => name.substring(i).toLowerCase
    }
    ext match {
      case ".txt" | ".md" | ".markdown" => Right(new String(bytes, StandardCharsets.UTF_8))
      case ".pdf"  => PdfText.extract(bytes)
      case ".docx" => DocxText.extract(bytes)
      case ".doc"  =>
        // legacy .doc is OLE2, not a zip — the DOCX parser can never
        // succeed on it, so fail with an actionable message instead of
        // a misleading "Not a DOCX" (the reference's unused path handled
        // it via Unstructured, document_processor.py:48-50)
        Left("legacy .doc (OLE2) format not supported; convert to .docx")
      case other =>
        Left(s"Unsupported file type: $other. Supported types are: " +
          ".pdf, .txt, .md, .markdown, .docx")
    }
  }

  /** B1+B2 composed: zips → members → parsed text with per-member status
    * (B13's lattice as columns: ok + error message instead of the
    * reference's nested status tree, `api_models.py:18-35`). */
  def ingestZips(binaryFiles: DataFrame): DataFrame = {
    val parse = udf { (name: String, bytes: Array[Byte]) =>
      parseDocument(name, bytes) match {
        case Right(t) => (true, t, null: String)
        case Left(e)  => (false, null: String, e)
      }
    }
    explodeZips(binaryFiles)
      .withColumn("p", parse(col("member_name"), col("member_bytes")))
      .select(col("zip_path"), col("member_name"),
        col("p._1").as("ok"), col("p._2").as("text"), col("p._3").as("error"))
  }

  /** B13: per-zip status rollup — success / partial success / error
    * (the reference's per-file lattice, `app.py:256-294`). Pass the
    * original archive table so corrupt/empty zips — which explode to
    * ZERO member rows and would otherwise vanish from a plain groupBy —
    * still report `error` (the reference's per-file failure branch). */
  def uploadStatus(ingested: DataFrame,
                   allZips: Option[DataFrame] = None,
                   pathCol: String = "path"): DataFrame = {
    val perZip = ingested.groupBy(col("zip_path"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("ok"), 1).otherwise(0)).as("n_ok"))
    val complete = allZips match {
      case Some(zips) =>
        zips.select(col(pathCol).as("zip_path")).distinct()
          .join(perZip, Seq("zip_path"), "left_outer")
          .na.fill(0L, Seq("n_members", "n_ok"))
      case None => perZip
    }
    complete.withColumn("status",
      when(col("n_members") === 0, "error")
        .when(col("n_ok") === col("n_members"), "success")
        .when(col("n_ok") > 0, "partial_success")
        .otherwise("error"))
  }

  /** B12: persist raw member bytes to object storage under
    * `{collection}/{filename}` — the reference's S3 layout
    * (`app.py:72-100`) expressed as a partitioned parquet write of the
    * bytes table (path-addressable, byte-exact via the binary column). */
  def writeRawObjects(members: DataFrame, baseDir: String, collection: String): Unit =
    members
      .withColumn("collection", lit(collection))
      .write.mode("append").partitionBy("collection")
      .parquet(baseDir)
}
