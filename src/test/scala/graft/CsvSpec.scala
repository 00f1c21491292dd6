package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.CsvDocs

/** CSV source: round-trip fidelity (quotes, separators, unicode),
  * explicit quarantine semantics, and the permissive missing-field
  * contract — the JsonlSpec matrix applied to the CSV twin. */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/data"

  test("round trip: quotes, commas, unicode, empty string AND null survive distinctly") {
    val docs = Seq(
      (1L, "en", "plain text"),
      (2L, "ko", "한국어 텍스트, 쉼표 포함"),
      (3L, "en", "quoted \"inner\" and, commas"),
      (4L, "fr", ""),
      (5L, "de", "  leading and trailing  "),
      (6L, "en", null)).toDF("doc_id", "lang", "text")
    val dir = tmp("csv-rt")
    CsvDocs.write(docs, dir)
    val back = CsvDocs.read(spark, dir, schema)
      .as[(Long, String, String)].collect().toSet
    val orig = docs.as[(Long, String, String)].collect().toSet
    // byte-exact INCLUDING the empty-vs-null distinction: the writer
    // quotes "" and leaves null bare; the reader's emptyValue/nullValue
    // split restores each — doc 4 must come back "", doc 6 null
    assert(back === orig)
  }

  test("quarantine: type-mismatch, overflow AND short lines isolate (positional format)") {
    val dir = tmp("csv-q")
    Seq((10L, "en", "good row")).toDF("doc_id", "lang", "text")
      .write.option("header", "false").csv(dir)
    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.csv"),
      "notanumber,en,type mismatch\n" +       // doc_id fails LongType
        "11,en,too,many,fields\n" +           // field-count overflow
        "12,en\n" +                           // short row: positional -> corrupt
        "\n" +                                // blank -> skipped, not a doc
        "13,ko,fine\n")
    val status = CsvDocs.readWithStatus(spark, dir, schema)
    val good = status.filter($"is_good")
      .select("doc_id", "lang", "text").as[(Long, String, String)]
      .collect().toSet
    assert(good.map(_._1) === Set(10L, 13L))
    val quarantined = status.filter(!$"is_good").select("raw_line")
      .as[String].collect().toSet
    assert(quarantined === Set("notanumber,en,type mismatch",
      "11,en,too,many,fields", "12,en"))
    // split convenience agrees with the one-pass form
    val (g, q) = CsvDocs.readWithQuarantine(spark, dir, schema)
    assert(g.count() === 2 && q.count() === 3)
  }

  test("reserved columns rejected; schema never inferred") {
    val dir = tmp("csv-res")
    Seq((1L, "en", "x")).toDF("doc_id", "lang", "text")
      .write.option("header", "false").csv(dir)
    intercept[IllegalArgumentException] {
      CsvDocs.read(spark, dir, StructType(Seq(StructField("is_good", StringType))))
    }
    // a column the schema doesn't name simply doesn't exist downstream
    val cols = CsvDocs.read(spark, dir,
      StructType(Seq(StructField("doc_id", LongType)))).columns
    assert(cols === Array("doc_id"))
  }
}
