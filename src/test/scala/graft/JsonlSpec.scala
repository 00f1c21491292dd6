package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Maintenance
import graft.sources.JsonlDocs

/** JSONL source + corpus-diff spec: round-trip fidelity (unicode,
  * embedded quotes/newlines), quarantine exactness, blank-line and
  * missing-field semantics; diff status matrix. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("round trip preserves unicode, quotes and newlines exactly") {
    withTempDir("jsonl-spec") { dir =>
      val rows = Seq((1L, "한국어 텍스트 🙂"), (2L, "with \"quotes\""),
        (3L, "line one\nline two"), (4L, "tab\there"))
      JsonlDocs.write(rows.toDF("doc_id", "text"), dir.getAbsolutePath)
      val back = JsonlDocs.read(spark, dir.getAbsolutePath, schema)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(back === rows)
    }
  }

  test("corrupt lines quarantine; good lines all survive") {
    withTempDir("jsonl-spec") { dir =>
      JsonlDocs.write((1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
        dir.getAbsolutePath)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"${dir.getAbsolutePath}/part-bad.json"),
        "{\"doc_id\": oops}\n\nplainly not json\n{\"doc_id\": 99, \"text\": \"fine\"}\n")
      val (good, bad) = JsonlDocs.readWithQuarantine(spark, dir.getAbsolutePath, schema)
      val ids = good.select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids === ((1L to 20L) :+ 99L))
      // blank line is ignored, exactly the two malformed lines quarantine
      assert(bad.as[String].collect().sorted.toSeq ===
        Seq("{\"doc_id\": oops}", "plainly not json").sorted)
    }
  }

  test("valid object missing a field is good, with a null column") {
    withTempDir("jsonl-spec") { dir =>
      java.nio.file.Files.createDirectories(dir.toPath)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"${dir.getAbsolutePath}/part-0.json"),
        "{\"doc_id\": 7}\n")
      val good = JsonlDocs.read(spark, dir.getAbsolutePath, schema).collect()
      assert(good.length === 1)
      assert(good(0).getLong(0) === 7L && good(0).isNullAt(1))
    }
  }

  test("readWithStatus: one pass, one row per non-blank line") {
    withTempDir("jsonl-spec") { dir =>
      java.nio.file.Files.createDirectories(dir.toPath)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"${dir.getAbsolutePath}/part-0.json"),
        "{\"doc_id\": 1, \"text\": \"ok\"}\nbroken\n\t\n{\"doc_id\": 2, \"text\": \"ok2\"}\n")
      val st = JsonlDocs.readWithStatus(spark, dir.getAbsolutePath, schema)
        .select($"is_good", $"doc_id", $"raw_line")
        .as[(Boolean, Option[Long], String)].collect().sortBy(_._3)
      assert(st.length === 3) // tab-only line is blank, not quarantined
      assert(st.count(_._1) === 2)
      val bad = st.filter(!_._1).head
      assert(bad._3 === "broken" && bad._2.isEmpty)
    }
  }

  test("corpusDiff: null text is a comparable value, not absence") {
    val oldDocs = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String]), (4L, "x")).toDF("doc_id", "text")
    val newDocs = Seq((1L, null.asInstanceOf[String]), (3L, "y"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val statuses = Maintenance.corpusDiff(oldDocs, newDocs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(statuses === Map(1L -> "unchanged", 2L -> "removed",
      3L -> "added", 4L -> "changed"))
  }

  test("corpusDiff: a null id compares across snapshots, not removed+added") {
    val oldDocs = Seq((Option(1L), "a"), (Option.empty[Long], "n")).toDF("doc_id", "text")
    val sameDocs = Seq((Option(1L), "a"), (Option.empty[Long], "n")).toDF("doc_id", "text")
    val editedNull = Seq((Option(1L), "a"), (Option.empty[Long], "n2")).toDF("doc_id", "text")
    val same = graft.operators.Maintenance.corpusDiff(oldDocs, sameDocs, "doc_id", "text")
      .select("status").as[String].collect()
    assert(same.forall(_ == "unchanged"), s"got ${same.mkString(",")}")
    val edited = graft.operators.Maintenance
      .corpusDiff(oldDocs, editedNull, "doc_id", "text")
      .as[(Option[Long], String)].collect().toMap
    assert(edited(None) === "changed" && edited(Some(1L)) === "unchanged")
  }

  test("corpusHealth: dotted column names resolve as columns, not field paths") {
    val df = Seq((1L, "x"), (2L, null)).toDF("id", "meta.source")
    val h = graft.operators.Maintenance.corpusHealth(df)
      .as[(String, String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(h("meta.source") === (("meta.source", "string", 2L, 1L, Some(0L))))
  }

  test("corpusHealth: per-column null/blank counts, one aggregation pass") {
    val df = Seq(
      (Option(1L), Option("a")),
      (Option.empty[Long], Option("")),
      (Option(3L), Option.empty[String]),
      (Option(4L), Option("  "))).toDF("id", "t")
    val h = graft.operators.Maintenance.corpusHealth(df)
      .as[(String, String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(h("id") === (("id", "bigint", 4L, 1L, None)))
    // blanks: "" and whitespace-only; the NULL string is a null, not a blank
    assert(h("t") === (("t", "string", 4L, 1L, Some(2L))))
  }

  test("corpusDiff: full status matrix and slim join payload") {
    val oldDocs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newDocs = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val statuses = Maintenance.corpusDiff(oldDocs, newDocs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(statuses === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val stats = Maintenance.corpusDiffStats(oldDocs, newDocs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(stats === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }
}
