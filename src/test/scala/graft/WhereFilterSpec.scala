package graft

import org.apache.spark.sql.functions._

import graft.functions.WhereFilter

/** A7 API parity: Chroma where-DSL JSON → Column translation. */
class WhereFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a.pdf", "en", 0.9),
    (2L, "b.pdf", "ko", 0.5),
    (3L, "c.txt", "en", 0.1),
    (4L, "d.pdf", "de", 0.7)
  ).toDF("doc_id", "doc_name", "lang", "score")

  private def ids(json: String): Set[Long] =
    df.filter(WhereFilter.parse(json)).select($"doc_id").as[Long].collect().toSet

  test("bare equality and $eq (the reference's two live forms)") {
    assert(ids("""{"doc_name": "a.pdf"}""") === Set(1L))
    assert(ids("""{"doc_name": {"$eq": "a.pdf"}}""") === Set(1L))
    assert(ids("""{"doc_id": 2}""") === Set(2L))
  }

  test("comparison operators") {
    assert(ids("""{"score": {"$gt": 0.5}}""") === Set(1L, 4L))
    assert(ids("""{"score": {"$gte": 0.5}}""") === Set(1L, 2L, 4L))
    assert(ids("""{"score": {"$lt": 0.5}}""") === Set(3L))
    assert(ids("""{"score": {"$lte": 0.5}}""") === Set(2L, 3L))
    assert(ids("""{"lang": {"$ne": "en"}}""") === Set(2L, 4L))
  }

  test("$in / $nin membership") {
    assert(ids("""{"lang": {"$in": ["en", "de"]}}""") === Set(1L, 3L, 4L))
    assert(ids("""{"lang": {"$nin": ["en", "de"]}}""") === Set(2L))
    assert(ids("""{"doc_id": {"$in": [1, 3]}}""") === Set(1L, 3L))
  }

  test("$and / $or / implicit AND over multiple keys") {
    assert(ids("""{"$and": [{"lang": "en"}, {"score": {"$gt": 0.5}}]}""") === Set(1L))
    assert(ids("""{"$or": [{"lang": "ko"}, {"score": {"$lt": 0.2}}]}""") === Set(2L, 3L))
    assert(ids("""{"lang": "en", "score": {"$gt": 0.5}}""") === Set(1L))
    // range via two ops on one field (implicit AND inside the op object)
    assert(ids("""{"score": {"$gte": 0.5, "$lt": 0.9}}""") === Set(2L, 4L))
    // nesting
    assert(ids("""{"$or": [{"$and": [{"lang": "en"}, {"score": {"$lt": 0.5}}]},
                           {"doc_name": "d.pdf"}]}""") === Set(3L, 4L))
  }

  test("$contains / $not_contains on a named field") {
    assert(ids("""{"doc_name": {"$contains": ".pdf"}}""") === Set(1L, 2L, 4L))
    assert(ids("""{"doc_name": {"$not_contains": ".pdf"}}""") === Set(3L))
    // substring, not equality or prefix
    assert(ids("""{"doc_name": {"$contains": "pd"}}""") === Set(1L, 2L, 4L))
    assert(ids("""{"doc_name": {"$contains": "a.pdf"}}""") === Set(1L))
  }

  test("parseDocument: Chroma where_document wire shape (top-level operators)") {
    def docIds(json: String): Set[Long] =
      df.filter(WhereFilter.parseDocument(json, "doc_name"))
        .select($"doc_id").as[Long].collect().toSet
    assert(docIds("""{"$contains": "pdf"}""") === Set(1L, 2L, 4L))
    assert(docIds("""{"$not_contains": "pdf"}""") === Set(3L))
    assert(docIds("""{"$and": [{"$contains": "pdf"}, {"$not_contains": "a."}]}""")
      === Set(2L, 4L))
    assert(docIds("""{"$or": [{"$contains": "a."}, {"$contains": "c."}]}""")
      === Set(1L, 3L))
    // malformed shapes — including Chroma's exactly-one-operator rule
    for (bad <- Seq(
      """{"$contains": 3}""",          // non-string needle
      """{"$regex": "x"}""",           // unknown operator
      """{"field": {"$contains": "x"}}""", // field form not valid here
      """{"$contains": "a", "$not_contains": "b"}""", // two top-level ops
      """{"$and": []}""",
      """{}"""
    )) assertThrows[IllegalArgumentException](WhereFilter.parseDocument(bad, "doc_name"))
  }

  test("malformed filters throw IllegalArgumentException") {
    for (bad <- Seq(
      """{"lang": {"$regex": "x"}}""",          // unknown operator
      """{"lang": {"$in": "en"}}""",            // $in needs an array
      """{"lang": {"$in": []}}""",              // empty array
      """{"$and": []}""",                       // empty logical
      """{}""",                                 // empty object
      """[1, 2]""",                             // not an object
      """not json at all""",
      """{"doc_id": {"$gt": 99999999999999999999}}""" // BigInt would wrap
    )) assertThrows[IllegalArgumentException](WhereFilter.parse(bad))
  }

  test("where-DSL filter pushes down to the parquet scan") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = emb.filter(WhereFilter.parse("""{"label": {"$eq": 3}}"""))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"), plan)
  }
}
