package graft

import org.apache.spark.sql.functions._

import graft.operators.Positional

/** Positional search: phrase/proximity semantics on hand vectors
  * (overlaps, windows, ties), on-the-fly == persisted-index parity,
  * driver-side range pruning, guards. */
class PositionalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("phrase semantics: overlapping occurrences count") {
    val d = docs(1L -> "a a a", 2L -> "a b a", 3L -> "b b")
    val got = Positional.phraseSearch(d, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L)) // positions 0-1 and 1-2 both match
  }

  test("phrase semantics: trigram, repeated terms, case folding") {
    val d = docs(
      1L -> "Slow hash batch then slow HASH batch",
      2L -> "slow batch hash",
      3L -> "slow hash")
    val got = Positional.phraseSearch(d, "doc_id", "text",
        Seq("slow", "hash", "batch"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L)) // tokenization lowercases; 2/3 lack the trigram
  }

  test("proximity semantics: window inclusive, pair count, min distance") {
    val d = docs(
      1L -> "x q q y x",          // x@0,4  y@3: pairs |0-3|=3, |4-3|=1
      2L -> "x q q q y",          // |0-4|=4 > 3 -> excluded
      3L -> "y x")                // adjacent, distance 1
    val got = Positional.proximitySearch(d, "doc_id", "text", "x", "y", 3L)
      .select($"id", $"n_pairs", $"min_dist")
      .as[(Long, Long, Long)].collect()
      .map { case (id, np, md) => id -> ((np, md)) }.toMap
    assert(got === Map(1L -> ((2L, 1L)), 3L -> ((1L, 1L))))
  }

  test("on-the-fly == persisted index, and the index read prunes ranges") {
    val d = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("pos-idx").toString
    Positional.buildPersistedIndex(d, "doc_id", "text", nRanges = 8, dir)
    for (phrase <- Seq(Seq("table", "hash"), Seq("big", "order", "scan"),
        Seq("customer"))) {
      val fly = Positional.phraseSearch(d, "doc_id", "text", phrase)
        .orderBy($"id").as[(Long, Long)].collect().toSeq
      val idx = Positional.searchPersistedPhrase(spark, dir, phrase)
        .orderBy($"id").as[(Long, Long)].collect().toSeq
      assert(idx === fly, s"phrase $phrase")
      assert(fly.nonEmpty, s"phrase $phrase matches nothing — dead test")
    }
    // proximity parity through the same index
    val flyP = Positional.proximitySearch(d, "doc_id", "text",
        "customer", "join", 3L)
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    val idxP = Positional.searchPersistedProximity(spark, dir,
        "customer", "join", 3L)
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    assert(idxP === flyP && flyP.nonEmpty)
    // driver-side manifest pruning: a single-term read touches a
    // strict subset of the 8 range dirs
    val scan = Positional.readPostings(spark, dir, Seq("table"))
      .queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.isDefined, "expected a parquet scan under readPostings")
    val roots = scan.get.relation.location.rootPaths.map(_.toString)
    assert(roots.nonEmpty && roots.size < 8,
      s"expected a pruned range subset, read ${roots.size} ranges")
    // out-of-range terms: empty result, real postings schema
    val none = Positional.readPostings(spark, dir, Seq("zzzzzz…"))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("id", "term", "pos"))
  }

  test("postings explode only emits query-term rows") {
    val d = Tables.documents(spark, sfDir).limit(50)
    val p = Positional.postingsOf(d, "doc_id", "text", Seq("table", "hash"))
    assert(p.select($"term").distinct().as[String].collect().toSet
      .subsetOf(Set("table", "hash")))
    // positions are real token indexes: re-derive one doc by hand
    val row = d.select($"doc_id", $"text").as[(Long, String)].head()
    val toks = row._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val want = toks.zipWithIndex
      .collect { case (t, i) if t == "table" || t == "hash" => (t, i.toLong) }
      .toSet
    val got = p.filter($"id" === row._1).select($"term", $"pos")
      .as[(String, Long)].collect().toSet
    assert(got === want)
  }

  test("guards: empty phrase, same-term proximity, bad window") {
    val d = docs(1L -> "a b")
    intercept[IllegalArgumentException](
      Positional.phraseSearch(d, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](
      Positional.proximitySearch(d, "doc_id", "text", "a", "a", 3L))
    intercept[IllegalArgumentException](
      Positional.proximitySearch(d, "doc_id", "text", "a", "b", 0L))
  }
}
