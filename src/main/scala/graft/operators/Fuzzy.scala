package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy term search: edit-distance query expansion + integer tf
  * scoring — what catches the typo'd query ("vecto" → "vector") that
  * exact-term BM25 and the positional index both miss.
  *
  * Each query term expands to every corpus-vocabulary term within
  * `maxDist` levenshtein edits; documents score Σ tf over the expanded
  * set (a term reachable from two query terms counts once per query
  * term — the standard multi-set OR), with the matched-query-term
  * count alongside. All-integer outputs, and both engines ship the
  * same classic unweighted Wagner-Fischer `levenshtein`, so the
  * oracle replays the WHOLE pipeline (vocab, expansion, scoring, cut)
  * from raw text with no handoff.
  *
  * Scale shape: the tf aggregation is the one corpus-sized shuffle
  * (the standard postings agg); the expansion scan is
  * |vocab|·|queryTerms| levenshtein calls over the DISTINCT-term
  * frame — narrow strings, embarrassingly parallel, and |q| is tiny.
  * A production system at 100 TB would pre-filter the vocab scan with
  * [[EdJoin]]'s q-gram machinery; at |q| this small the plain scan is
  * the right plan (the EdJoin prefix build costs more than it saves).
  * The expansion result is ≤ vocab-bounded but in practice a handful
  * of rows — it broadcasts into the scoring join, so document rows
  * never shuffle for the join. */
object Fuzzy {

  /** Top-`k` docs by fuzzy-expanded term frequency:
    * (id, score, n_terms) — score desc, id asc; n_terms = distinct
    * query terms with at least one expansion hit in the doc. */
  def termSearch(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 maxDist: Int = 1): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // the vocab lives in the tokenizer alphabet; a cased/punctuated
    // query term would never exact-match yet silently spend its whole
    // edit budget on normalization ("Hash" fuzzy-matching every
    // 'hash') — refuse instead
    require(queryTerms.forall(_.matches("[a-z0-9]+")),
      s"queryTerms must be lowercase [a-z0-9]+ (the tokenizer alphabet), " +
        s"got ${queryTerms.filterNot(_.matches("[a-z0-9]+")).mkString(", ")}")
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val spark = docs.sparkSession
    import spark.implicits._

    // tf per (doc, term): the one corpus-sized agg; persist-once — the
    // vocab derives from it, so the tokenize scan must not run twice.
    // Null-id docs never score (cross-engine null-order hygiene).
    val tf = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(Bm25.terms(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    Dedup.releaseAfterUse(tf)

    val q = queryTerms.distinct.toDF("qterm")
    val expansions = tf.select(col("term")).distinct()
      .crossJoin(broadcast(q))
      .where(levenshtein(col("term"), col("qterm")) <= lit(maxDist))

    tf.join(broadcast(expansions), Seq("term"))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("score"),
        countDistinct(col("qterm")).as("n_terms"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
