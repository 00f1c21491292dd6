package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * (the standard postings agg). Expansion has TWO plans:
  *   - `qgramIndex = false` (default): a |vocab|·|queryTerms|
  *     levenshtein scan over the DISTINCT-term frame — narrow
  *     strings, embarrassingly parallel; the right plan while the
  *     vocab fits a scan (the [[EdJoin]] prefix build costs more than
  *     it saves at small |vocab|).
  *   - `qgramIndex = true`: the 100 TB path this scaladoc used to
  *     only PROMISE — [[EdJoin]]'s q-gram count-filter machinery as
  *     an asymmetric index probe. Query terms long enough to own a
  *     survival set (length ≥ q·(maxDist+1): one edit destroys at
  *     most q content grams, so a qualifying pair must still SHARE a
  *     gram when the longer side owns > q·τ of them) join the
  *     vocab's exploded distinct-gram postings BY GRAM, length-filter
  *     (|Δlen| ≤ τ), dedup, and only the surviving candidates pay a
  *     levenshtein verify — the full-vocab scan never runs. Query
  *     terms too short for the lemma fall back to the scan ON THOSE
  *     TERMS ONLY (exactness first — for them every gram can be
  *     destroyed and the filter would silently drop matches). Both
  *     plans produce identical output (FuzzySpec parity pin).
  *
  * The expansion result is ≤ vocab-bounded but in practice a handful
  * of rows — it broadcasts into the scoring join, so document rows
  * never shuffle for the join. */
object Fuzzy {

  /** Top-`k` docs by fuzzy-expanded term frequency:
    * (id, score, n_terms) — score desc, id asc; n_terms = distinct
    * query terms with at least one expansion hit in the doc. */
  def termSearch(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 maxDist: Int = 1, qgramIndex: Boolean = false,
                 q: Int = 2): DataFrame = {
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
    require(q >= 1, s"q must be >= 1, got $q")
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
    val vocab = tf.select(col("term")).distinct()

    def scanExpansion(terms: Seq[String]): DataFrame =
      vocab.crossJoin(broadcast(terms.toDF("qterm")))
        .where(levenshtein(col("term"), col("qterm")) <= lit(maxDist))
        .select(col("term"), col("qterm"))

    val distinctQ = queryTerms.distinct
    val expansions =
      if (!qgramIndex) scanExpansion(distinctQ)
      else {
        // survival cutoff: a length-l term owns l−q+1 positional
        // grams; τ edits destroy ≤ q·τ, so l ≥ q·(τ+1) guarantees a
        // survivor — and the survivor's CONTENT gram must appear
        // somewhere in the other string (it is unedited), so the
        // content-gram join loses no qualifying pair
        val longQ = distinctQ.filter(_.length >= q * (maxDist + 1))
        val shortQ = distinctQ.filterNot(_.length >= q * (maxDist + 1))
        val viaIndex =
          if (longQ.isEmpty) spark.emptyDataset[(String, String)]
            .toDF("term", "qterm")
          else {
            val qGrams = longQ
              .flatMap(t => t.sliding(q).toSeq.distinct.map(g => (g, t)))
              .toDF("gram", "qterm")
            val vGrams = vocab
              .where(length(col("term")) >= q) // shorter can't be within τ of a long query (Δlen > τ)
              .select(col("term"), explode(array_distinct(charGrams(col("term"), q))).as("gram"))
            vGrams.join(broadcast(qGrams), Seq("gram"))
              .where(abs(length(col("term")) - length(col("qterm"))) <= lit(maxDist))
              .select(col("term"), col("qterm")).distinct()
              .where(levenshtein(col("term"), col("qterm")) <= lit(maxDist))
          }
        if (shortQ.isEmpty) viaIndex
        else viaIndex.unionByName(scanExpansion(shortQ))
      }

    tf.join(broadcast(expansions), Seq("term"))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("score"),
        countDistinct(col("qterm")).as("n_terms"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** All positional `q`-char grams of a string column as an array —
    * builtin-only (`transform` over a `sequence`, codegen'd), no UDF.
    * Callers guard `length(s) >= q` (an empty `sequence` range would
    * otherwise run hi < lo). */
  private def charGrams(s: Column, q: Int): Column =
    transform(sequence(lit(1), length(s) - lit(q - 1)),
      i => s.substr(i, lit(q)))
}
