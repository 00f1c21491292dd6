package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04) over the
  * corpus: terms are nodes, co-occurrence within a token window is an
  * (undirected, count-weighted) edge, and the weighted-PageRank
  * stationary scores rank the keywords — the graph-centrality
  * counterpart of the frequency/TF-IDF signals in
  * [[TextAnalysis]].
  *
  * Engine-portable arithmetic: scores are 1e9 fixed-point longs and
  * one iteration is
  * `pr'(v) = (15·ONE) div 100 + (85 · Σ_{u~v} (pr(u)·w(u,v)) div wdeg(u)) div 100`
  * — every operation an integer multiply/divide/sum on positive
  * longs, so the DuckDB oracle replays ALL of it (vocab cap, window
  * pair counts, degrees, and the full 10-round recursion as a
  * recursive CTE) from the raw text with no handoff and no float
  * anywhere. Ghost self-edges of weight 0 keep isolated kept terms in
  * every round (their score settles at the damping floor), mirrored
  * in the oracle.
  *
  * Scale shape: token counting and the banded pair self-join are the
  * distributed, corpus-sized work (per-doc cost dl·window, the
  * [[Positional.proximitySearch]] bound; postings carry KEPT terms
  * only — the in-array filter). The graph itself is `vocabCap`-bounded
  * (≤ cap² edges) and iterates driver-side — the NB-vocabCap /
  * BPE-merge-recursion rule: the collect is bounded by a required cap
  * at any corpus size (and since cap² can itself be large, the edge
  * collect is additionally guarded by an enforced `maxEdges` — the
  * driver never fetches more than maxEdges+1 rows), and a 10-round
  * loop over a capped graph is driver arithmetic, not cluster work.
  * Overflow headroom: pr ≤
  * cap·ONE and pr·w needs w ≤ 9e18/(cap·ONE) ≈ 1.4e8 co-occurrences
  * of one pair at cap 64 — guarded explicitly. */
object TextRank {

  /** Fixed-point unit for rank scores. */
  val One = 1000000000L

  /** Default cap on the collected edge set — ~100 MB of driver tuples,
    * far under any sane driver heap but far above what keyword graphs
    * need (a cap-64 gate graph has ≤ 2016 edges). */
  val DefaultMaxEdges: Int = 4000000

  /** Top-`k` corpus keywords: (term, textrank_fp), score desc, term.
    *
    * @param vocabCap REQUIRED graph bound: top-`vocabCap` terms by
    *   (count desc, term) form the node set.
    * @param window co-occurrence window in token positions (pairs at
    *   distance 1..window).
    * @param iterations fixed power-iteration rounds (TextRank
    *   converges in tens; a fixed count keeps both engines identical).
    * @param maxEdges ENFORCED bound on the collected edge set (the NB
    *   vocabCap-collect rule: every driver materialization carries an
    *   explicit required cap). vocabCap bounds edges only
    *   quadratically — cap 10⁴ admits up to ~5·10⁷ distinct
    *   co-occurring pairs — so the collect itself is guarded: the
    *   driver fetches AT MOST maxEdges+1 rows (one bounded action, not
    *   a full pull that then fails) and refuses loudly when the graph
    *   exceeds the cap. The remedy is a smaller vocabCap or window —
    *   TextRank keyword quality saturates far below graphs this
    *   size. */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               vocabCap: Int, k: Int,
               window: Long = 2L, iterations: Int = 10,
               maxEdges: Int = DefaultMaxEdges): DataFrame = {
    require(vocabCap >= 1, s"vocabCap must be >= 1, got $vocabCap")
    require(k >= 1, s"k must be >= 1, got $k")
    require(window >= 1L, s"window must be >= 1, got $window")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(maxEdges >= 1, s"maxEdges must be >= 1, got $maxEdges")
    val spark = docs.sparkSession
    import spark.implicits._

    val kept: Seq[String] = docs
      .select(explode(Bm25.terms(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(vocabCap)
      .select(col("term")).as[String].collect().toSeq
    if (kept.isEmpty) return Seq.empty[(String, Long)]
      .toDF("term", "textrank_fp")

    // banded positional self-join over kept-term postings; DISTINCT
    // column names per side (shared-lineage equality rule)
    val post = Positional.postingsOf(docs, idCol, textCol, kept).persist()
    Dedup.releaseAfterUse(post)
    val a = post.select(col("id").as("__ida"), col("term").as("__ta"),
      col("pos").as("__pa"))
    val b = post.select(col("id").as("__idb"), col("term").as("__tb"),
      col("pos").as("__pb"))
    val und = a.join(b,
        col("__ida") === col("__idb") &&
          col("__pb") > col("__pa") &&
          col("__pb") <= col("__pa") + lit(window) &&
          col("__ta") =!= col("__tb"))
      .select(least(col("__ta"), col("__tb")).as("u"),
        greatest(col("__ta"), col("__tb")).as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      .limit(maxEdges + 1) // bounded action: never pulls an unbounded graph
      .as[(String, String, Long)].collect()
    require(und.length <= maxEdges,
      s"TextRank graph exceeds maxEdges=$maxEdges at vocabCap=$vocabCap/" +
        s"window=$window — shrink the vocab cap or window (keyword quality " +
        "saturates far below graphs this size) or raise the cap explicitly")

    // driver-side exact integer power iteration over the capped graph
    val wdeg = scala.collection.mutable.Map.empty[String, Long]
    und.foreach { case (u, v, w) =>
      wdeg(u) = wdeg.getOrElse(u, 0L) + w
      wdeg(v) = wdeg.getOrElse(v, 0L) + w
      require(w <= Long.MaxValue / (vocabCap.toLong * One),
        s"pair weight $w overflows the fixed-point iteration at cap $vocabCap")
    }
    var pr: Map[String, Long] = kept.map(_ -> One).toMap
    val floorTerm = 15L * One / 100L
    var it = 0
    while (it < iterations) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      und.foreach { case (u, v, w) =>
        contrib(v) = contrib.getOrElse(v, 0L) + pr(u) * w / wdeg(u)
        contrib(u) = contrib.getOrElse(u, 0L) + pr(v) * w / wdeg(v)
      }
      pr = kept.map(t =>
        t -> (floorTerm + 85L * contrib.getOrElse(t, 0L) / 100L)).toMap
      it += 1
    }

    pr.toSeq.sortBy { case (t, s) => (-s, t) }.take(k)
      .toDF("term", "textrank_fp")
  }
}
