package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Diversity-aware retrieval reranking: Maximal Marginal Relevance
  * (Carbonell & Goldstein 1998). Plain top-k returns the k nearest
  * chunks, which on redundant corpora means k paraphrases of the same
  * passage; a RAG prompt wants coverage. MMR greedily picks
  *
  *   argmax_d  λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s)
  *
  * over the unpicked candidates (S = already-picked set; the
  * redundancy term is 0 for the first pick, the TRUE max — possibly
  * negative — afterwards). LangChain exposes exactly this over Chroma
  * retrievers as `search_type="mmr"` (reference `vector_store.py`
  * builds plain-similarity retrievers; MMR is the adjacent mode of the
  * same surface), so it belongs to the engine's serving family.
  *
  * Scale shape: the CORPUS-sized work is only the candidate top-fetchK
  * per query — the [[VectorSearch.batchTopK]] window (broadcast query
  * set, `WindowGroupLimit` keeps each task's local top-fetchK before
  * the per-query exchange). The greedy loop itself touches ≤ fetchK
  * rows per query (k·fetchK pairwise cosines, each d flops) inside ONE
  * task per query — bounded by construction, never corpus-dependent.
  *
  * Determinism/oracle contract: query and pairwise similarities are
  * the [[graft.functions.VectorExpressions.CosineSimF32]] f32 kernel
  * (bit-equal to DuckDB `list_cosine_similarity` — the cosine_topk
  * contract); the λ-blend is two IEEE double ops on those exact
  * values, so scores are engine-identical and every argmax (tie →
  * smaller id) replays in SQL as a recursive CTE.
  */
object Rerank {

  /** Executor/driver-local twin of the CosineSimF32 kernel
    * (functions/VectorExpressions.scala:174) — same f32 sequential
    * accumulation, same float-rounded sqrt product, same zero-norm→0
    * guard, so kernel picks are bit-identical to expression-computed
    * similarities (spec-pinned in RerankSpec). */
  private[graft] def cosSimLocal(a: Array[Float], b: Array[Float]): Float = {
    val n = math.min(a.length, b.length)
    var dot = 0.0f; var na = 0.0f; var nb = 0.0f
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0f || nb == 0.0f) 0.0f
    else {
      // [-1, 1] clamp — must mirror CosineSimF32 (serve==batch parity)
      val r = dot / (math.sqrt(na.toDouble).toFloat * math.sqrt(nb.toDouble).toFloat)
      if (r > 1.0f) 1.0f else if (r < -1.0f) -1.0f else r
    }
  }

  /** One MMR selection row. */
  final case class MmrPick(id: Long, rank: Long, score: Double)

  /** Greedy MMR over ONE query's candidate set — the single shared
    * kernel behind the batch operator and the serving probe
    * ([[graft.serving.Serving.mmrIvf]]), so batch==serve picks cannot
    * fork. Scan-based argmax with the (score desc, id asc) tie-break;
    * the result is independent of candidate input order.
    *
    * `maxSim` tracks the TRUE maximum similarity to the picked set
    * (cosines can be negative — clamping at 0 would erase the
    * diversity bonus of anti-correlated candidates); only the first
    * pick, whose picked set is empty, uses a redundancy term of 0. */
  private[graft] def mmrKernel(ids: Array[Long], sims: Array[Double],
                               embs: Array[Array[Float]], k: Int,
                               lambda: Double): Array[MmrPick] = {
    val n = ids.length
    val picks = math.min(k, n)
    val maxSim = Array.fill(n)(Double.NegativeInfinity) // -inf = empty picked set
    val taken = new Array[Boolean](n)
    val out = new Array[MmrPick](picks)
    var rank = 0
    while (rank < picks) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val red = if (maxSim(i) == Double.NegativeInfinity) 0.0 else maxSim(i)
          val score = lambda * sims(i) - (1.0 - lambda) * red
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      out(rank) = MmrPick(ids(best), rank + 1L, bestScore)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = cosSimLocal(embs(i), embs(best)).toDouble
          if (s > maxSim(i)) maxSim(i) = s
        }
        i += 1
      }
      rank += 1
    }
    out
  }

  /** Batch MMR: for each query in `queries` ((qIdCol: long, qEmbCol)),
    * fetch the `fetchK` most-similar candidates by f32 cosine
    * (desc, id tie-break; null-embedding rows drop), then emit the
    * greedy MMR top-k as (qIdCol, idCol, mmr_rank, mmr_score) in
    * (query, rank) order.
    *
    * `candFilter` runs on the corpus×query join, so it can reference
    * both sides — self-exclusion (`col(idCol) =!= col(qIdCol)`) or a
    * per-query metadata predicate (the Chroma `where` + MMR
    * combination). The second exchange after the candidate window
    * moves only queries·fetchK rows — and the FIRST (window) exchange
    * never carries the |corpus|·Q sim stream either: Catalyst plans
    * the `row_number <= fetchK` filter as a map-side Partial
    * WindowGroupLimit below the exchange (PlanSpec pins it), which IS
    * the per-partition heap pre-aggregation `PartitionedTopK` hand
    * writes, emitted for free from the declarative plan. */
  def batchMmr(chunks: DataFrame, queries: DataFrame, k: Int, fetchK: Int,
               lambda: Double = 0.5, candFilter: Option[Column] = None,
               embCol: String = "embedding", idCol: String = "vec_id",
               qIdCol: String = "query_id",
               qEmbCol: String = "query_embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fetchK >= k, s"fetchK ($fetchK) must be >= k ($k)")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = chunks.sparkSession
    import spark.implicits._
    val joined0 = chunks.crossJoin(broadcast(queries))
    val joined = candFilter.map(joined0.filter).getOrElse(joined0)
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("__sim").desc, col(idCol))
    val cands = joined
      .withColumn("__sim", cosSimF32(col(embCol), col(qEmbCol)).cast("double"))
      .filter(col("__sim").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= fetchK)
      .select(col(qIdCol).cast("long"), col(idCol).cast("long"),
        col("__sim"), col(embCol).cast("array<float>"))
      .as[(Long, Long, Double, Seq[Float])]
    cands.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val arr = it.toArray
        mmrKernel(arr.map(_._2), arr.map(_._3), arr.map(_._4.toArray), k, lambda)
          .iterator.map(p => (qid, p.id, p.rank, p.score))
      }
      .toDF(qIdCol, idCol, "mmr_rank", "mmr_score")
      .orderBy(col(qIdCol), col("mmr_rank"))
  }

  /** RAG context assembly under a token budget — the step between
    * retrieval and the LLM call (the reference's serving flow stuffs
    * retrieved chunks into the prompt; a budget-aware assembler is
    * what that becomes once prompts have a hard token limit): keep
    * each query's ranked PREFIX whose cumulative token count stays
    * within `budget`, stopping at the first overflow (rank order is
    * relevance order — skipping a big chunk to squeeze in a worse one
    * would reorder evidence; next-fit packing for training batches is
    * [[Packing]]'s job, not serving's).
    *
    * `ranked`: (qIdCol, rankCol, tokCol, ...) — a per-query ranked
    * candidate frame (Q·k rows, nothing corpus-sized). Adds
    * `cum_tokens` (running total in rank order, exact longs) and
    * filters to the budget prefix; one hash exchange by query id.
    * Token counts are non-negative, so the running total is monotone
    * and the `<= budget` filter IS the stop-at-first-overflow prefix. */
  def contextBudget(ranked: DataFrame, budget: Long,
                    qIdCol: String = "query_id", rankCol: String = "rn",
                    tokCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // the whole contract rests on non-negative, known token counts: a
    // null would be SKIPPED by the windowed sum (the row inherits the
    // previous cumulative and ships with unknown cost — a blown
    // prompt budget at serve time), a negative count would make the
    // cumsum non-monotone (the <= filter then keeps a non-prefix
    // subset). Fail loud in-plan instead of packing garbage.
    val tok = when(col(tokCol).isNotNull && col(tokCol) >= 0,
      col(tokCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"contextBudget: null/negative $tokCol at rank "),
        col(rankCol).cast("string"))).cast("long"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col(rankCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("cum_tokens", sum(tok).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
