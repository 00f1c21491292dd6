package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Rerank

/** MMR diversified reranking: kernel semantics (true-max redundancy,
  * tie-breaks, order independence), f32 kernel parity with the codegen
  * expression, and the batch operator against an independent naive
  * reference. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(ids: Seq[Long], sims: Seq[Double],
                     embs: Seq[Array[Float]], k: Int, lambda: Double) =
    Rerank.mmrKernel(ids.toArray, sims.toArray, embs.toArray, k, lambda)
      .toSeq.map(p => (p.id, p.rank, p.score))

  test("cosSimLocal is bit-identical to the CosineSimF32 expression") {
    val rows = Tables.embeddings(spark, sfDir).filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val viaExpr = Tables.embeddings(spark, sfDir).filter($"vec_id" < 40)
      .crossJoin(Tables.embeddings(spark, sfDir).filter($"vec_id" < 40)
        .select($"vec_id".as("b_id"), $"embedding".as("b_emb")))
      .select($"vec_id", $"b_id", cosSimF32($"embedding", $"b_emb").as("s"))
      .as[(Long, Long, Float)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val byId = rows.map { case (id, e) => id -> e.toArray }.toMap
    for (((a, b), s) <- viaExpr)
      assert(Rerank.cosSimLocal(byId(a), byId(b)) === s, s"pair ($a,$b)")
  }

  test("first pick is the similarity argmax; scores carry the lambda blend") {
    val e = Array(1.0f, 0.0f)
    val out = kernel(Seq(10L, 20L, 30L), Seq(0.2, 0.9, 0.5),
      Seq(e, e, e), k = 1, lambda = 0.5)
    assert(out === Seq((20L, 1L, 0.45)))
  }

  test("a near-duplicate of the first pick is deferred below a diverse candidate") {
    // 20 is almost identical to the top pick 10; 30 is orthogonal with
    // lower query sim — plain top-k would return (10, 20), MMR (10, 30)
    val a = Array(1.0f, 0.0f, 0.0f)
    val aDup = Array(0.999f, 0.04f, 0.0f)
    val ortho = Array(0.0f, 0.0f, 1.0f)
    val out = kernel(Seq(10L, 20L, 30L), Seq(0.9, 0.89, 0.3),
      Seq(a, aDup, ortho), k = 2, lambda = 0.5)
    assert(out.map(_._1) === Seq(10L, 30L))
  }

  test("redundancy uses the TRUE max — a negative cosine is a diversity bonus") {
    // candidate 30 is ANTI-correlated with the first pick: its
    // redundancy term is negative, so its MMR score must EXCEED
    // lambda*sim (the 0-clamped form would cap it at lambda*sim and
    // mis-rank it below 20)
    val a = Array(1.0f, 0.0f)
    val anti = Array(-1.0f, 0.0f)
    val meh = Array(0.0f, 1.0f)
    val out = kernel(Seq(10L, 20L, 30L), Seq(0.9, 0.3, 0.29),
      Seq(a, meh, anti), k = 3, lambda = 0.5)
    assert(out(0)._1 === 10L)
    assert(out(1)._1 === 30L, "anti-correlated candidate wins the bonus")
    assert(out(1)._3 === 0.5 * 0.29 - 0.5 * (-1.0))
  }

  test("lambda=1 degenerates to plain similarity order") {
    val es = Seq(Array(1.0f, 0.0f), Array(0.9f, 0.1f), Array(0.8f, 0.2f))
    val out = kernel(Seq(3L, 2L, 1L), Seq(0.7, 0.8, 0.9), es, k = 3, lambda = 1.0)
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out.map(_._3) === Seq(0.9, 0.8, 0.7))
  }

  test("score ties break to the smaller id; k beyond candidates returns all, dense ranks") {
    val e1 = Array(1.0f, 0.0f); val e2 = Array(0.0f, 1.0f)
    val out = kernel(Seq(7L, 5L), Seq(0.4, 0.4), Seq(e1, e2), k = 10, lambda = 1.0)
    assert(out === Seq((5L, 1L, 0.4), (7L, 2L, 0.4)))
  }

  test("picks are independent of candidate input order") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 12).map(_ => Array.fill(8)(rnd.nextFloat() - 0.5f))
    val sims = (0 until 12).map(_ => rnd.nextDouble())
    val ids = (0 until 12).map(i => (i * 31 % 12).toLong)
    val base = kernel(ids, sims, es, k = 5, lambda = 0.5)
    val perm = rnd.shuffle((0 until 12).toList)
    val shuffled = kernel(perm.map(ids), perm.map(sims), perm.map(es), 5, 0.5)
    assert(shuffled === base)
  }

  test("batchMmr matches an independent naive MMR over brute-force candidates") {
    val emb = Tables.embeddings(spark, sfDir)
    val qs = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_embedding"))
    val got = Rerank.batchMmr(emb, qs, k = 6, fetchK = 16,
        candFilter = Some($"vec_id" =!= $"query_id"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // naive reference: recompute everything driver-side with its own loop
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().map { case (i, e) => i -> e.toArray }
    val expected = (0L until 3L).flatMap { q =>
      val qe = all.find(_._1 == q).get._2
      val cands = all.filter(_._1 != q)
        .map { case (id, e) => (id, Rerank.cosSimLocal(e, qe).toDouble, e) }
        .sortBy { case (id, s, _) => (-s, id) }.take(16)
      var picked = List.empty[(Long, Array[Float])]
      (1 to 6).map { rank =>
        val best = cands.filter(c => !picked.exists(_._1 == c._1))
          .map { case (id, s, e) =>
            val red =
              if (picked.isEmpty) 0.0
              else picked.map(p => Rerank.cosSimLocal(e, p._2).toDouble).max
            (id, 0.5 * s - 0.5 * red, e)
          }
          .minBy { case (id, sc, _) => (-sc, id) }
        picked ::= (best._1, best._3)
        (q, best._1, rank.toLong, best._2)
      }
    }
    assert(got === expected)
  }

  test("contextBudget: ranked prefix stops at first overflow (not knapsack), per query") {
    val df = Seq(
      (1L, 1L, 50L), (1L, 2L, 60L), (1L, 3L, 5L), // 5-token rank-3 would fit, but rank-2 overflowed
      (2L, 1L, 200L), (2L, 2L, 10L),              // first candidate alone blows the budget
      (3L, 1L, 100L)                              // exact fit kept
    ).toDF("query_id", "rn", "n_tokens")
    val out = Rerank.contextBudget(df, budget = 100)
      .select($"query_id", $"rn", $"cum_tokens")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 1L, 50L), (3L, 1L, 100L)))
  }

  test("contextBudget: null or negative token counts fail loud, not pack garbage") {
    val withNull = Seq((1L, 1L, Option(5L)), (1L, 2L, Option.empty[Long]))
      .toDF("query_id", "rn", "n_tokens")
    val e1 = intercept[Exception](
      Rerank.contextBudget(withNull, budget = 100).collect())
    assert(e1.getMessage.contains("contextBudget") ||
      Option(e1.getCause).exists(_.getMessage.contains("contextBudget")))
    val withNeg = Seq((1L, 1L, 5L), (1L, 2L, -3L))
      .toDF("query_id", "rn", "n_tokens")
    intercept[Exception](Rerank.contextBudget(withNeg, budget = 100).collect())
  }

  test("contextBudget: zero-token rows ride free; budget must be positive") {
    val df = Seq((1L, 1L, 0L), (1L, 2L, 7L), (1L, 3L, 0L))
      .toDF("query_id", "rn", "n_tokens")
    val out = Rerank.contextBudget(df, budget = 7)
      .select($"rn", $"cum_tokens").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 0L), (2L, 7L), (3L, 7L)))
    intercept[IllegalArgumentException](Rerank.contextBudget(df, budget = 0))
  }

  test("batchMmr guards: fetchK >= k, lambda in [0,1]") {
    val emb = Tables.embeddings(spark, sfDir)
    val qs = emb.limit(1).select($"vec_id".as("query_id"),
      $"embedding".as("query_embedding"))
    intercept[IllegalArgumentException](Rerank.batchMmr(emb, qs, 5, 4))
    intercept[IllegalArgumentException](Rerank.batchMmr(emb, qs, 2, 4, lambda = 1.5))
  }
}
