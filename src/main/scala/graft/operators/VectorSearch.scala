package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The reference's core query surface (SURVEY.md §2.A): brute-force exact
  * KNN over an embedding column, with optional metadata pre-filter,
  * similarity conversion, thresholding and ordering.
  *
  * Spark-first shape: `filter → withColumn(dist) → orderBy(dist, id) →
  * limit(k)`. Catalyst plans the sort+limit as `TakeOrderedAndProject`
  * (per-partition top-k heaps + driver merge — no global sort, no
  * shuffle), and pushes the metadata predicate + column pruning into the
  * parquet scan. That plan holds at 1000 executors: each task keeps a
  * k-sized heap over its split and ships k rows to the driver.
  *
  * Distance metrics (graft.functions.VectorExpressions) are codegen'd
  * float32 kernels; `l2sq` reproduces the reference bit-for-bit
  * (Chroma space=l2 on normalized vectors, `vector_store.py:139-171`),
  * `cosine`/`euclidean`/`dot` are the sane general-purpose metrics.
  */
object VectorSearch {

  sealed trait Metric { def dist(a: Column, b: Column): Column }
  /** squared L2 — the reference's metric (dist = 2 - 2*cos on unit vectors) */
  case object L2Sq extends Metric { def dist(a: Column, b: Column): Column = l2SqF32(a, b) }
  /** Euclidean — DuckDB list_distance bit-parity */
  case object Euclidean extends Metric { def dist(a: Column, b: Column): Column = l2DistF32(a, b) }
  /** cosine distance = 1 - cos_sim */
  case object Cosine extends Metric { def dist(a: Column, b: Column): Column = lit(1.0) - cosSimF32(a, b).cast("double") }
  /** negative dot product (monotone with cosine distance on unit vectors) */
  case object NegDot extends Metric { def dist(a: Column, b: Column): Column = -dotF32(a, b) }

  /** A1: top-k nearest rows to `queryVec`, optional pre-filter (A7).
    * Returns rows without the distance column. */
  def topK(chunks: DataFrame, queryVec: Seq[Float], k: Int,
           metric: Metric = L2Sq, filter: Option[Column] = None,
           embCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    topKWithScore(chunks, queryVec, k, metric, filter, embCol, idCol).drop("dist")

  /** A2: same, keeping the `dist` column (cast to double). */
  def topKWithScore(chunks: DataFrame, queryVec: Seq[Float], k: Int,
                    metric: Metric = L2Sq, filter: Option[Column] = None,
                    embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val pre = filter.map(chunks.filter).getOrElse(chunks)
    pre
      .withColumn("dist", metric.dist(col(embCol), typedLit(queryVec)).cast("double"))
      // nulls LAST: a null embedding yields a null dist (nullIntolerant
      // kernels) and Spark's default NULLS FIRST would seat such rows in
      // the top-k ahead of every real neighbor
      .orderBy(col("dist").asc_nulls_last, col(idCol)) // unique id tie-break (SURVEY §7.4)
      .limit(k)
  }

  /** A3+A4+A5: similarity = 1 - dist (`app.py:417-418`), threshold filter
    * (default 0.1, `config.py:49`), then sort by score desc. Applied
    * POST top-k exactly as the reference does.
    *
    * METRIC CONTRACT: 1 − dist is the reference's formula for its own
    * space — Chroma `space=l2` returns SQUARED L2 — so this pairs with
    * [[L2Sq]] `dist` columns ONLY. The oracle-gated queries use
    * [[Euclidean]] (DuckDB `list_distance` bit-parity) and inline the
    * numerically-equal `1 − dist·dist` instead (the
    * a3_score_threshold / e2e_reference_pipeline recipe); feeding a
    * Euclidean `dist` to THIS helper would score on a different
    * scale. VectorKernelSpec pins the two forms equal. */
  def scoreAndThreshold(topk: DataFrame, threshold: Double = 0.1,
                        idCol: String = "vec_id"): DataFrame =
    topk
      .withColumn("score", lit(1.0) - col("dist"))
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col(idCol))
      .drop("dist")

  /** A8 (intended semantics of the dead rerank path,
    * `search_engine.py:15-55`): over-fetch 2k candidates, keep the best
    * chunk per document, return top-k documents by that best score. */
  def bestChunkPerDoc(chunks: DataFrame, queryVec: Seq[Float], k: Int,
                      docCol: String, metric: Metric = L2Sq,
                      embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cands = topKWithScore(chunks, queryVec, 2 * k, metric, None, embCol, idCol)
    val w = Window.partitionBy(col(docCol)).orderBy(col("dist").asc_nulls_last, col(idCol))
    cands
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Fixed-point mean-pooled group embeddings — chunk→document (or
    * any group axis) aggregation of the embedding column: (grp,
    * n_members, pooled_fp: array<long>) with
    * pooled_fp[i] = floor( Σ_members floor(x_i·2^20) / n ).
    * The double-floor form is chosen over a float mean deliberately:
    * every step is exact integer arithmetic (per-element floor of an
    * exact f32, long sum, floor division replayed as
    * floor(double(s)/n) — exact while |s| < 2^53, i.e. ~10^9 unit-norm
    * members per group), so the pooled table is engine-identical and
    * the downstream ranking oracle-verifiable — a float mean would be
    * partition-order-dependent.
    *
    * Scale shape: ONE map-side-combined (grp, dim) aggregation over
    * the exploded column (n·d narrow rows), then a d-row-per-group
    * regroup — the word-freq shuffle shape, nothing corpus-sized
    * broadcasts. */
  def poolEmbeddingsFp(df: DataFrame, groupCol: String,
                       embCol: String = "embedding"): DataFrame = {
    val e = col(embCol)
    // pathological vectors (null; NaN/Inf components) are EXCLUDED
    // from the pool — the same contract as Sq.sq8Codes' zero path and
    // embeddingHealth's envelope: Spark would floor NaN to 0 and Inf
    // to Long.MaxValue silently while the SQL replay errors, so the
    // engine-identical claim only holds over finite inputs
    // (emb_health counts what this drops)
    val clean = df.filter(e.isNotNull &&
      size(filter(e, x => isnan(x) || x === lit(Float.PositiveInfinity) ||
        x === lit(Float.NegativeInfinity))) === 0)
    val px = clean
      .select(col(groupCol).as("grp"),
        posexplode(e).as(Seq("pos", "x")))
    px.groupBy(col("grp"), col("pos"))
      .agg(sum(floor(col("x").cast("double") * lit(Ann.FpScale.toDouble))
        .cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("mean_fp",
        floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n_members"),
        transform(array_sort(collect_list(struct(col("pos"), col("mean_fp")))),
          s => s.getField("mean_fp")).as("pooled_fp"))
  }

  /** Coarse routing over a [[poolEmbeddingsFp]] table: rank groups by
    * the EXACT int64 dot of the pooled fixed-point vector against the
    * identically-quantized query (desc, grp tie-break), keep
    * `kGroups`. The two-level retrieval pattern: route to the best
    * document/section groups first, exact-rerank chunks inside them —
    * IVF with data-defined "centroids". The pooled table is
    * |groups|·d longs; the rank is a TakeOrdered over it. */
  def routeByPooled(pooled: DataFrame, queryVec: Seq[Float],
                    kGroups: Int): DataFrame = {
    require(kGroups >= 1, s"kGroups must be >= 1, got $kGroups")
    require(queryVec.forall(java.lang.Float.isFinite),
      "routeByPooled: query vector must be finite (NaN floors to 0, Inf saturates)")
    val qfp = queryVec.map(x =>
      math.floor(x.toDouble * Ann.FpScale.toDouble).toLong).toArray
    val dotU = udf { (m: Seq[Long]) =>
      if (m == null) null
      else {
        val n = math.min(m.length, qfp.length)
        var s = 0L; var i = 0
        while (i < n) { s += m(i) * qfp(i); i += 1 }
        java.lang.Long.valueOf(s)
      }
    }
    pooled
      .withColumn("route_dot", dotU(col("pooled_fp")))
      .filter(col("route_dot").isNotNull)
      .orderBy(col("route_dot").desc, col("grp"))
      .limit(kGroups)
  }

  /** Late-interaction multi-vector retrieval (the ColBERT scoring
    * rule, Khattab & Zaharia SIGIR 2020): both sides are vector SETS —
    * the query a handful of token vectors, each document its chunk
    * vectors (`groupCol` groups them) — and
    * `score(q, d) = Σ_t max_{v∈d} cos(t, v)`: every query token finds
    * its best-matching document vector independently, so multi-topic
    * documents aren't punished the way single-pooled-vector scoring
    * punishes them, and single-vector [[bestChunkPerDoc]] (A8) is
    * exactly the 1-token special case.
    *
    * Engine-exact with NO handoff: per-vector sims are the f32 kernel,
    * per-group MAX is order-insensitive (unlike a sum, no float
    * accumulation-order hazard — this is why maxsim gates exactly
    * where mean-pooling needed fixed-point), and the final score is a
    * FIXED left-associative sum of the |q| maxes — one IEEE expression
    * both engines evaluate identically.
    *
    * Scale shape: one narrow map (|q| sim columns per vector row), one
    * map-side-combined group agg (groups·|q| doubles), one TakeOrdered
    * — nothing corpus-sized shuffles or broadcasts; |q| is a query,
    * not data, so the column fan-out is bounded by contract. Groups
    * whose vectors are all null score null and are excluded on both
    * engines. Returns (groupCol, max_sim_0.., maxsim_score) in
    * (score desc, group) order. */
  def maxSimTopK(vectors: DataFrame, groupCol: String,
                 queryVecs: Seq[Seq[Float]], k: Int,
                 embCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queryVecs.nonEmpty, "maxSimTopK needs at least one query vector")
    val sims = queryVecs.zipWithIndex.map { case (q, i) =>
      cosSimF32(col(embCol), typedLit(q)).cast("double").as(s"__sim_$i")
    }
    val maxes = queryVecs.indices
      .map(i => max(col(s"__sim_$i")).as(s"max_sim_$i"))
    val score = queryVecs.indices.map(i => col(s"max_sim_$i"))
      .reduceLeft(_ + _)
    vectors
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol) +: sims: _*)
      .groupBy(col(groupCol))
      .agg(maxes.head, maxes.tail: _*)
      .withColumn("maxsim_score", score)
      .filter(col("maxsim_score").isNotNull)
      .orderBy(col("maxsim_score").desc, col(groupCol))
      .limit(k)
  }

  /** Similarity-threshold calibration over a query sample — the
    * data-driven version of the reference's hardcoded
    * `SIMILARITY_THRESHOLD = 0.1` (`config.py:49`): per query,
    *  - `kth_score`: the k-th best cosine over the corpus (what a
    *    top-k search returns as its weakest hit);
    *  - `bg_p95`: the exact `pct`-percentile of the full similarity
    *    distribution (lower-nearest-rank: the element at
    *    ceil(pct·n) in (sim asc, id) order) — the BACKGROUND score
    *    level of non-matches;
    *  - `margin = kth_score − bg_p95`: a threshold placed inside a
    *    positive margin separates hits from background for that
    *    query; a non-positive margin says top-k scores are
    *    indistinguishable from noise at this k.
    *
    * Exactness: sims are the f32 kernel; the percentile is an exact
    * order statistic (no interpolation — engine-identical); the
    * position ceil(pct·n) is one IEEE multiply + ceil both engines
    * compute identically.
    *
    * Scale shape (two jobs): the asc-rank-ceil(pct·n) element's SIM
    * equals the desc-rank (m = n−ceil(pct·n)+1) element's sim (same
    * position in the sim multiset — tie-breaks move only the ID, and
    * the output carries sims alone), and m is the top-(1−pct) slice —
    * a bounded top-M selection. So: (1) one partial-agg count of each
    * query's valid-sim population (partitions·Q rows shuffled, Q rows
    * collected — Q is the calibration sample, driver-sized by
    * contract; the sim kernel runs in BOTH jobs rather than persisting
    * a corpus-sized scored frame); (2) a per-partition heap of
    * max(k, m_q) rows per query ([[PartitionedTopK.reduceTopBySim]])
    * so the rank shuffle carries ≤ partitions·Q·max(k,m_q) rows
    * instead of the full Q·|corpus| sim stream the three-window
    * formulation moved. m_q grows as (1−pct)·n_q — when any heap
    * would exceed [[CalibrationHeapCutoff]] entries (driver/executor
    * heap memory is Q·m·~48 B per partition), the operator falls back
    * to the windowed formulation, which sorts-and-spills instead of
    * heaping: identical output, exchange-heavy but memory-safe.
    * Null sims (null embeddings — the kernels are null-intolerant)
    * and null query ids drop before both the count and the heap
    * (Spark would seat NULLS FIRST asc where DuckDB seats them last;
    * a null query id cannot be reported against). The query-id column
    * is cast to long (the batchMmr convention). */
  def thresholdCalibration(chunks: DataFrame, queries: DataFrame, k: Int,
                           pct: Double = 0.95,
                           embCol: String = "embedding",
                           idCol: String = "vec_id",
                           qIdCol: String = "query_id",
                           qEmbCol: String = "query_embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(pct > 0.0 && pct < 1.0, s"pct must be in (0,1), got $pct")
    val spark = chunks.sparkSession
    val scored = chunks.crossJoin(broadcast(queries))
      .withColumn("__sim",
        graft.functions.VectorFunctions.cosSimF32(col(embCol), col(qEmbCol))
          .cast("double"))
      .filter(col("__sim").isNotNull)
      .select(col(qIdCol).cast("long").as(qIdCol), col(idCol), col("__sim"))
      .where(col(qIdCol).isNotNull)
    // per-query valid-sim population: map-side-combined partial agg,
    // partitions·Q rows shuffled, Q rows collected
    val counts = scored.groupBy(col(qIdCol))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mByQ = counts.map { case (q, n) =>
      q -> (n - math.ceil(pct * n).toLong + 1L)
    }
    val heapSizesL = mByQ.map { case (q, m) => q -> math.max(k.toLong, m) }
    if (heapSizesL.values.exists(_ > CalibrationHeapCutoff))
      return calibrationWindowed(scored, k, pct, idCol, qIdCol)
    val reduced = PartitionedTopK.reduceTopBySim(
      scored, heapSizesL.map { case (q, m) => q -> m.toInt },
      qIdCol, idCol, "__sim")
    import spark.implicits._
    val mDf = broadcast(mByQ.toSeq.toDF(qIdCol, "__m"))
    val wDesc = Window.partitionBy(col(qIdCol))
      .orderBy(col("__sim").desc, col(idCol))
    reduced
      .withColumn("__rd", row_number().over(wDesc))
      .join(mDf, Seq(qIdCol))
      .groupBy(col(qIdCol))
      .agg(max(when(col("__rd") === k, col("__sim"))).as("kth_score"),
        max(when(col("__rd") === col("__m"), col("__sim"))).as("bg_p95"))
      .withColumn("margin", col("kth_score") - col("bg_p95"))
      .orderBy(col(qIdCol))
  }

  /** Per-partition heap-size bound for [[thresholdCalibration]]: above
    * this the heap pass would hold Q·m ~48-byte entries per partition
    * (1M ≈ 48 MB per query per partition) and the sort-spill windowed
    * form is the memory-safe plan. */
  val CalibrationHeapCutoff: Long = 1L << 20

  /** The windowed [[thresholdCalibration]] formulation — exact twin of
    * the heap path (spec-pinned), used when a per-query top-M heap
    * would not fit: three stacked windows over the Q·n sim stream,
    * sort-based and spillable. `scored` is the filtered
    * (qIdCol long, idCol, __sim) frame. */
  private def calibrationWindowed(scored: DataFrame, k: Int, pct: Double,
                                  idCol: String, qIdCol: String): DataFrame = {
    val wDesc = Window.partitionBy(col(qIdCol))
      .orderBy(col("__sim").desc, col(idCol))
    val wAsc = Window.partitionBy(col(qIdCol))
      .orderBy(col("__sim").asc, col(idCol))
    val wAll = Window.partitionBy(col(qIdCol))
    scored
      .withColumn("__pos",
        ceil(lit(pct) * count(lit(1)).over(wAll)).cast("long"))
      .withColumn("__rd", row_number().over(wDesc))
      .withColumn("__ra", row_number().over(wAsc))
      .filter(col("__rd") === k || col("__ra") === col("__pos"))
      .groupBy(col(qIdCol))
      .agg(max(when(col("__rd") === k, col("__sim"))).as("kth_score"),
        max(when(col("__ra") === col("__pos"), col("__sim"))).as("bg_p95"))
      .withColumn("margin", col("kth_score") - col("bg_p95"))
      .orderBy(col(qIdCol))
  }

  /** Batch multi-query top-k (SURVEY §4.3.2): broadcast the (small) query
    * set against the (huge) corpus, window per query. The corpus side
    * never shuffles for the join (broadcast); the window shuffles only
    * `|corpus| * |queries|` narrow rows hash-partitioned by query id —
    * at scale, pre-aggregate per-partition with a top-k heap instead
    * (see graft.operators.PartitionedTopK). */
  def batchTopK(chunks: DataFrame, queries: DataFrame, k: Int,
                metric: Metric = Euclidean,
                embCol: String = "embedding", idCol: String = "vec_id",
                qIdCol: String = "query_id", qEmbCol: String = "query_embedding"): DataFrame = {
    val joined = chunks.crossJoin(broadcast(queries))
      .withColumn("dist", metric.dist(col(embCol), col(qEmbCol)).cast("double"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("dist").asc_nulls_last, col(idCol))
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(idCol), col("dist"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** Rocchio dense relevance feedback (Rocchio '71 — the DENSE
    * counterpart of [[Bm25.prfTopK]]): take the cosine top-`kFb`
    * feedback set, refine the query toward its centroid, re-rank the
    * corpus with the refined query.
    *
    * Engine-portable by exact integers end to end, NO handoff: the
    * refined query is `q'_j = wq·floor(q_j·2^20) + wf·(Σ_fb
    * floor(d_j·2^20) / kFb)` (truncating long division — Scala `/` ==
    * DuckDB `//` on any sign), and ranking is the pure-int64
    * asymmetric dot Σ_j floor(e_j·2^20)·q'_j — the Bq/Pq fixed-point
    * rule, so a float never orders anything. The feedback fetch is
    * the f32 cosine kernel (bit-equal to `list_cosine_similarity`).
    *
    * Scale shape: round 1 is a TakeOrdered top-kFb; the kFb feedback
    * vectors are collected (kFb-bounded — the qvec rule) and q' is
    * driver arithmetic; round 2 is one narrow map + TakeOrdered.
    * Neither round shuffles the corpus. Null embeddings drop before
    * both sorts (cross-engine null-order rule). */
  def rocchioTopK(corpus: DataFrame, queryVec: Seq[Float], kFb: Int, k: Int,
                  wq: Long = 2L, wf: Long = 1L,
                  embCol: String = "embedding",
                  idCol: String = "vec_id"): DataFrame = {
    require(kFb >= 1, s"kFb must be >= 1, got $kFb")
    require(k >= 1, s"k must be >= 1, got $k")
    val Scale = 1L << 20
    def fp(x: Float): Long = StrictMath.floor(x.toDouble * Scale.toDouble).toLong

    val fb = corpus
      .where(col(idCol).isNotNull && col(embCol).isNotNull)
      .withColumn("__sim", cosSimF32(col(embCol), typedLit(queryVec)).cast("double"))
      .orderBy(col("__sim").desc, col(idCol))
      .limit(kFb)
      .select(col(embCol))
      .collect().map(_.getSeq[Float](0))
    require(fb.nonEmpty, "empty corpus: no feedback set")
    val d = queryVec.length
    fb.foreach(v => require(v.length == d,
      s"ragged feedback embedding: ${v.length} vs $d"))
    val n = fb.length.toLong
    val qPrime: Array[Long] = Array.tabulate(d) { j =>
      var s = 0L
      fb.foreach(v => s += fp(v(j)))
      wq * fp(queryVec(j)) + wf * (s / n)
    }

    val dot = udf { (v: Seq[Float]) =>
      if (v == null || v.length != d) null
      else {
        var acc = 0L
        var j = 0
        while (j < d) { acc += fp(v(j)) * qPrime(j); j += 1 }
        java.lang.Long.valueOf(acc)
      }
    }
    corpus
      .where(col(idCol).isNotNull)
      .select(col(idCol), dot(col(embCol)).as("dot_fp"))
      .filter(col("dot_fp").isNotNull)
      .orderBy(col("dot_fp").desc, col(idCol))
      .limit(k)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("dot_fp").desc, col(idCol))).cast("long"))
  }
}
