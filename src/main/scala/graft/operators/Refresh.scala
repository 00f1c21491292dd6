package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance for training-data pipelines:
  * merge-by-key upsert (the parquet analog of Delta MERGE) and
  * stratified sampling.
  */
object Refresh {

  /** Upsert: incoming rows replace existing rows with the same key;
    * everything else unions through. Plan: one left-anti join (existing
    * minus incoming keys) + union — the keep-latest-by-key semantics of
    * a MERGE without a transactional table format. At scale the
    * anti-join broadcasts the incoming key set (incremental batches are
    * small relative to the corpus). */
  def upsertByKey(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.join(incoming.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(incoming)

  /** Keep-latest dedup: one row per key, the one with the max version.
    * `tieBreakCols` makes equal-version ties deterministic (ordered
    * ascending after version desc); without them, which duplicate of an
    * exactly-tied version survives is partitioning-dependent. */
  def latestByKey(df: DataFrame, key: String, versionCol: String,
                  tieBreakCols: Seq[String] = Nil): DataFrame = {
    val ordering = col(versionCol).desc +: tieBreakCols.map(col(_).asc)
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Stratified sample: per-stratum fractions with a fixed seed —
    * deterministic for a given (data, seed), the sampling contract a
    * reproducible training-data pipeline needs. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Engine-portable deterministic stratified sample: row survival is a
    * pure function of (key, salt), not of any engine's RNG stream — the
    * reproducibility contract [[stratifiedSample]] cannot give (Spark's
    * sampler draws per-partition, so even Spark returns a different
    * sample under a different partitioning; this one is identical on a
    * laptop, a 1000-executor cluster, and in DuckDB).
    *
    * Construction (same family as [[Sharding.shardId]]): the top 52
    * md5 bits of `key:salt` are a uniform integer in [0, 2^52); a row
    * survives iff that integer < floor(fraction·2^52). 52 bits keeps
    * every value exact in an int64 AND in a double, so the threshold
    * literal is bit-identical in any engine. Rows whose stratum is not
    * in `fractions` are dropped. Zero shuffle — the filter is a narrow
    * codegen projection; md5 is a stable sampling hash, not a security
    * boundary. */
  def stratifiedSampleDet(df: DataFrame, stratumCol: String,
                          fractions: Map[String, Double], keyCol: String,
                          salt: String): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    fractions.foreach { case (s, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction for '$s' must be in [0,1], got $f") }
    val u52 = conv(substring(md5(concat(col(keyCol).cast("string"),
      lit(":" + salt)).cast("binary")), 1, 13), 16, 10).cast("long")
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      val threshold = math.floor(f * 4503599627370496.0).toLong // 2^52
      acc || (col(stratumCol) === stratum && u52 < lit(threshold))
    }
    df.filter(keep)
  }

  /** Temperature-based domain mixing — the rebalancing step training
    * pipelines run before sampling a multi-domain corpus: domain d's
    * share of the output is ∝ n_d^alpha (alpha ∈ (0,1] flattens the
    * head; alpha = 1 is natural sampling — the multilingual-LM
    * "temperature" scheme). Deterministic and engine-portable, with no
    * RNG state: rows rank inside their domain by md5(key) — a fixed
    * pseudo-random but reproducible order — and domain d keeps its
    * first ceil(targetRows · n_d^alpha / Σ n^alpha) rows (capped at
    * n_d, so scarce domains simply keep everything).
    *
    * Plan: one small per-domain count aggregate (broadcast back) + one
    * window rank on the domain shuffle — two scans, no global window,
    * survives any corpus size. alpha = 0.5 computes via `sqrt`, which
    * IEEE requires correctly rounded in every engine (general `pow` is
    * not), so the oracle-gated path is bit-exact cross-engine.
    *
    * Contract notes: per-domain targets take `ceil`, so every nonempty
    * domain keeps ≥ 1 row and the output can exceed `targetRows` by up
    * to (#domains − 1) — the keep-every-domain floor is intentional
    * (losing a scarce domain entirely is worse than a small overshoot),
    * but with very many domains size the target accordingly. Rows with
    * a NULL domain are dropped (standard SQL grouping/join semantics,
    * matched deliberately so the DuckDB oracle reproduces the row set);
    * fill or filter them upstream. */
  def temperatureMix(df: DataFrame, domainCol: String, keyCol: String,
                     targetRows: Long, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val nD = col("__n_d").cast("double")
    val weight = if (alpha == 0.5) sqrt(nD) else pow(nD, lit(alpha))
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n_d"))
      .withColumn("__w", weight)
    val wsum = counts.agg(sum(col("__w")).as("__wsum"))
    val rankW = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df
      .join(broadcast(counts), Seq(domainCol))
      .crossJoin(broadcast(wsum))
      .withColumn("__rank", row_number().over(rankW))
      .filter(col("__rank") <= ceil(lit(targetRows.toDouble) * col("__w") / col("__wsum")))
      .drop("__n_d", "__w", "__wsum", "__rank")
  }

  /** Token-budget corpus assembly: per domain, keep the PREFIX of docs
    * (in deterministic md5 draw order) whose cumulative token count
    * starts within `budgetTokens` — "give me ~1B tokens of each
    * domain", the token-denominated complement to [[temperatureMix]]'s
    * row-denominated shares. A doc is kept iff the tokens BEFORE it in
    * draw order are < budget, so the selection overshoots by at most
    * one document (greedy prefix, not a knapsack — reproducibility
    * beats the last sliver of budget precision).
    *
    * One shuffle: a per-domain window cumsum in draw order, with an
    * explicit ROWS frame — the default frame under an ORDER BY is
    * RANGE, which sums ALL peer rows of a tie at once and would drop
    * every copy of a duplicated key instead of keeping a prefix.
    * Parallelism is the domain count (each domain's running sum is
    * sequential by nature — same contract
    * [[graft.operators.Packing.packDocs]] documents for shards); a
    * single mega-domain serializes its own sort but never the other
    * domains'. NULL domains are dropped, matching [[temperatureMix]]
    * and the SQL oracle. `keyCol` should be unique (dedup upstream):
    * duplicate keys draw identical md5s, and which tied row lands
    * inside the budget boundary is then partitioning luck. */
  /** The ONE owner of the deterministic greedy-prefix selection both
    * budget mixers share: md5 draw order, per-domain ROWS-frame
    * cumsum, keep iff the tokens BEFORE the row start within
    * `budgetCol` (a per-row Column — a literal for the flat budget,
    * a joined per-domain value for the learned one). Keeping the draw
    * recipe / tie-break / overshoot rule here means the two contracts
    * cannot drift apart. */
  private def greedyTokenPrefix(df: DataFrame, domainCol: String, keyCol: String,
                                tokensCol: String, budgetCol: Column,
                                salt: String): DataFrame = {
    val draw = md5(concat(col(keyCol).cast("string"), lit("|" + salt))
      .cast("binary"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__draw"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(domainCol).isNotNull)
      .withColumn("__draw", draw)
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .filter(col("__cum") - col(tokensCol) < budgetCol)
      .drop("__draw", "__cum")
  }

  def tokenBudgetMix(df: DataFrame, domainCol: String, keyCol: String,
                     tokensCol: String, budgetTokens: Long,
                     salt: String = ""): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    greedyTokenPrefix(df, domainCol, keyCol, tokensCol, lit(budgetTokens), salt)
  }

  /** Deterministic train/val/test split by key hash — the holdout
    * assignment every training pipeline needs, derandomized the same
    * way as [[stratifiedSampleDet]]: h52 = top-52 md5 bits of
    * (key "|" salt), split s_i ⟺ h52 ∈ [b_{i−1}, b_i) with EXACT
    * integer thresholds b_i = ⌊2^52 · cumPercent_i / 100⌋ — no float
    * boundary anywhere, so the partition is bit-reproducible on any
    * engine, any partitioning, any day (an RNG split is none of
    * those), and a document NEVER migrates between splits as the
    * corpus grows (membership depends only on its own key — the
    * property that keeps eval sets stable across corpus versions).
    * Zero shuffle: one narrow projection. `splits` are (name,
    * percent) with percents summing to 100. */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
                salt: String = "", splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"split percents must be positive: $splits")
    require(splits.map(_._2).sum == 100,
      s"split percents must sum to 100, got ${splits.map(_._2).sum}")
    val h52 = conv(substring(md5(concat(col(keyCol).cast("string"),
      lit("|" + salt)).cast("binary")), 1, 13), 16, 10).cast("long")
    val bounds = hashSplitBounds(splits)
    val caseExpr = splits.zip(bounds).init.foldRight(lit(splits.last._1)) {
      case (((name, _), b), rest) => when(col("__h52") < b, lit(name)).otherwise(rest)
    }
    // a NULL key hashes to NULL: every `<` test is unknown, so the
    // bare CASE chain would silently funnel null-keyed rows into the
    // LAST split — contaminating the holdout invisibly. Propagate the
    // NULL instead (split = NULL), so bad keys are loud downstream.
    df.withColumn("__h52", h52)
      .withColumn(splitCol,
        when(col("__h52").isNull, lit(null)).otherwise(caseExpr))
      .drop("__h52")
  }

  /** The integer split thresholds [[hashSplit]] uses — exposed so an
    * external verifier (the SQL oracle) interpolates the IDENTICAL
    * longs instead of re-deriving float boundaries. */
  def hashSplitBounds(splits: Seq[(String, Int)]): Seq[Long] =
    splits.scanLeft(0)(_ + _._2).tail.map(c => ((BigInt(1) << 52) * c / 100).toLong)

  /** LEARNED-mixture corpus assembly — [[tokenBudgetMix]] with a
    * per-domain budget from a weights table instead of one flat
    * budget: budget_d = floor(weight_d · totalBudgetTokens), then the
    * same deterministic greedy prefix per domain. Feed it
    * [[graft.operators.CorpusModels.domainMixWeights]]'s mix_weight
    * column and this IS the DoReMi materialization step: learn the
    * mixture, then cut a corpus to it ("~1B tokens distributed by the
    * learned mixture"). The floor is over an engine-identical double
    * (mix_weight is exact-rational arithmetic on verified integers ×
    * an exactly-representable budget), so the budget — and therefore
    * the row set — is oracle-replayable. A domain with weight 0 (or
    * weight·B < 1 token) keeps NOTHING — a learned zero is a real
    * signal, unlike [[temperatureMix]]'s keep-every-domain floor;
    * guard upstream if scarce domains must survive. Same plan shape
    * as [[tokenBudgetMix]] (one per-domain window cumsum; the weights
    * table is domain-cardinality and rides a broadcast), same NULL
    * and duplicate-key contracts. `weights` must carry `domainCol`
    * and `weightCol`.
    *
    * Batch/serve split: this op is CORPUS-BATCH BY NATURE — selection
    * needs every candidate's token count and a global cumsum, so
    * there is deliberately no driver-latency probe for it. The
    * serve-side story is the weights table itself: it rides the
    * persisted model ([[graft.operators.CorpusModels
    * .publishModelVersion]]) and a server reads the per-domain
    * weights from there; cutting a corpus to the mixture stays a
    * nightly batch job. Same contract as `dsirGumbelResample` — the
    * model-family batch/serve matrix is: score-one-doc ops have
    * probes (Serving.scoreNb/scorePpl/…), whole-corpus selection ops
    * do not. */
  def weightedTokenBudgetMix(df: DataFrame, domainCol: String, keyCol: String,
                             tokensCol: String, weights: DataFrame,
                             totalBudgetTokens: Long, salt: String = "",
                             weightCol: String = "mix_weight"): DataFrame = {
    require(totalBudgetTokens > 0,
      s"totalBudgetTokens must be positive, got $totalBudgetTokens")
    val budgeted = df
      .join(broadcast(weights.select(col(domainCol),
        floor(col(weightCol) * lit(totalBudgetTokens.toDouble))
          .cast("long").as("__budget"))), Seq(domainCol))
    greedyTokenPrefix(budgeted, domainCol, keyCol, tokensCol,
      col("__budget"), salt).drop("__budget")
  }
}
