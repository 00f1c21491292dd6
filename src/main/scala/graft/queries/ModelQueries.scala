package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Clustering, CorpusModels, TextAnalysis}

/** Model-based curation queries (north-star scope): unigram-LM
  * perplexity (CCNet), Naive-Bayes quality classification (the
  * fastText-classifier role), DSIR importance weights, SemDeDup, and
  * the Gopher rule battery.
  *
  * Oracle pattern for the model family: the trained model table
  * (counts + fixed-point log-probs) is the parquet handoff; DuckDB
  * re-derives EVERY count in it from the raw corpus and joins on
  * (key, counts) — a row whose counts Spark got wrong drops out of
  * the join and the downstream integer-sum scores diverge. Model
  * SIZE guards close the silent-omission hole: every chain multiplies
  * its scores by a guard scalar (`(SELECT 1 FROM …vs)` /
  * dsirChainCte's `ok`) that goes NULL unless the handoff's row count
  * and recomputed totals match — so a model MISSING a row fails every
  * output row, while a row with corrupted counts drops out of the
  * value join and fails exactly the docs that score through it (the
  * fixture guarantees every model key is exercised, so neither
  * corruption survives). Only the ln() value mapping is taken from the
  * handoff (cross-libm ln is not bitwise-portable — the Bm25 rule);
  * its monotonicity in the verified counts is spec-gated.
  *
  * The NB labels and the DSIR target distribution come from the
  * rule-based quality gate (`t_quality_gate`) — the classic
  * weak-supervision bootstrap, and the gate is itself
  * SQL-expressible, so the oracle recomputes the labels too: the
  * ENTIRE train+score pipeline is replayed except ln().
  */
object ModelQueries {

  private val LmVocabHandoff   = Handoff.path("lm_vocab")
  private val LmStatsHandoff   = Handoff.path("lm_stats")
  private val LmBigramsHandoff = Handoff.path("lm_bigrams")
  private val LmCtxHandoff     = Handoff.path("lm_contexts")
  private val NbModelHandoff   = Handoff.path("nb_model")
  private val NbPriorHandoff   = Handoff.path("nb_prior")
  private val DsirModelHandoff = Handoff.path("dsir_model")
  private val DsirSelHandoff   = Handoff.path("dsir_select_model")
  private val PplSelVocabHandoff = Handoff.path("ppl_select_vocab")
  private val PplSelStatsHandoff = Handoff.path("ppl_select_stats")
  private val PplBktVocabHandoff = Handoff.path("ppl_buckets_vocab")
  private val PplBktStatsHandoff = Handoff.path("ppl_buckets_stats")
  private val NbRepModelHandoff  = Handoff.path("nb_report_model")
  private val NbRepPriorHandoff  = Handoff.path("nb_report_prior")
  private val BkoBiHandoff       = Handoff.path("backoff_bigrams")
  private val BkoCtxHandoff      = Handoff.path("backoff_contexts")
  private val BkoVocabHandoff    = Handoff.path("backoff_vocab")
  private val BkoStatsHandoff    = Handoff.path("backoff_stats")
  private val McpNbModelHandoff = Handoff.path("mcp_nb_model")
  private val McpNbPriorHandoff = Handoff.path("mcp_nb_prior")
  private val McpLmVocabHandoff = Handoff.path("mcp_lm_vocab")
  private val McpLmStatsHandoff = Handoff.path("mcp_lm_stats")
  private val SemCentHandoff   = Handoff.path("semdedup_centroids")
  private val SemAsgHandoff    = Handoff.path("semdedup_assigned")
  private val DmixGVocabHandoff = Handoff.path("dmix_global_vocab")
  private val DmixGStatsHandoff = Handoff.path("dmix_global_stats")
  private val DmixDVocabHandoff = Handoff.path("dmix_domain_vocab")
  private val DmixDStatsHandoff = Handoff.path("dmix_domain_stats")
  private val LangVocabHandoff  = Handoff.path("ppl_lang_vocab")
  private val LangStatsHandoff  = Handoff.path("ppl_lang_stats")
  private val McnVocabHandoff   = Handoff.path("mcnb_vocab")
  private val McnStatsHandoff   = Handoff.path("mcnb_stats")
  private val McnPriorsHandoff  = Handoff.path("mcnb_priors")
  private val KlModelHandoff    = Handoff.path("kl_drift_model")
  private val DmsGVocabHandoff  = Handoff.path("dms_global_vocab")
  private val DmsGStatsHandoff  = Handoff.path("dms_global_stats")
  private val DmsDVocabHandoff  = Handoff.path("dms_domain_vocab")
  private val DmsDStatsHandoff  = Handoff.path("dms_domain_stats")

  private val EntLnHandoff      = Handoff.path("char_entropy_ln")

  /** Total token budget for `domain_mix_select` — baked into both the
    * Spark query and the oracle SQL. At sf0.01 (~125k corpus tokens)
    * 20k is genuinely selective; the knob scales with the corpus in a
    * real deployment ("cut ~1B tokens to the learned mixture"). */
  private val DmixBudget = 20000L
  private val DsirRsModelHandoff = Handoff.path("dsir_resample_model")
  private val DsirRsKeysHandoff  = Handoff.path("dsir_resample_keys")

  /** Fixed resampling seed for `dsir_resample` — baked into both the
    * Spark query and the oracle SQL (determinism is the point of the
    * hash-seeded Gumbel). */
  private val ResampleSeed = 7L

  /** Fixture-aware vocab cap: the word-soup corpus has ~31 distinct
    * tokens, so 24 genuinely exercises the OOV path the cap exists
    * for (at 100 TB the same knob would sit at ~1M). */
  private val LmCap = 24

  /** NB model cap — same fixture logic as [[LmCap]]: 24 < ~31
    * distinct tokens, so capped-out tokens genuinely vote neutral-0
    * and the oracle's cap-selection replay is exercised. */
  private val NbCap = 24

  /** Per-GROUP vocab cap for the grouped LM family — the [[LmCap]]
    * fixture logic applied per group: every language/source subset
    * still sees most of the ~31-token word-soup vocabulary, so 24
    * exercises the per-group OOV path and the per-group cap-selection
    * replay (at 100 TB the knob sits at ~1M per group). */
  private val GrpLmCap = 24

  /** Bigram-table cap: the fixture has ~916 distinct transitions, so
    * 512 exercises the per-context OOV fallback. */
  private val BigramCap = 512

  /** Context-table cap: the fixture has ~31 distinct contexts, so 24
    * exercises the capped-out-context drop path. */
  private val BigramCtxCap = 24

  private val DsirBuckets = 1024

  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** SemDeDup's index: cluster count scales with the corpus —
    * max(16, n/1000) — so average cluster occupancy stays ~1000 and
    * the within-cluster candidate count stays LINEAR in n (fixed k
    * makes clusters grow with the corpus and candidates quadratic:
    * measured 105 s at the 100× fixture before this, Σ|c|² ≈ 1.25B
    * pairs). At fixture SFs (n ≤ 2000) this resolves to k=16 — the
    * identical shared index the ANN/census paths use. Also the bench
    * warmup hook: the build must not sit in the timed window — and
    * neither must the corpus count that sizes k: it is memoized per
    * fixture fingerprint (the persistedIvfPath key recipe), so a
    * warmed bench re-resolves k without touching the table. */
  def semdedupIndex(s: SparkSession, dir: String): graft.operators.Ann.IvfIndex = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val key = s"$dir|${src.lastModified}|${src.length}"
    // per-key memo via putIfAbsent of a future: the count() Spark job
    // runs OUTSIDE any map lock (computeIfAbsent would hold the CHM
    // bin lock for the job's multi-second duration, serializing
    // unrelated keys that share the bin — the JDK explicitly warns
    // mappings must be short); only racers on the SAME key wait, on
    // the future, and a failed compute removes its future so the next
    // call retries instead of caching the exception.
    val fresh = new java.util.concurrent.CompletableFuture[Integer]()
    val prior = semKCache.putIfAbsent(key, fresh)
    val k: Int =
      if (prior != null) prior.join().intValue()
      else
        try {
          val v = math.max(16, (Tables.embeddings(s, dir).count() / 1000L).toInt)
          fresh.complete(v)
          v
        } catch {
          case e: Throwable =>
            fresh.completeExceptionally(e)
            semKCache.remove(key, fresh)
            throw e
        }
    AnnQueries.persistedIvf(s, dir, k)
  }
  private val semKCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[Integer]]()

  /** Build-once cache of the trained DSIR artifact for a fixture dir —
    * the [[AnnQueries.persistedIvf]] recipe applied to the model
    * family: ONE training pass (gate labels → bigram occurrences →
    * hashed-bucket LLR model → per-doc weight sums) persisted under
    * the JVM tmpdir, keyed on the corpus fingerprint (path + mtime +
    * length + bucket count) so a regenerated fixture rebuilds instead
    * of silently serving stale weights. `dsir_weights` /
    * `dsir_select` / `dsir_resample` all score/rank against this one
    * artifact — in a real deployment the weights are trained once
    * nightly and every selection policy reads them; retraining per
    * query was round 9's top perf finding (3× the same ~5 s pipeline
    * in one suite). The model parquet is written THROUGH the training
    * pass's publish hook, so the cached weights derive from the exact
    * persisted model file; each query re-publishes the cached model
    * to its own oracle handoff path (a ≤1024-row write), and the
    * oracle's full count replay is unchanged. Key/lock discipline is
    * [[BuildOnce.cached]]'s. Returns (model, weights) frames read
    * from the cache. */
  def dsirShared(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val path = BuildOnce.cached(s"dsir-b$DsirBuckets",
        new java.io.File(s"$dir/documents.parquet"))(
        p => s"$p/weights/_SUCCESS") { p =>
      val docs = Tables.documents(s, dir)
      val labeled = docs.join(gateLabels(s, dir), Seq("doc_id"))
      val (_, w) = CorpusModels.dsirTrainScore(labeled, "doc_id", "text",
        "keep", DsirBuckets, publish = m => {
          m.coalesce(1).write.mode("overwrite").parquet(s"$p/model")
          s.read.parquet(s"$p/model")
        })
      w.write.mode("overwrite").parquet(s"$p/weights")
    }
    (s.read.parquet(s"$path/model"), s.read.parquet(s"$path/weights"))
  }

  /** The rule-based quality-gate labels (the t_quality_gate verdict,
    * reduced to (doc_id, keep)) — training labels for the NB
    * classifier and the DSIR target distribution. Delegates to
    * [[TextQueries.qualityGateFrame]], the ONE owner of the gate
    * formulas, so labels can never fork from the gate. */
  private def gateLabels(s: SparkSession, dir: String): DataFrame =
    TextQueries.qualityGateFrame(s, dir).select(col("doc_id"), col("keep"))

  /** Train-publish-score NB over `dir`'s corpus — the ONE Spark-side
    * owner of the stage, shared by `cls_nb_gate` and the composite
    * (which differ only in handoff paths and final projection). */
  private def nbScored(s: SparkSession, dir: String,
                       modelPath: String, priorPath: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val labeled = docs.join(gateLabels(s, dir), Seq("doc_id"))
    val (model0, prior0) = CorpusModels.nbTrain(labeled, "text", "keep", NbCap)
    CorpusModels.nbScore(docs, "doc_id", "text",
      Handoff.publish(model0, modelPath), Handoff.publish(prior0, priorPath))
  }

  /** Train-publish-score the unigram LM — the stage's one Spark-side
    * owner, shared by `lm_perplexity` and the composite. */
  private def lmScored(s: SparkSession, dir: String,
                       vocabPath: String, statsPath: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (vocab0, stats0) = CorpusModels.unigramLm(docs, "text", LmCap)
    CorpusModels.perplexity(docs, "doc_id", "text",
      Handoff.publish(vocab0, vocabPath), Handoff.publish(stats0, statsPath))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CCNet-style LM quality signal: train the smoothed unigram LM on
    // the corpus, score every doc's cross-entropy under it. The
    // capped vocab + stats row are the handoffs; scoring is replayed
    // from them over independently recomputed token streams.
    "lm_perplexity" -> { (s, dir) =>
      lmScored(s, dir, LmVocabHandoff, LmStatsHandoff).orderBy(col("doc_id"))
    },
    // the context-aware LM signal (CCNet's actual model family):
    // bigram transitions with per-context Laplace smoothing; capped
    // transition table + full context table are the handoffs.
    "lm_bigram_ppl" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (bi0, ctx0) = CorpusModels.bigramLm(docs, "text", BigramCap, BigramCtxCap)
      val bi = Handoff.publish(bi0, LmBigramsHandoff)
      val ctx = Handoff.publish(ctx0, LmCtxHandoff)
      CorpusModels.bigramPerplexity(docs, "doc_id", "text", bi, ctx)
        .orderBy(col("doc_id"))
    },
    // stupid-backoff perplexity (Brants 2007): bigram table hit, else
    // constant-penalty backoff to the unigram — the web-scale
    // smoothing; nothing drops (unknown contexts back off). Both
    // capped models published on dedicated paths.
    "lm_backoff_ppl" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (bi0, ctx0) = CorpusModels.bigramLm(docs, "text", BigramCap, BigramCtxCap)
      val (vocab0, stats0) = CorpusModels.unigramLm(docs, "text", LmCap)
      val bi = Handoff.publish(bi0, BkoBiHandoff)
      // context table is a verification-only handoff here (backoff
      // scoring never reads it; the oracle re-derives c_u/v from it)
      Handoff.publish(ctx0, BkoCtxHandoff)
      val vocab = Handoff.publish(vocab0, BkoVocabHandoff)
      val stats = Handoff.publish(stats0, BkoStatsHandoff)
      CorpusModels.backoffPerplexity(docs, "doc_id", "text", bi, vocab, stats)
        .orderBy(col("doc_id"))
    },
    // classifier-based quality filter: NB trained on the rule-gate
    // labels, scoring the full corpus. keep_pred is the Bayes
    // decision; divergence from the rule labels is exactly the
    // classifier's generalization (spec-gated for accuracy).
    "cls_nb_gate" -> { (s, dir) =>
      nbScored(s, dir, NbModelHandoff, NbPriorHandoff).orderBy(col("doc_id"))
    },
    // the calibration report a nightly retrain publishes: confusion
    // counts of the classifier's Bayes decision against its own
    // training labels (in-sample fit — divergence IS the
    // generalization/cap loss), plus the exact accuracy ratio. One
    // row of exact longs + one engine-stable division.
    "cls_nb_report" -> { (s, dir) =>
      val pred = nbScored(s, dir, NbRepModelHandoff, NbRepPriorHandoff)
        .select(col("doc_id"), col("keep_pred"))
      pred.join(gateLabels(s, dir), Seq("doc_id"))
        .agg(
          sum(when(col("keep_pred") && col("keep"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("keep_pred") && !col("keep"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("keep_pred") && !col("keep"), 1L).otherwise(0L)).as("tn"),
          sum(when(!col("keep_pred") && col("keep"), 1L).otherwise(0L)).as("fn"),
          count(lit(1)).as("n_docs"))
        .withColumn("accuracy",
          (col("tp") + col("tn")).cast("double") / col("n_docs").cast("double"))
    },
    // DSIR: hashed-bigram importance weights of the raw corpus toward
    // the gate-kept target distribution. The bucket model is the
    // handoff; buckets are md5-mod-B, recomputable in SQL. Trained
    // once per fixture via [[dsirShared]] (the trio shares the pass);
    // the oracle re-derives every count regardless of where the
    // published model came from.
    "dsir_weights" -> { (s, dir) =>
      val (model, w) = dsirShared(s, dir)
      Handoff.publish(model, DsirModelHandoff)
      w.orderBy(col("doc_id"))
    },
    // the DSIR SELECTION step: importance weights → exact global rank
    // (range exchange, no single-partition window) → keep the top 60%
    // by (weight desc, id) — deterministic integer boundary, the
    // resampling a pipeline actually materializes.
    "dsir_select" -> { (s, dir) =>
      val (model, w) = dsirShared(s, dir)
      Handoff.publish(model, DsirSelHandoff)
      graft.operators.Ranking.topFraction(
          w.select(col("doc_id"), col("weight_fp")),
          Seq(col("weight_fp").desc, col("doc_id")), percent = 60)
        .orderBy(col("doc_id"))
    },
    // the paper's ACTUAL resampling: Gumbel-top-k over the importance
    // weights — sample-without-replacement ∝ exp(weight), made
    // deterministic (and oracle-replayable) by hash-seeding the
    // Gumbel from md5(doc_id, seed). The per-doc key table is a
    // second handoff: DuckDB re-derives the weights AND the hash
    // integer h52; only the −ln(−ln(u)) value mapping rides the
    // handoff (the family's ln rule, monotonicity spec-gated).
    "dsir_resample" -> { (s, dir) =>
      val (model, w) = dsirShared(s, dir)
      Handoff.publish(model, DsirRsModelHandoff)
      CorpusModels.dsirGumbelResample(w, "doc_id", "weight_fp",
          seed = ResampleSeed, percent = 60,
          publish = Handoff.publish(_, DsirRsKeysHandoff))
        .orderBy(col("doc_id"))
    },
    // the CCNet SELECTION step: unigram-LM cross-entropy → exact
    // global rank (range exchange, no single-partition window) → keep
    // the lowest-cross-entropy 60% by (cross_entropy asc, doc_id) —
    // the perplexity twin of dsir_select, making the LM family
    // end-to-end (train → score → select). Ranking on the
    // cross_entropy double is engine-safe: it is two IEEE divisions
    // of exactly-representable integers, bit-identical in any engine
    // (the perplexity contract), with doc_id as the total-order tie
    // break.
    "ppl_select" -> { (s, dir) =>
      val w = lmScored(s, dir, PplSelVocabHandoff, PplSelStatsHandoff)
      graft.operators.Ranking.topFraction(
          w.select(col("doc_id"), col("cross_entropy")),
          Seq(col("cross_entropy").asc, col("doc_id")), percent = 60)
        .orderBy(col("doc_id"))
    },
    // CCNet's actual corpus partition: head/middle/tail TERCILES of
    // LM cross-entropy (the paper trains on head+middle and drops the
    // tail) — ANSI ntile(3) via the range-exchange bucket math, no
    // global window, same engine-safe double ordering as ppl_select.
    "ppl_buckets" -> { (s, dir) =>
      val w = lmScored(s, dir, PplBktVocabHandoff, PplBktStatsHandoff)
      graft.operators.Ranking.ntileBuckets(
          w.select(col("doc_id"), col("cross_entropy")),
          Seq(col("cross_entropy").asc, col("doc_id")), n = 3,
          bucketCol = "ppl_bucket")
        .orderBy(col("doc_id"))
    },
    // DoReMi-flavored domain mixture weights (Xie et al. 2023):
    // per-source excess cross-entropy of the GLOBAL unigram LM over
    // each source's OWN LM, normalized to exact-rational mixture
    // weights. All four model tables (global vocab+stats, grouped
    // vocab+stats) are handoffs; DuckDB re-derives every count, BOTH
    // cap selections (global and per-group), and replays scoring and
    // the per-domain aggregation as integer sums.
    "domain_mix_weights" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (gv0, gs0) = CorpusModels.unigramLm(docs, "text", LmCap)
      val (dv0, ds0) = CorpusModels.groupedUnigramLm(docs, "source", "text", GrpLmCap)
      CorpusModels.domainMixWeights(docs, "doc_id", "source", "text",
          Handoff.publish(gv0, DmixGVocabHandoff),
          Handoff.publish(gs0, DmixGStatsHandoff),
          Handoff.publish(dv0, DmixDVocabHandoff),
          Handoff.publish(ds0, DmixDStatsHandoff))
        .orderBy(col("domain"))
    },
    // the DoReMi MATERIALIZATION step: learn the mixture
    // (domainMixWeights on its own handoff paths), then cut a corpus
    // to it — per-source token budget = floor(mix_weight · B), greedy
    // deterministic prefix per source in md5 draw order
    // (weightedTokenBudgetMix). End-to-end: model → weights → corpus.
    "domain_mix_select" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (gv0, gs0) = CorpusModels.unigramLm(docs, "text", LmCap)
      val (dv0, ds0) = CorpusModels.groupedUnigramLm(docs, "source", "text", GrpLmCap)
      val w = CorpusModels.domainMixWeights(docs, "doc_id", "source", "text",
          Handoff.publish(gv0, DmsGVocabHandoff),
          Handoff.publish(gs0, DmsGStatsHandoff),
          Handoff.publish(dv0, DmsDVocabHandoff),
          Handoff.publish(ds0, DmsDStatsHandoff))
        .select(col("domain").as("source"), col("mix_weight"))
      graft.operators.Refresh.weightedTokenBudgetMix(
          docs.select(col("doc_id"), col("source"),
            size(array_remove(split(col("text"), " "), ""))
              .cast("long").as("n_tok")),
          "source", "doc_id", "n_tok", w, totalBudgetTokens = DmixBudget)
        .orderBy(col("doc_id"))
    },
    // CCNet's ACTUAL partition is per language: one LM per language,
    // each doc scored by its own language's model, head/middle/tail
    // terciles WITHIN the language. The tercile math runs on the
    // grouped range-exchange rank (Ranking.ntilePerGroup) — a grouped
    // window would funnel each whole language through one task.
    "ppl_buckets_by_lang" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (v0, st0) = CorpusModels.groupedUnigramLm(docs, "lang", "text", GrpLmCap)
      val w = CorpusModels.groupedPerplexity(docs, "doc_id", "lang", "text",
        Handoff.publish(v0, LangVocabHandoff),
        Handoff.publish(st0, LangStatsHandoff))
      graft.operators.Ranking.ntilePerGroup(
          w.select(col("doc_id"), col("grp").as("lang"), col("cross_entropy")),
          Seq(col("lang")), Seq(col("cross_entropy").asc, col("doc_id")),
          n = 3, bucketCol = "ppl_bucket")
        .orderBy(col("doc_id"))
    },
    // multiclass NB language ID (the fastText-tagger role): per-class
    // unigram likelihoods (= one groupedUnigramLm per language) +
    // smoothed doc priors, argmax with the (score desc, class asc)
    // tie-break. All three model tables are handoffs; DuckDB
    // re-derives every count, the per-class cap selection, and the
    // priors, then replays all K class scores and the argmax as exact
    // integer arithmetic. `correct` compares against the fixture's
    // actual lang column; NOTE the fixture's languages share one
    // 31-token word pool, so content carries ~no language signal
    // there (near-chance fit, deterministic either way) — accuracy on
    // a separable corpus is spec-gated in CorpusModelsSpec.
    "cls_lang_nb" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (v0, st0) = CorpusModels.groupedUnigramLm(docs, "lang", "text", GrpLmCap)
      val pr0 = CorpusModels.multiclassNbPriors(docs, "lang")
      CorpusModels.multiclassNbPredict(docs, "doc_id", "text",
          Handoff.publish(v0, McnVocabHandoff),
          Handoff.publish(st0, McnStatsHandoff),
          Handoff.publish(pr0, McnPriorsHandoff))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"),
          col("pred_class").as("pred_lang"), col("score_fp"),
          col("lang"), (col("lang") === col("pred_class")).as("correct"))
        .orderBy(col("doc_id"))
    },
    // per-document character entropy (the Gopher/RefinedWeb junk
    // signal): near-zero = repeated-character padding, high = uniform
    // noise. The corpus's distinct count values + their ln()s are the
    // (tiny, corpus-size-independent) handoff; everything else is
    // re-derived counts and exact integer sums.
    "t_char_entropy" -> { (s, dir) =>
      CorpusModels.charEntropy(Tables.documents(s, dir), "doc_id", "text",
          publish = Handoff.publish(_, EntLnHandoff))
        .orderBy(col("doc_id"))
    },
    // per-source distribution drift: plug-in KL divergence of each
    // source's token distribution from the whole corpus's — the
    // quantified "which source drifted furthest" monitoring signal.
    // The (grp, token) ratio table is the handoff; DuckDB re-derives
    // every count and replays the KL sums as exact integers.
    "corpus_kl_drift" -> { (s, dir) =>
      CorpusModels.klDrift(Tables.documents(s, dir), "source", "text",
          publish = Handoff.publish(_, KlModelHandoff))
        .orderBy(col("grp"))
    },
    // SemDeDup over the SAME persisted IVF index the ANN path
    // searches at fixture scale (see [[semdedupIndex]] for the
    // corpus-proportional cluster count). Centroids + assignment are
    // the handoffs (the index artifact, scalatest-gated); pairs,
    // components, and the keep-farthest-from-centroid rule all
    // replay in SQL.
    "semdedup_keep" -> { (s, dir) =>
      val index = semdedupIndex(s, dir)
      AnnQueries.writeIvfHandoff(s, index, SemCentHandoff, SemAsgHandoff)
      Clustering.semDedup(index, threshold = 0.45)
        .orderBy(col("vec_id"))
    },
    // the Gopher rule battery (word-count bounds, mean-word-length
    // bounds, alphabetic-word fraction, stopword presence) — pure
    // integer/one-division arithmetic, no handoff needed.
    "t_gopher_rules" -> { (s, dir) =>
      gopherFrame(s, dir).orderBy(col("doc_id"))
    },
    // the composed modern-curation verdict: NB classifier (trained on
    // the rule-gate labels) AND the Gopher battery decide keep, with
    // the LM cross-entropy attached for downstream thresholding — the
    // one declarative plan a training pipeline actually submits. Own
    // handoff paths (the standalone queries must not clobber them
    // within one verify run); every stage's oracle replay is composed
    // into ONE SQL statement from the per-stage chains.
    "model_curation_pipeline" -> { (s, dir) =>
      val nb = nbScored(s, dir, McpNbModelHandoff, McpNbPriorHandoff)
        .select(col("doc_id"), col("score_fp"), col("keep_pred"))
      val ppl = lmScored(s, dir, McpLmVocabHandoff, McpLmStatsHandoff)
        .select(col("doc_id"), col("cross_entropy"))
      val gopher = gopherFrame(s, dir)
        .select(col("doc_id"), col("keep").as("gopher_keep"))
      nb.join(ppl, Seq("doc_id")).join(gopher, Seq("doc_id"))
        .select(col("doc_id"), col("score_fp"), col("keep_pred"),
          col("cross_entropy"), col("gopher_keep"),
          (col("keep_pred") && col("gopher_keep")).as("keep"))
        .orderBy(col("doc_id"))
    }
  )

  /** The Gopher battery as a frame — shared by `t_gopher_rules` and
    * the composite pipeline. */
  private def gopherFrame(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val toks = TextAnalysis.tokens(t)
    val n = size(toks).cast("long")
    val meanLen = when(n === 0, lit(0.0))
      .otherwise(TextAnalysis.charCount(t).cast("double") / n.cast("double"))
    val fracAlpha = when(n === 0, lit(0.0))
      .otherwise(size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
        n.cast("double"))
    val stopHits = TextAnalysis.stopwordHits(t, gopherStops).cast("long")
    Tables.documents(s, dir).select(
      col("doc_id"),
      n.as("n_tokens"),
      meanLen.as("mean_token_len"),
      fracAlpha.as("frac_alpha_words"),
      stopHits.as("n_stop_hits"),
      (n >= 50 && n <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        fracAlpha >= 0.8 && stopHits >= 2).as("keep"))
  }

  private def rp(path: String) = s"read_parquet('$path/*.parquet')"

  /** The quality-gate verdict CTE (ends in `lab(doc_id, keep)`) —
    * owned by [[TextQueries.gateCte]], the same single source the
    * t_quality_gate oracle selects from. */
  private def labelCte = TextQueries.gateCte

  /** Minimal tokenized-docs CTE for chains that need `lt` but not the
    * gate labels (the grouped-LM oracles) — same tokenization text as
    * [[labelCte]]'s lt, without the label chain riding along. */
  private val ltOnlyCte: String =
    """lt AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents
      |)""".stripMargin

  // One owner per replay chain (the gateCte rule, applied to this
  // file's own oracles): each helper emits the stage's full verify +
  // replay CTE list with `p`-prefixed names, so the standalone oracle
  // and the composite compose the SAME text and can never drift. All
  // chains require [[labelCte]]'s lt (and lab, for NB) upstream.

  /** NB replay: verifies handoff class counts, token/doc totals, the
    * cap SELECTION (top-[[NbCap]] by c_pos+c_neg desc, token asc —
    * re-derived, not trusted), and model size/sum omission guards,
    * then replays scoring (capped-out tokens vote 0, like the Spark
    * side's left join). A failed guard empties ${p}pv, whose prior
    * scalar rides every output row — so every row fails, not just
    * capped-out-token docs. Produces ${p}pv(prior_fp) and
    * ${p}g(doc_id, n, s). */
  private def nbChainCte(modelRp: String, priorRp: String, p: String): String =
    s"""${p}m AS (SELECT * FROM $modelRp),
       |${p}p AS (SELECT * FROM $priorRp),
       |${p}tk AS (
       |  SELECT lt.doc_id, lab.keep, unnest(lt.w) AS token
       |  FROM lt JOIN lab ON lt.doc_id = lab.doc_id
       |), ${p}c AS (
       |  SELECT token,
       |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
       |         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
       |  FROM ${p}tk GROUP BY token
       |), ${p}tot AS (
       |  SELECT CAST(sum(c_pos) AS BIGINT) AS np_, CAST(sum(c_neg) AS BIGINT) AS nn_,
       |         CAST(count(*) AS BIGINT) AS v
       |  FROM ${p}c
       |), ${p}cap AS (
       |  SELECT token, c_pos, c_neg FROM ${p}c
       |  ORDER BY (c_pos + c_neg) DESC, token LIMIT $NbCap
       |), ${p}dtot AS (
       |  SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS npd,
       |         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS nnd
       |  FROM lab
       |), ${p}pv AS (
       |  SELECT ${p}p.prior_fp FROM ${p}p
       |  JOIN ${p}tot ON ${p}p.n_pos_tok = ${p}tot.np_
       |              AND ${p}p.n_neg_tok = ${p}tot.nn_
       |              AND ${p}p.vocab_size = ${p}tot.v
       |  JOIN ${p}dtot ON ${p}p.n_pos_docs = ${p}dtot.npd
       |               AND ${p}p.n_neg_docs = ${p}dtot.nnd
       |  WHERE (SELECT count(*) FROM ${p}m) =
       |        least($NbCap, (SELECT v FROM ${p}tot))
       |    AND (SELECT CAST(sum(c_pos) + sum(c_neg) AS BIGINT) FROM ${p}m) =
       |        (SELECT CAST(sum(c_pos) + sum(c_neg) AS BIGINT) FROM ${p}cap)
       |), ${p}mv AS (
       |  SELECT ${p}m.token, ${p}m.llr_fp
       |  FROM ${p}m JOIN ${p}cap ON ${p}m.token = ${p}cap.token
       |                         AND ${p}m.c_pos = ${p}cap.c_pos
       |                         AND ${p}m.c_neg = ${p}cap.c_neg
       |), ${p}sc AS (
       |  SELECT ${p}tk.doc_id, coalesce(${p}mv.llr_fp, 0) AS lp
       |  FROM ${p}tk LEFT JOIN ${p}mv USING (token)
       |), ${p}g AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(lp) AS BIGINT) AS s
       |  FROM ${p}sc GROUP BY doc_id
       |)""".stripMargin

  /** Unigram-LM replay: verifies handoff counts, totals, and the cap
    * SELECTION with omission guards, replays scoring with the OOV
    * fallback. ${p}vs doubles as the guard scalar: every token's lp is
    * multiplied by `(SELECT 1 FROM ${p}vs)`, so a failed guard nulls
    * EVERY tokenized doc's score — not just docs containing OOV tokens
    * (which are the only ones that read the oov_logp_fp scalar).
    * Produces ${p}g(doc_id, n, nll). */
  private def lmChainCte(vocabRp: String, statsRp: String, p: String): String =
    s"""${p}h AS (SELECT * FROM $vocabRp),
       |${p}hs AS (SELECT * FROM $statsRp),
       |${p}t AS (SELECT doc_id, unnest(w) AS token FROM lt),
       |${p}c AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ${p}t GROUP BY token
       |), ${p}tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |         CAST(count(*) AS BIGINT) AS vocab_total
       |  FROM ${p}c
       |), ${p}vs AS (
       |  SELECT ${p}hs.oov_logp_fp FROM ${p}hs JOIN ${p}tot
       |    ON ${p}hs.n_tokens = ${p}tot.n_tokens
       |   AND ${p}hs.vocab_total = ${p}tot.vocab_total
       |  WHERE (SELECT count(*) FROM ${p}h) =
       |        least($LmCap, (SELECT vocab_total FROM ${p}tot))
       |), ${p}cap AS (
       |  SELECT token, cnt FROM ${p}c ORDER BY cnt DESC, token LIMIT $LmCap
       |), ${p}hv AS (
       |  SELECT ${p}h.token, ${p}h.logp_fp
       |  FROM ${p}h JOIN ${p}cap ON ${p}h.token = ${p}cap.token
       |                         AND ${p}h.cnt = ${p}cap.cnt
       |), ${p}sc AS (
       |  SELECT ${p}t.doc_id,
       |         coalesce(${p}hv.logp_fp, (SELECT oov_logp_fp FROM ${p}vs))
       |           * (SELECT 1 FROM ${p}vs) AS lp
       |  FROM ${p}t LEFT JOIN ${p}hv USING (token)
       |), ${p}g AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(-sum(lp) AS BIGINT) AS nll
       |  FROM ${p}sc GROUP BY doc_id
       |)""".stripMargin

  /** The verified grouped-LM MODEL views — the shared stem of
    * [[groupedLmChainCte]] (own-group scoring) and
    * [[mcNbChainCte]] (all-class scoring): re-derives the
    * (group, token) counts, per-group totals, and the PER-GROUP cap
    * selection (row_number partitioned by group), accepts handoff
    * rows only on full (grp, token, cnt) / (grp, totals) match, and
    * guards row counts + count sums so a silently-missing model row
    * fails everything. Requires `lt` upstream; `groupCol` names the
    * documents column. Produces ${p}t(doc_id, grp, token),
    * ${p}hv(grp, token, logp_fp), ${p}sv(grp, oov_logp_fp), and the
    * guard scalar ${p}ok. */
  private def groupedLmModelCte(vocabRp: String, statsRp: String,
                                groupCol: String, p: String): String =
    s"""${p}h AS (SELECT * FROM $vocabRp),
       |${p}hs AS (SELECT * FROM $statsRp),
       |${p}t AS (
       |  SELECT lt.doc_id, d.$groupCol AS grp, unnest(lt.w) AS token
       |  FROM lt JOIN documents d ON lt.doc_id = d.doc_id
       |), ${p}c AS (
       |  SELECT grp, token, CAST(count(*) AS BIGINT) AS cnt
       |  FROM ${p}t GROUP BY grp, token
       |), ${p}tot AS (
       |  SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |         CAST(count(*) AS BIGINT) AS vocab_total
       |  FROM ${p}c GROUP BY grp
       |), ${p}cap AS (
       |  SELECT grp, token, cnt FROM (
       |    SELECT grp, token, cnt,
       |           row_number() OVER (PARTITION BY grp
       |                              ORDER BY cnt DESC, token) AS rn
       |    FROM ${p}c) AS s WHERE rn <= $GrpLmCap
       |), ${p}hv AS (
       |  SELECT ${p}h.grp, ${p}h.token, ${p}h.logp_fp
       |  FROM ${p}h JOIN ${p}cap ON ${p}h.grp = ${p}cap.grp
       |                         AND ${p}h.token = ${p}cap.token
       |                         AND ${p}h.cnt = ${p}cap.cnt
       |), ${p}sv AS (
       |  SELECT ${p}hs.grp, ${p}hs.oov_logp_fp
       |  FROM ${p}hs JOIN ${p}tot ON ${p}hs.grp = ${p}tot.grp
       |                          AND ${p}hs.n_tokens = ${p}tot.n_tokens
       |                          AND ${p}hs.vocab_total = ${p}tot.vocab_total
       |), ${p}ok AS (
       |  SELECT 1 AS ok WHERE
       |        (SELECT count(*) FROM ${p}h)  = (SELECT count(*) FROM ${p}cap)
       |    AND (SELECT count(*) FROM ${p}hv) = (SELECT count(*) FROM ${p}cap)
       |    AND (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM ${p}h) =
       |        (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM ${p}cap)
       |    AND (SELECT count(*) FROM ${p}hs) = (SELECT count(*) FROM ${p}tot)
       |    AND (SELECT count(*) FROM ${p}sv) = (SELECT count(*) FROM ${p}tot)
       |)""".stripMargin

  /** Grouped unigram-LM replay — [[groupedLmModelCte]] + own-group
    * scoring (each doc under ITS OWN group's model, the CCNet
    * per-language shape). The guard scalar ${p}ok rides every lp.
    * Produces ${p}g(doc_id, grp, n, nll). */
  private def groupedLmChainCte(vocabRp: String, statsRp: String,
                                groupCol: String, p: String): String =
    s"""${groupedLmModelCte(vocabRp, statsRp, groupCol, p)},
       |${p}sc AS (
       |  SELECT ${p}t.doc_id, ${p}t.grp,
       |         coalesce(${p}hv.logp_fp, ${p}sv.oov_logp_fp)
       |           * (SELECT ok FROM ${p}ok) AS lp
       |  FROM ${p}t
       |  LEFT JOIN ${p}hv ON ${p}t.grp = ${p}hv.grp AND ${p}t.token = ${p}hv.token
       |  JOIN ${p}sv ON ${p}t.grp = ${p}sv.grp
       |), ${p}g AS (
       |  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS n,
       |         CAST(-sum(lp) AS BIGINT) AS nll
       |  FROM ${p}sc GROUP BY doc_id, grp
       |)""".stripMargin

  /** Multiclass-NB replay — [[groupedLmModelCte]] (the per-class
    * likelihoods ARE grouped unigram LMs) + a priors-handoff verify +
    * ALL-CLASS scoring and the deterministic argmax:
    * score(c) = prior(c) + matched_sum(c) + (n − matched_cnt(c))·oov(c)
    * replayed as exact integer sums from the verified model views (the
    * token stream is never multiplied by K — matched sums come from a
    * token-only join against the capped vocab, OOV mass is
    * reconstructed arithmetically, mirroring the Spark plan). Priors
    * accepted only on (grp, n_docs) match with row-count guards; both
    * guard scalars ride every score, so a wrong model or prior table
    * nulls every score → the argmax join drops every row → loud rows
    * mismatch. Produces ${p}pred(doc_id, score_fp, pred) and
    * ${p}dn(doc_id, n). */
  private def mcNbChainCte(vocabRp: String, statsRp: String, priorsRp: String,
                           groupCol: String, p: String): String =
    s"""${groupedLmModelCte(vocabRp, statsRp, groupCol, p)},
       |${p}pr AS (SELECT * FROM $priorsRp),
       |${p}pd AS (
       |  SELECT $groupCol AS grp, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1
       |), ${p}pv AS (
       |  SELECT ${p}pr.grp, ${p}pr.prior_fp
       |  FROM ${p}pr JOIN ${p}pd ON ${p}pr.grp = ${p}pd.grp
       |                         AND ${p}pr.n_docs = ${p}pd.n_docs
       |), ${p}pok AS (
       |  SELECT 1 AS ok
       |  WHERE (SELECT count(*) FROM ${p}pr) = (SELECT count(*) FROM ${p}pd)
       |    AND (SELECT count(*) FROM ${p}pv) = (SELECT count(*) FROM ${p}pd)
       |), ${p}dt AS (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tc
       |  FROM (SELECT doc_id, unnest(w) AS token FROM lt) GROUP BY 1, 2
       |), ${p}dn AS (
       |  SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n FROM ${p}dt GROUP BY 1
       |), ${p}cl AS (
       |  SELECT sv.grp, sv.oov_logp_fp, pv.prior_fp
       |  FROM ${p}sv sv JOIN ${p}pv pv ON sv.grp = pv.grp
       |), ${p}mm AS (
       |  SELECT dt.doc_id, hv.grp,
       |         CAST(sum(dt.tc * hv.logp_fp) AS BIGINT) AS msum,
       |         CAST(sum(dt.tc) AS BIGINT) AS mcnt
       |  FROM ${p}dt dt JOIN ${p}hv hv ON dt.token = hv.token
       |  GROUP BY 1, 2
       |), ${p}sc AS (
       |  SELECT d.doc_id, c.grp,
       |         (c.prior_fp + coalesce(m.msum, 0)
       |          + (coalesce(n.n, 0) - coalesce(m.mcnt, 0)) * c.oov_logp_fp)
       |           * (SELECT ok FROM ${p}ok) * (SELECT ok FROM ${p}pok) AS score_fp
       |  FROM documents d CROSS JOIN ${p}cl c
       |  LEFT JOIN ${p}dn n ON d.doc_id = n.doc_id
       |  LEFT JOIN ${p}mm m ON d.doc_id = m.doc_id AND c.grp = m.grp
       |), ${p}best AS (
       |  SELECT doc_id, max(score_fp) AS score_fp FROM ${p}sc GROUP BY 1
       |), ${p}pred AS (
       |  SELECT sc.doc_id, sc.score_fp, min(sc.grp) AS pred
       |  FROM ${p}sc sc JOIN ${p}best b ON sc.doc_id = b.doc_id
       |                              AND sc.score_fp = b.score_fp
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** DoReMi mixture-weight replay — the ONE owner of the per-domain
    * aggregation + excess clamp + exact-rational mixture division
    * (`domain_mix_weights` and `domain_mix_select` compose it). Sits
    * on top of lmChainCte(p="u") and groupedLmChainCte(p="m"): reads
    * their ug/mg outputs, whose lp values already carry both guard
    * scalars — a wrong model table nulls every weight downstream.
    * Produces dmper, dmtt, and dmw(domain, counts…, mix_weight). */
  private val dmixCte: String =
    """dmper AS (
      |  SELECT g.grp AS domain,
      |         CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(g.n) AS BIGINT) AS n_tokens,
      |         CAST(sum(ug.nll) AS BIGINT) AS nll_global_fp,
      |         CAST(sum(g.nll) AS BIGINT) AS nll_self_fp,
      |         greatest(CAST(sum(ug.nll) - sum(g.nll) AS BIGINT),
      |                  CAST(0 AS BIGINT)) AS excess_fp
      |  FROM mg g JOIN ug ON g.doc_id = ug.doc_id
      |  GROUP BY g.grp
      |), dmtt AS (
      |  SELECT CAST(coalesce(sum(excess_fp), 0) AS BIGINT) AS te,
      |         CAST(count(*) AS BIGINT) AS nd
      |  FROM dmper
      |), dmw AS (
      |  SELECT domain, n_docs, n_tokens, nll_global_fp, nll_self_fp, excess_fp,
      |         CASE WHEN (SELECT te FROM dmtt) = 0
      |              THEN 1.0 / CAST((SELECT nd FROM dmtt) AS DOUBLE)
      |              ELSE CAST(excess_fp AS DOUBLE) /
      |                   CAST((SELECT te FROM dmtt) AS DOUBLE)
      |         END AS mix_weight
      |  FROM dmper
      |)""".stripMargin

  /** Bigram-LM replay chain — the ONE owner of bigram-table
    * verification (lm_bigram_ppl and lm_backoff_ppl compose it):
    * recomputes transitions, pair counts, context totals, and vocab
    * from the documents table; accepts handoff rows only on count
    * match against the re-derived CAP SELECTIONS. Produces
    * ${p}t(doc_id, ctx, tok), ${p}hbv(ctx, tok, logp_fp),
    * ${p}hcv(ctx, oov_logp_fp), and the guard scalar ${p}ok — one row
    * iff BOTH tables have exactly the re-derived cap row counts and
    * every handoff row matched (row-count equality of the verified
    * views closes silent count mismatches); scoring multiplies each
    * lp by `(SELECT ok FROM ${p}ok)`, so a failed guard nulls EVERY
    * scored row, not just the rows that touch a fallback. */
  private def bigramChainCte(biRp: String, ctxRp: String, p: String): String =
    s"""${p}hb AS (SELECT * FROM $biRp),
       |${p}hc AS (SELECT * FROM $ctxRp),
       |${p}tt AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents
       |), ${p}t AS (
       |  SELECT doc_id, w[i] AS ctx, w[i+1] AS tok
       |  FROM ${p}tt, unnest(range(1, len(w))) AS u(i)
       |  WHERE len(w) >= 2
       |), ${p}pc AS (
       |  SELECT ctx, tok, CAST(count(*) AS BIGINT) AS c_uw
       |  FROM ${p}t GROUP BY ctx, tok
       |), ${p}cc AS (
       |  SELECT ctx, CAST(sum(c_uw) AS BIGINT) AS c_u FROM ${p}pc GROUP BY ctx
       |), ${p}vv AS (
       |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
       |  FROM (SELECT unnest(w) AS token FROM ${p}tt)
       |), ${p}ccap AS (
       |  SELECT ctx, c_u FROM ${p}cc ORDER BY c_u DESC, ctx LIMIT $BigramCtxCap
       |), ${p}hcv AS (
       |  SELECT ${p}hc.ctx, ${p}hc.oov_logp_fp
       |  FROM ${p}hc JOIN ${p}ccap ON ${p}hc.ctx = ${p}ccap.ctx
       |                           AND ${p}hc.c_u = ${p}ccap.c_u
       |  WHERE ${p}hc.v = (SELECT v FROM ${p}vv)
       |), ${p}cap AS (
       |  SELECT ctx, tok, c_uw FROM ${p}pc
       |  ORDER BY c_uw DESC, ctx, tok LIMIT $BigramCap
       |), ${p}hbv AS (
       |  SELECT ${p}hb.ctx, ${p}hb.tok, ${p}hb.logp_fp
       |  FROM ${p}hb JOIN ${p}cap ON ${p}hb.ctx = ${p}cap.ctx
       |                          AND ${p}hb.tok = ${p}cap.tok
       |                          AND ${p}hb.c_uw = ${p}cap.c_uw
       |), ${p}ok AS (
       |  SELECT 1 AS ok
       |  WHERE (SELECT count(*) FROM ${p}hb) =
       |        least($BigramCap, (SELECT count(*) FROM ${p}pc))
       |    AND (SELECT count(*) FROM ${p}hc) =
       |        least($BigramCtxCap, (SELECT count(*) FROM ${p}cc))
       |    AND (SELECT count(*) FROM ${p}hbv) = (SELECT count(*) FROM ${p}hb)
       |    AND (SELECT count(*) FROM ${p}hcv) = (SELECT count(*) FROM ${p}hc)
       |)""".stripMargin

  /** Gopher rules over lt: metric CTE ${p}g plus verdict CTE
    * ${p}k(doc_id, metrics…, keep). */
  private def gopherCte(p: String): String =
    s"""${p}g AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |         CASE WHEN len(w) = 0 THEN 0.0
       |              ELSE CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w)
       |         END AS mean_token_len,
       |         CASE WHEN len(w) = 0 THEN 0.0
       |              ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
       |                     AS DOUBLE) / len(w)
       |         END AS frac_alpha_words,
       |         CAST(len(list_filter(w,
       |           x -> x IN ('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')))
       |           AS BIGINT) AS n_stop_hits
       |  FROM lt
       |), ${p}k AS (
       |  SELECT doc_id, n_tokens, mean_token_len, frac_alpha_words, n_stop_hits,
       |         (n_tokens >= 50 AND n_tokens <= 100000
       |          AND mean_token_len >= 3.0 AND mean_token_len <= 10.0
       |          AND frac_alpha_words >= 0.8 AND n_stop_hits >= 2) AS keep
       |  FROM ${p}g
       |)""".stripMargin


  /** DSIR replay: recomputes labels' bigram buckets + both
    * distributions' counts, verifies model rows with size/sum guards,
    * replays weight sums. Produces ${p}g(doc_id, n, s). */
  private def dsirChainCte(modelRp: String, p: String): String =
    s"""${p}m AS (SELECT * FROM $modelRp),
       |${p}bg AS (
       |  SELECT lt.doc_id, lab.keep,
       |         unnest(CASE WHEN len(lt.w) >= 2
       |                THEN list_transform(range(1, len(lt.w)),
       |                       i -> lt.w[i] || ' ' || lt.w[i+1])
       |                ELSE CAST([] AS VARCHAR[]) END) AS gram
       |  FROM lt JOIN lab ON lt.doc_id = lab.doc_id
       |), ${p}bk AS (
       |  SELECT doc_id, keep,
       |         CAST(CAST('0x' || substr(md5(gram), 1, 15) AS UBIGINT) AS BIGINT)
       |           % $DsirBuckets AS bucket
       |  FROM ${p}bg
       |), ${p}c AS (
       |  SELECT bucket,
       |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c_target,
       |         CAST(count(*) AS BIGINT) AS c_raw
       |  FROM ${p}bk GROUP BY bucket
       |), ${p}gv AS (
       |  SELECT 1 AS ok
       |  WHERE (SELECT count(*) FROM ${p}m) = (SELECT count(*) FROM ${p}c)
       |    AND (SELECT CAST(sum(c_raw) AS BIGINT) FROM ${p}m) =
       |        (SELECT CAST(sum(c_raw) AS BIGINT) FROM ${p}c)
       |), ${p}mv AS (
       |  SELECT ${p}m.bucket, ${p}m.llr_fp
       |  FROM ${p}m JOIN ${p}c ON ${p}m.bucket = ${p}c.bucket
       |                       AND ${p}m.c_target = ${p}c.c_target
       |                       AND ${p}m.c_raw = ${p}c.c_raw
       |), ${p}sc AS (
       |  SELECT ${p}bk.doc_id,
       |         coalesce(${p}mv.llr_fp, 0) * (SELECT ok FROM ${p}gv) AS lp
       |  FROM ${p}bk LEFT JOIN ${p}mv USING (bucket)
       |), ${p}g AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(lp) AS BIGINT) AS s
       |  FROM ${p}sc GROUP BY doc_id
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the LM replay chain (see lmChainCte) + the standalone projection
    "lm_perplexity" ->
      s"""WITH $labelCte,
         |${lmChainCte(rp(LmVocabHandoff), rp(LmStatsHandoff), "u")}
         |SELECT d.doc_id,
         |       CAST(coalesce(ug.n, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(ug.nll, 0) AS BIGINT) AS nll_fp,
         |       CASE WHEN coalesce(ug.n, 0) = 0 THEN 0.0
         |            ELSE CAST(ug.nll AS DOUBLE) / 1000000000.0 / CAST(ug.n AS DOUBLE)
         |       END AS cross_entropy
         |FROM documents d LEFT JOIN ug USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the bigram replay chain (see bigramChainCte) + transition
    // scoring with the per-context OOV fallback, every lp rides the
    // chain's guard scalar.
    "lm_bigram_ppl" ->
      s"""WITH ${bigramChainCte(rp(LmBigramsHandoff), rp(LmCtxHandoff), "b")},
         |sc AS (
         |  SELECT bt.doc_id,
         |         coalesce(bhbv.logp_fp, bhcv.oov_logp_fp)
         |           * (SELECT ok FROM bok) AS lp
         |  FROM bt
         |  LEFT JOIN bhbv ON bt.ctx = bhbv.ctx AND bt.tok = bhbv.tok
         |  JOIN bhcv ON bt.ctx = bhcv.ctx
         |), g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |         CAST(-sum(lp) AS BIGINT) AS nll
         |  FROM sc GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(g.n, 0) AS BIGINT) AS n_transitions,
         |       CAST(coalesce(g.nll, 0) AS BIGINT) AS nll_fp,
         |       CASE WHEN coalesce(g.n, 0) = 0 THEN 0.0
         |            ELSE CAST(g.nll AS DOUBLE) / 1000000000.0 / CAST(g.n AS DOUBLE)
         |       END AS cross_entropy
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // stupid backoff: both model chains verified (unigram via
    // lmChainCte, bigram via bigramChainCte), then the backoff CASE
    // replayed as integer sums — capped-table bigram lp, else
    // ALPHA + unigram lp (vocab or OOV). Alpha = floor(ln(0.4)·1e9)
    // is an algorithm constant interpolated identically on both
    // sides, not a handoff. Both guard scalars ride every lp.
    "lm_backoff_ppl" ->
      s"""WITH $labelCte,
         |${lmChainCte(rp(BkoVocabHandoff), rp(BkoStatsHandoff), "u")},
         |${bigramChainCte(rp(BkoBiHandoff), rp(BkoCtxHandoff), "b")},
         |sc AS (
         |  SELECT bt.doc_id,
         |         coalesce(bhbv.logp_fp,
         |                  ${CorpusModels.StupidBackoffAlphaFp}
         |                  + coalesce(uhv.logp_fp,
         |                             (SELECT oov_logp_fp FROM uvs)))
         |           * (SELECT 1 FROM uvs) * (SELECT ok FROM bok) AS lp
         |  FROM bt
         |  LEFT JOIN bhbv ON bt.ctx = bhbv.ctx AND bt.tok = bhbv.tok
         |  LEFT JOIN uhv ON bt.tok = uhv.token
         |), g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |         CAST(-sum(lp) AS BIGINT) AS nll
         |  FROM sc GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(g.n, 0) AS BIGINT) AS n_transitions,
         |       CAST(coalesce(g.nll, 0) AS BIGINT) AS nll_fp,
         |       CASE WHEN coalesce(g.n, 0) = 0 THEN 0.0
         |            ELSE CAST(g.nll AS DOUBLE) / 1000000000.0 / CAST(g.n AS DOUBLE)
         |       END AS cross_entropy
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the NB replay chain (see nbChainCte) + the standalone projection
    "cls_nb_gate" ->
      s"""WITH $labelCte,
         |${nbChainCte(rp(NbModelHandoff), rp(NbPriorHandoff), "n")}
         |SELECT d.doc_id,
         |       CAST(coalesce(ng.n, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(ng.s, 0) + (SELECT prior_fp FROM npv) AS BIGINT) AS score_fp,
         |       (coalesce(ng.s, 0) + (SELECT prior_fp FROM npv)) > 0 AS keep_pred
         |FROM documents d LEFT JOIN ng USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the same chain, aggregated to the confusion counts — a failed
    // guard nulls the prior scalar, which nulls keep_pred, which
    // zeroes all four confusion counts (CASE-ELSE) while n_docs stays
    // real: tp+fp+tn+fn ≠ n_docs can never match the Spark row, where
    // the four counts partition n_docs by construction.
    "cls_nb_report" ->
      s"""WITH $labelCte,
         |${nbChainCte(rp(NbRepModelHandoff), rp(NbRepPriorHandoff), "n")},
         |pred AS (
         |  SELECT d.doc_id,
         |         (coalesce(ng.s, 0) + (SELECT prior_fp FROM npv)) > 0 AS keep_pred
         |  FROM documents d LEFT JOIN ng USING (doc_id)
         |), j AS (
         |  SELECT pred.keep_pred, lab.keep
         |  FROM pred JOIN lab ON pred.doc_id = lab.doc_id
         |)
         |SELECT CAST(sum(CASE WHEN keep_pred AND keep THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |       CAST(sum(CASE WHEN keep_pred AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |       CAST(sum(CASE WHEN NOT keep_pred AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |       CAST(sum(CASE WHEN NOT keep_pred AND keep THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN keep_pred AND keep THEN 1 ELSE 0 END)
         |            + sum(CASE WHEN NOT keep_pred AND NOT keep THEN 1 ELSE 0 END)
         |              AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
         |FROM j""".stripMargin,
    // verify DSIR end-to-end: recompute labels, bigrams, md5-mod-B
    // buckets, and both distributions' counts; accept model rows on
    // (c_target, c_raw) match with row-count + sum guards; replay
    // the weight sums.
    // the DSIR replay chain (see dsirChainCte) + standalone projection
    "dsir_weights" ->
      s"""WITH $labelCte,
         |${dsirChainCte(rp(DsirModelHandoff), "d")}
         |SELECT d.doc_id,
         |       CAST(coalesce(dg.n, 0) AS BIGINT) AS n_grams,
         |       CAST(coalesce(dg.s, 0) AS BIGINT) AS weight_fp,
         |       CAST(coalesce(dg.s, 0) AS DOUBLE) / 1000000000.0 AS weight
         |FROM documents d LEFT JOIN dg USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the SELECTION step on the same chain: exact global rank by
    // (weight desc, id) and the integer top-60% boundary — the
    // rank/boundary math mirrors Ranking.topFraction exactly.
    "dsir_select" ->
      s"""WITH $labelCte,
         |${dsirChainCte(rp(DsirSelHandoff), "d")},
         |w AS (
         |  SELECT d.doc_id, CAST(coalesce(dg.s, 0) AS BIGINT) AS weight_fp
         |  FROM documents d LEFT JOIN dg USING (doc_id)
         |), r AS (
         |  SELECT doc_id, weight_fp,
         |         CAST(row_number() OVER (ORDER BY weight_fp DESC, doc_id)
         |              AS BIGINT) AS global_rank,
         |         CAST(count(*) OVER () AS BIGINT) AS nn
         |  FROM w
         |)
         |SELECT doc_id, weight_fp, global_rank
         |FROM r WHERE global_rank <= greatest(1, (nn * 60) // 100)
         |ORDER BY doc_id""".stripMargin,
    // Gumbel-top-k resampling on the same weights chain: re-derive
    // every weight AND the hash integer h52 = top-52-md5-bits of
    // (doc_id ':' seed); accept key rows only on full (weight, h52)
    // match with row-count guards; replay key = weight_fp + gumbel_fp,
    // the rank, and the integer boundary. Only the −ln(−ln(u)) value
    // mapping is taken from the verified handoff row (the family's ln
    // rule — monotonicity in h52 is spec-gated).
    "dsir_resample" ->
      s"""WITH $labelCte,
         |${dsirChainCte(rp(DsirRsModelHandoff), "d")},
         |gk AS (SELECT * FROM ${rp(DsirRsKeysHandoff)}),
         |w AS (
         |  SELECT d.doc_id, CAST(coalesce(dg.s, 0) AS BIGINT) AS weight_fp
         |  FROM documents d LEFT JOIN dg USING (doc_id)
         |), gv AS (
         |  SELECT gk.doc_id, gk.weight_fp, gk.gumbel_fp
         |  FROM gk JOIN w ON gk.doc_id = w.doc_id
         |               AND gk.weight_fp = w.weight_fp
         |  WHERE gk.h52 = CAST(CAST('0x' ||
         |          substr(md5(CAST(gk.doc_id AS VARCHAR) || ':$ResampleSeed'), 1, 13)
         |          AS UBIGINT) AS BIGINT)
         |), gok AS (
         |  SELECT 1 AS ok
         |  WHERE (SELECT count(*) FROM gk) = (SELECT count(*) FROM w)
         |    AND (SELECT count(*) FROM gv) = (SELECT count(*) FROM w)
         |), r AS (
         |  SELECT doc_id, weight_fp, gumbel_fp,
         |         CAST((weight_fp + gumbel_fp) * (SELECT ok FROM gok)
         |              AS BIGINT) AS key_fp,
         |         CAST(row_number() OVER (ORDER BY (weight_fp + gumbel_fp) DESC,
         |                                 doc_id) AS BIGINT) AS global_rank,
         |         CAST(count(*) OVER () AS BIGINT) AS nn
         |  FROM gv
         |)
         |SELECT doc_id, weight_fp, gumbel_fp, key_fp, global_rank
         |FROM r WHERE global_rank <= greatest(1, (nn * 60) // 100)
         |ORDER BY doc_id""".stripMargin,
    // the SELECTION step on the unigram-LM chain: rank by
    // (cross_entropy asc, doc_id), keep the integer top-60% — the
    // rank/boundary math mirrors Ranking.topFraction exactly, the
    // cross_entropy doubles are the engine-identical division chain.
    "ppl_select" ->
      s"""WITH $labelCte,
         |${lmChainCte(rp(PplSelVocabHandoff), rp(PplSelStatsHandoff), "u")},
         |w AS (
         |  SELECT d.doc_id,
         |         CASE WHEN coalesce(ug.n, 0) = 0 THEN 0.0
         |              ELSE CAST(ug.nll AS DOUBLE) / 1000000000.0 / CAST(ug.n AS DOUBLE)
         |         END AS cross_entropy
         |  FROM documents d LEFT JOIN ug USING (doc_id)
         |), r AS (
         |  SELECT doc_id, cross_entropy,
         |         CAST(row_number() OVER (ORDER BY cross_entropy ASC, doc_id)
         |              AS BIGINT) AS global_rank,
         |         CAST(count(*) OVER () AS BIGINT) AS nn
         |  FROM w
         |)
         |SELECT doc_id, cross_entropy, global_rank
         |FROM r WHERE global_rank <= greatest(1, (nn * 60) // 100)
         |ORDER BY doc_id""".stripMargin,
    // the tercile split on the same chain: DuckDB's REAL ntile(3)
    // pins the ANSI remainder-to-leading-buckets sizing of
    // Ranking.ntileBuckets on the model-scored ordering.
    "ppl_buckets" ->
      s"""WITH $labelCte,
         |${lmChainCte(rp(PplBktVocabHandoff), rp(PplBktStatsHandoff), "u")},
         |w AS (
         |  SELECT d.doc_id,
         |         CASE WHEN coalesce(ug.n, 0) = 0 THEN 0.0
         |              ELSE CAST(ug.nll AS DOUBLE) / 1000000000.0 / CAST(ug.n AS DOUBLE)
         |         END AS cross_entropy
         |  FROM documents d LEFT JOIN ug USING (doc_id)
         |)
         |SELECT doc_id, cross_entropy,
         |       CAST(ntile(3) OVER (ORDER BY cross_entropy ASC, doc_id) AS BIGINT)
         |         AS ppl_bucket
         |FROM w ORDER BY doc_id""".stripMargin,
    // DoReMi-lite: BOTH chains replay (global via lmChainCte, grouped
    // via groupedLmChainCte, one owner each), then the per-domain
    // aggregation, the excess clamp, and the exact-rational mixture
    // division — all from re-derived integers; both guard scalars
    // ride every lp, so a wrong model table nulls every output row.
    "domain_mix_weights" ->
      s"""WITH $ltOnlyCte,
         |${lmChainCte(rp(DmixGVocabHandoff), rp(DmixGStatsHandoff), "u")},
         |${groupedLmChainCte(rp(DmixDVocabHandoff), rp(DmixDStatsHandoff), "source", "m")},
         |$dmixCte
         |SELECT domain, n_docs, n_tokens, nll_global_fp, nll_self_fp, excess_fp,
         |       mix_weight
         |FROM dmw ORDER BY domain""".stripMargin,
    // the materialization on the same (one-owner) mixture chain, on
    // dedicated handoff paths: budget_d = floor(mix_weight · B) from
    // the replayed weights, then the rel_token_budget cumsum mirror —
    // both chains' guard scalars null the weights on a bad model
    // table, which nulls every budget, which drops every row (loud).
    "domain_mix_select" ->
      s"""WITH $ltOnlyCte,
         |${lmChainCte(rp(DmsGVocabHandoff), rp(DmsGStatsHandoff), "u")},
         |${groupedLmChainCte(rp(DmsDVocabHandoff), rp(DmsDStatsHandoff), "source", "m")},
         |$dmixCte,
         |bt AS (
         |  SELECT domain,
         |         CAST(floor(mix_weight * $DmixBudget.0) AS BIGINT) AS budget
         |  FROM dmw
         |), t AS (
         |  SELECT doc_id, source,
         |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |              AS BIGINT) AS n_tok,
         |         md5(CAST(doc_id AS VARCHAR) || '|') AS draw
         |  FROM documents WHERE source IS NOT NULL
         |), c AS (
         |  SELECT doc_id, source, n_tok,
         |         sum(n_tok) OVER (PARTITION BY source ORDER BY draw, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t
         |)
         |SELECT c.source, c.doc_id, c.n_tok FROM c
         |JOIN bt ON c.source = bt.domain
         |WHERE c.cum - c.n_tok < bt.budget
         |ORDER BY c.doc_id""".stripMargin,
    // per-language terciles on the grouped chain: DuckDB's REAL
    // ntile(3) PARTITION BY lang pins Ranking.ntilePerGroup's grouped
    // range-exchange rank + ANSI bucket math.
    "ppl_buckets_by_lang" ->
      s"""WITH $ltOnlyCte,
         |${groupedLmChainCte(rp(LangVocabHandoff), rp(LangStatsHandoff), "lang", "m")},
         |w AS (
         |  SELECT d.doc_id, d.lang,
         |         CASE WHEN coalesce(g.n, 0) = 0 THEN 0.0
         |              ELSE CAST(g.nll AS DOUBLE) / 1000000000.0 / CAST(g.n AS DOUBLE)
         |         END AS cross_entropy
         |  FROM documents d LEFT JOIN mg g ON d.doc_id = g.doc_id
         |)
         |SELECT doc_id, lang, cross_entropy,
         |       CAST(ntile(3) OVER (PARTITION BY lang
         |                           ORDER BY cross_entropy ASC, doc_id) AS BIGINT)
         |         AS ppl_bucket
         |FROM w ORDER BY doc_id""".stripMargin,
    // the multiclass-NB replay chain (see mcNbChainCte) + the
    // standalone projection with the actual-lang comparison
    "cls_lang_nb" ->
      s"""WITH $ltOnlyCte,
         |${mcNbChainCte(rp(McnVocabHandoff), rp(McnStatsHandoff),
                         rp(McnPriorsHandoff), "lang", "x")}
         |SELECT d.doc_id,
         |       CAST(coalesce(xdn.n, 0) AS BIGINT) AS n_tokens,
         |       xpred.pred AS pred_lang,
         |       CAST(xpred.score_fp AS BIGINT) AS score_fp,
         |       d.lang,
         |       (d.lang = xpred.pred) AS correct
         |FROM documents d
         |JOIN xpred ON d.doc_id = xpred.doc_id
         |LEFT JOIN xdn ON d.doc_id = xdn.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // character-entropy replay: re-derive per-doc char counts and doc
    // lengths; verify the ln table covers EXACTLY the distinct count
    // values (row-count guards both ways); replay the fixed-point sums
    // and the engine-identical division/subtraction chain. Only ln()
    // rides the handoff.
    "t_char_entropy" ->
      s"""WITH lt0 AS (SELECT * FROM ${rp(EntLnHandoff)}),
         |ec AS (
         |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
         |        FROM documents)
         |  WHERE ch <> '' GROUP BY 1, 2
         |), en AS (
         |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM ec GROUP BY 1
         |), evals AS (
         |  SELECT DISTINCT v FROM (
         |    SELECT cnt AS v FROM ec UNION SELECT n AS v FROM en)
         |), eltv AS (
         |  SELECT lt0.v, lt0.ln_fp FROM lt0 JOIN evals USING (v)
         |), eok AS (
         |  SELECT 1 AS ok
         |  WHERE (SELECT count(*) FROM lt0) = (SELECT count(*) FROM evals)
         |    AND (SELECT count(*) FROM eltv) = (SELECT count(*) FROM evals)
         |), es AS (
         |  SELECT ec.doc_id, CAST(sum(ec.cnt * eltv.ln_fp) AS BIGINT) AS s
         |  FROM ec JOIN eltv ON ec.cnt = eltv.v GROUP BY 1
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(en.n, 0) AS BIGINT) AS n_chars,
         |       CAST(coalesce(es.s, 0) * (SELECT ok FROM eok) AS BIGINT)
         |         AS sum_clnc_fp,
         |       CASE WHEN coalesce(en.n, 0) = 0 THEN 0.0
         |            ELSE (CAST(lnn.ln_fp AS DOUBLE) / 1000000000.0
         |                  - CAST(es.s AS DOUBLE) / 1000000000.0
         |                    / CAST(en.n AS DOUBLE))
         |                 * (SELECT ok FROM eok)
         |       END AS entropy_nats
         |FROM documents d
         |LEFT JOIN en ON d.doc_id = en.doc_id
         |LEFT JOIN es ON d.doc_id = es.doc_id
         |LEFT JOIN eltv lnn ON en.n = lnn.v
         |ORDER BY d.doc_id""".stripMargin,
    // KL drift replay: re-derive the (source, token) counts, the
    // corpus-wide token counts, and both totals; accept handoff rows
    // only on full count match with row-count + sum omission guards;
    // replay the per-group KL sums as exact integers and the
    // engine-identical division chain. The guard scalar rides every
    // aggregate, so a wrong model table nulls every output column.
    "corpus_kl_drift" ->
      s"""WITH $ltOnlyCte,
         |km AS (SELECT * FROM ${rp(KlModelHandoff)}),
         |kt AS (
         |  SELECT d.source AS grp, unnest(lt.w) AS token
         |  FROM lt JOIN documents d ON lt.doc_id = d.doc_id
         |), kc AS (
         |  SELECT grp, token, CAST(count(*) AS BIGINT) AS cnt
         |  FROM kt GROUP BY 1, 2
         |), ka AS (
         |  SELECT token, CAST(sum(cnt) AS BIGINT) AS cnt_all
         |  FROM kc GROUP BY 1
         |), kmv AS (
         |  SELECT km.grp, km.token, km.cnt, km.lr_fp
         |  FROM km
         |  JOIN kc ON km.grp = kc.grp AND km.token = kc.token
         |         AND km.cnt = kc.cnt
         |  JOIN ka ON km.token = ka.token AND km.cnt_all = ka.cnt_all
         |), kok AS (
         |  SELECT 1 AS ok
         |  WHERE (SELECT count(*) FROM km) = (SELECT count(*) FROM kc)
         |    AND (SELECT count(*) FROM kmv) = (SELECT count(*) FROM kc)
         |    AND (SELECT CAST(sum(cnt) AS BIGINT) FROM km) =
         |        (SELECT CAST(sum(cnt) AS BIGINT) FROM kc)
         |)
         |SELECT grp,
         |       CAST(sum(cnt) * (SELECT ok FROM kok) AS BIGINT) AS n_tokens,
         |       CAST(sum(cnt * lr_fp) * (SELECT ok FROM kok) AS BIGINT) AS kl_fp,
         |       CAST(sum(cnt * lr_fp) AS DOUBLE) * (SELECT ok FROM kok)
         |         / 1000000000.0 / CAST(sum(cnt) AS DOUBLE) AS kl_nats
         |FROM kmv GROUP BY grp
         |ORDER BY grp""".stripMargin,
    // replay SemDeDup from the index handoff: within-cluster pairs at
    // the cosine threshold, recursive-CTE components, keep the
    // max-dist_fp (tie: min id) member per component.
    "semdedup_keep" ->
      s"""WITH RECURSIVE
         |cents AS (SELECT * FROM ${rp(SemCentHandoff)}),
         |asg AS (SELECT * FROM ${rp(SemAsgHandoff)}),
         |d AS (
         |  SELECT a.vec_id, a.ivf_cluster,
         |         CAST(floor(CAST(list_distance(e.embedding, c.centroid) AS DOUBLE)
         |                    * 1048576.0) AS BIGINT) AS dist_fp
         |  FROM asg a
         |  JOIN embeddings e ON a.vec_id = e.vec_id
         |  JOIN cents c ON a.ivf_cluster = c.cluster_id
         |), pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM asg a JOIN asg b
         |    ON a.ivf_cluster = b.ivf_cluster AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON a.vec_id = ea.vec_id
         |  JOIN embeddings eb ON b.vec_id = eb.vec_id
         |  -- nz guards = the kernel's zero-norm rule (NaN would pass)
         |  WHERE len(list_filter(ea.embedding, x -> x <> 0)) > 0
         |    AND len(list_filter(eb.embedding, x -> x <> 0)) > 0
         |    AND CAST(list_cosine_similarity(ea.embedding, eb.embedding) AS DOUBLE)
         |        >= 0.45
         |), sym AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b AS u, id_a AS v FROM pairs
         |), reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
         |), comp AS (
         |  SELECT u AS node_id, least(u, min(v)) AS component
         |  FROM reach GROUP BY u
         |), mem AS (
         |  SELECT c.node_id, c.component, d.dist_fp
         |  FROM comp c JOIN d ON c.node_id = d.vec_id
         |), best AS (
         |  SELECT component, max(dist_fp) AS b FROM mem GROUP BY component
         |), win AS (
         |  SELECT m.component, min(m.node_id) AS winner
         |  FROM mem m JOIN best ON m.component = best.component
         |                      AND m.dist_fp = best.b
         |  GROUP BY m.component
         |), victims AS (
         |  SELECT node_id FROM mem
         |  WHERE node_id NOT IN (SELECT winner FROM win)
         |)
         |SELECT d.vec_id, CAST(d.ivf_cluster AS INTEGER) AS ivf_cluster, d.dist_fp,
         |       d.vec_id NOT IN (SELECT node_id FROM victims) AS kept
         |FROM d ORDER BY vec_id""".stripMargin,
    // the composite: the SAME chains as the standalone oracles (one
    // owner each — nbChainCte / lmChainCte / gopherCte), composed on
    // dedicated handoff paths, then the same joins and AND verdict.
    "model_curation_pipeline" ->
      s"""WITH $labelCte,
         |${nbChainCte(rp(McpNbModelHandoff), rp(McpNbPriorHandoff), "n")},
         |${lmChainCte(rp(McpLmVocabHandoff), rp(McpLmStatsHandoff), "u")},
         |${gopherCte("q")}
         |SELECT d.doc_id,
         |       CAST(coalesce(ng.s, 0) + (SELECT prior_fp FROM npv) AS BIGINT) AS score_fp,
         |       (coalesce(ng.s, 0) + (SELECT prior_fp FROM npv)) > 0 AS keep_pred,
         |       CASE WHEN coalesce(ug.n, 0) = 0 THEN 0.0
         |            ELSE CAST(ug.nll AS DOUBLE) / 1000000000.0 / CAST(ug.n AS DOUBLE)
         |       END AS cross_entropy,
         |       qk.keep AS gopher_keep,
         |       ((coalesce(ng.s, 0) + (SELECT prior_fp FROM npv)) > 0
         |        AND qk.keep) AS keep
         |FROM documents d
         |LEFT JOIN ng ON d.doc_id = ng.doc_id
         |LEFT JOIN ug ON d.doc_id = ug.doc_id
         |JOIN qk ON d.doc_id = qk.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // the Gopher chain (see gopherCte) + the standalone projection
    "t_gopher_rules" ->
      s"""WITH $labelCte,
         |${gopherCte("q")}
         |SELECT doc_id, n_tokens, mean_token_len, frac_alpha_words, n_stop_hits, keep
         |FROM qk ORDER BY doc_id""".stripMargin

  )
}
