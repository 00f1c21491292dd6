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
  * SIZE guards (row count + count sums must equal the recomputed
  * ones) close the silent-omission hole: a model missing a row fails
  * the guard, which nulls the scalar the scoring needs, failing every
  * output row. Only the ln() value mapping itself is taken from the
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
  private val McpNbModelHandoff = Handoff.path("mcp_nb_model")
  private val McpNbPriorHandoff = Handoff.path("mcp_nb_prior")
  private val McpLmVocabHandoff = Handoff.path("mcp_lm_vocab")
  private val McpLmStatsHandoff = Handoff.path("mcp_lm_stats")
  private val SemCentHandoff   = Handoff.path("semdedup_centroids")
  private val SemAsgHandoff    = Handoff.path("semdedup_assigned")

  /** Fixture-aware vocab cap: the word-soup corpus has ~31 distinct
    * tokens, so 24 genuinely exercises the OOV path the cap exists
    * for (at 100 TB the same knob would sit at ~1M). */
  private val LmCap = 24

  /** Bigram-table cap: the fixture has ~916 distinct transitions, so
    * 512 exercises the per-context OOV fallback. */
  private val BigramCap = 512

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
    val k = semKCache.getOrElseUpdate(key,
      math.max(16, (Tables.embeddings(s, dir).count() / 1000L).toInt))
    AnnQueries.persistedIvf(s, dir, k)
  }
  private val semKCache = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** The rule-based quality-gate labels (the t_quality_gate verdict,
    * reduced to (doc_id, keep)) — training labels for the NB
    * classifier and the DSIR target distribution. Delegates to
    * [[TextQueries.qualityGateFrame]], the ONE owner of the gate
    * formulas, so labels can never fork from the gate. */
  private def gateLabels(s: SparkSession, dir: String): DataFrame =
    TextQueries.qualityGateFrame(s, dir).select(col("doc_id"), col("keep"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CCNet-style LM quality signal: train the smoothed unigram LM on
    // the corpus, score every doc's cross-entropy under it. The
    // capped vocab + stats row are the handoffs; scoring is replayed
    // from them over independently recomputed token streams.
    "lm_perplexity" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (vocab0, stats0) = CorpusModels.unigramLm(docs, "text", LmCap)
      val vocab = Handoff.publish(vocab0, LmVocabHandoff)
      val stats = Handoff.publish(stats0, LmStatsHandoff)
      CorpusModels.perplexity(docs, "doc_id", "text", vocab, stats)
        .orderBy(col("doc_id"))
    },
    // the context-aware LM signal (CCNet's actual model family):
    // bigram transitions with per-context Laplace smoothing; capped
    // transition table + full context table are the handoffs.
    "lm_bigram_ppl" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val (bi0, ctx0) = CorpusModels.bigramLm(docs, "text", BigramCap)
      val bi = Handoff.publish(bi0, LmBigramsHandoff)
      val ctx = Handoff.publish(ctx0, LmCtxHandoff)
      CorpusModels.bigramPerplexity(docs, "doc_id", "text", bi, ctx)
        .orderBy(col("doc_id"))
    },
    // classifier-based quality filter: NB trained on the rule-gate
    // labels, scoring the full corpus. keep_pred is the Bayes
    // decision; divergence from the rule labels is exactly the
    // classifier's generalization (spec-gated for accuracy).
    "cls_nb_gate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val labeled = docs.join(gateLabels(s, dir), Seq("doc_id"))
      val (model0, prior0) = CorpusModels.nbTrain(labeled, "text", "keep")
      val model = Handoff.publish(model0, NbModelHandoff)
      val prior = Handoff.publish(prior0, NbPriorHandoff)
      CorpusModels.nbScore(docs, "doc_id", "text", model, prior)
        .orderBy(col("doc_id"))
    },
    // DSIR: hashed-bigram importance weights of the raw corpus toward
    // the gate-kept target distribution. The bucket model is the
    // handoff; buckets are md5-mod-B, recomputable in SQL.
    "dsir_weights" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val labeled = docs.join(gateLabels(s, dir), Seq("doc_id"))
      CorpusModels.dsirPipeline(labeled, "doc_id", "text", "keep", DsirBuckets,
          publish = Handoff.publish(_, DsirModelHandoff))
        .orderBy(col("doc_id"))
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
      val docs = Tables.documents(s, dir)
      val labeled = docs.join(gateLabels(s, dir), Seq("doc_id"))
      val (model0, prior0) = CorpusModels.nbTrain(labeled, "text", "keep")
      val model = Handoff.publish(model0, McpNbModelHandoff)
      val prior = Handoff.publish(prior0, McpNbPriorHandoff)
      val nb = CorpusModels.nbScore(docs, "doc_id", "text", model, prior)
        .select(col("doc_id"), col("score_fp"), col("keep_pred"))
      val (vocab0, stats0) = CorpusModels.unigramLm(docs, "text", LmCap)
      val vocab = Handoff.publish(vocab0, McpLmVocabHandoff)
      val stats = Handoff.publish(stats0, McpLmStatsHandoff)
      val ppl = CorpusModels.perplexity(docs, "doc_id", "text", vocab, stats)
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

  val oracle: Map[String, String] = Map(
    // verify the LM end-to-end: recompute token counts, totals, and
    // the capped-vocab SELECTION; accept the handoff row only when
    // its counts match; the stats row only when its totals match AND
    // the handoff has exactly the expected row count (omission
    // guard). Then replay scoring as integer sums.
    "lm_perplexity" ->
      s"""WITH h AS (SELECT * FROM ${rp(LmVocabHandoff)}),
         |hs AS (SELECT * FROM ${rp(LmStatsHandoff)}),
         |t AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
         |  FROM documents
         |), c AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY token
         |), tot AS (
         |  SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS vocab_total
         |  FROM c
         |), vs AS (
         |  SELECT hs.oov_logp_fp FROM hs JOIN tot
         |    ON hs.n_tokens = tot.n_tokens AND hs.vocab_total = tot.vocab_total
         |  WHERE (SELECT count(*) FROM h) =
         |        least($LmCap, (SELECT vocab_total FROM tot))
         |), cap AS (
         |  SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT $LmCap
         |), hv AS (
         |  SELECT h.token, h.logp_fp
         |  FROM h JOIN cap ON h.token = cap.token AND h.cnt = cap.cnt
         |), sc AS (
         |  SELECT t.doc_id, coalesce(hv.logp_fp, (SELECT oov_logp_fp FROM vs)) AS lp
         |  FROM t LEFT JOIN hv USING (token)
         |), g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |         CAST(-sum(lp) AS BIGINT) AS nll
         |  FROM sc GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(g.n, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(g.nll, 0) AS BIGINT) AS nll_fp,
         |       CASE WHEN coalesce(g.n, 0) = 0 THEN 0.0
         |            ELSE CAST(g.nll AS DOUBLE) / 1000000000.0 / CAST(g.n AS DOUBLE)
         |       END AS cross_entropy
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // verify the bigram LM end-to-end: recompute transitions, pair
    // counts, context totals, vocab, and the cap SELECTION; accept
    // handoff rows on count match with row-count guards; replay
    // scoring with the per-context OOV fallback.
    "lm_bigram_ppl" ->
      s"""WITH hb AS (SELECT * FROM ${rp(LmBigramsHandoff)}),
         |hc AS (SELECT * FROM ${rp(LmCtxHandoff)}),
         |tt AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
         |  FROM documents
         |), t AS (
         |  SELECT doc_id, w[i] AS ctx, w[i+1] AS tok
         |  FROM tt, unnest(range(1, len(w))) AS u(i)
         |  WHERE len(w) >= 2
         |), pc AS (
         |  SELECT ctx, tok, CAST(count(*) AS BIGINT) AS c_uw
         |  FROM t GROUP BY ctx, tok
         |), cc AS (
         |  SELECT ctx, CAST(sum(c_uw) AS BIGINT) AS c_u FROM pc GROUP BY ctx
         |), hcv AS (
         |  SELECT hc.ctx, hc.oov_logp_fp
         |  FROM hc JOIN cc ON hc.ctx = cc.ctx AND hc.c_u = cc.c_u
         |  WHERE (SELECT count(*) FROM hc) = (SELECT count(*) FROM cc)
         |), cap AS (
         |  SELECT ctx, tok, c_uw FROM pc
         |  ORDER BY c_uw DESC, ctx, tok LIMIT $BigramCap
         |), hbv AS (
         |  SELECT hb.ctx, hb.tok, hb.logp_fp
         |  FROM hb JOIN cap ON hb.ctx = cap.ctx AND hb.tok = cap.tok
         |                  AND hb.c_uw = cap.c_uw
         |  WHERE (SELECT count(*) FROM hb) =
         |        least($BigramCap, (SELECT count(*) FROM pc))
         |), sc AS (
         |  SELECT t.doc_id, coalesce(hbv.logp_fp, hcv.oov_logp_fp) AS lp
         |  FROM t
         |  LEFT JOIN hbv ON t.ctx = hbv.ctx AND t.tok = hbv.tok
         |  JOIN hcv ON t.ctx = hcv.ctx
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
    // verify NB end-to-end: recompute gate labels, per-class token
    // counts, totals, and doc priors; accept model rows on count
    // match, the prior row on five-way total match + model row-count
    // and count-sum guards; replay scoring.
    "cls_nb_gate" ->
      s"""WITH m AS (SELECT * FROM ${rp(NbModelHandoff)}),
         |p AS (SELECT * FROM ${rp(NbPriorHandoff)}),
         |$labelCte,
         |tk AS (
         |  SELECT lt.doc_id, lab.keep, unnest(lt.w) AS token
         |  FROM lt JOIN lab ON lt.doc_id = lab.doc_id
         |), c AS (
         |  SELECT token,
         |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         |         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
         |  FROM tk GROUP BY token
         |), tot AS (
         |  SELECT CAST(sum(c_pos) AS BIGINT) AS np, CAST(sum(c_neg) AS BIGINT) AS nn,
         |         CAST(count(*) AS BIGINT) AS v
         |  FROM c
         |), dtot AS (
         |  SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS npd,
         |         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS nnd
         |  FROM lab
         |), pv AS (
         |  SELECT p.prior_fp FROM p
         |  JOIN tot ON p.n_pos_tok = tot.np AND p.n_neg_tok = tot.nn
         |          AND p.vocab_size = tot.v
         |  JOIN dtot ON p.n_pos_docs = dtot.npd AND p.n_neg_docs = dtot.nnd
         |  WHERE (SELECT count(*) FROM m) = (SELECT v FROM tot)
         |    AND (SELECT CAST(sum(c_pos) + sum(c_neg) AS BIGINT) FROM m) =
         |        (SELECT np + nn FROM tot)
         |), mv AS (
         |  SELECT m.token, m.llr_fp
         |  FROM m JOIN c ON m.token = c.token AND m.c_pos = c.c_pos
         |                AND m.c_neg = c.c_neg
         |), sc AS (
         |  SELECT tk.doc_id, coalesce(mv.llr_fp, 0) AS lp
         |  FROM tk LEFT JOIN mv USING (token)
         |), g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(lp) AS BIGINT) AS s
         |  FROM sc GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(g.n, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(g.s, 0) + (SELECT prior_fp FROM pv) AS BIGINT) AS score_fp,
         |       (coalesce(g.s, 0) + (SELECT prior_fp FROM pv)) > 0 AS keep_pred
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // verify DSIR end-to-end: recompute labels, bigrams, md5-mod-B
    // buckets, and both distributions' counts; accept model rows on
    // (c_target, c_raw) match with row-count + sum guards; replay
    // the weight sums.
    "dsir_weights" ->
      s"""WITH m AS (SELECT * FROM ${rp(DsirModelHandoff)}),
         |$labelCte,
         |bg AS (
         |  SELECT lt.doc_id, lab.keep,
         |         unnest(CASE WHEN len(lt.w) >= 2
         |                THEN list_transform(range(1, len(lt.w)),
         |                       i -> lt.w[i] || ' ' || lt.w[i+1])
         |                ELSE CAST([] AS VARCHAR[]) END) AS gram
         |  FROM lt JOIN lab ON lt.doc_id = lab.doc_id
         |), bk AS (
         |  SELECT doc_id, keep,
         |         CAST(CAST('0x' || substr(md5(gram), 1, 15) AS UBIGINT) AS BIGINT)
         |           % $DsirBuckets AS bucket
         |  FROM bg
         |), c AS (
         |  SELECT bucket,
         |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c_target,
         |         CAST(count(*) AS BIGINT) AS c_raw
         |  FROM bk GROUP BY bucket
         |), gv AS (
         |  SELECT 1 AS ok
         |  WHERE (SELECT count(*) FROM m) = (SELECT count(*) FROM c)
         |    AND (SELECT CAST(sum(c_raw) AS BIGINT) FROM m) =
         |        (SELECT CAST(sum(c_raw) AS BIGINT) FROM c)
         |), mv AS (
         |  SELECT m.bucket, m.llr_fp
         |  FROM m JOIN c ON m.bucket = c.bucket AND m.c_target = c.c_target
         |                AND m.c_raw = c.c_raw
         |), sc AS (
         |  SELECT bk.doc_id,
         |         coalesce(mv.llr_fp, 0) * (SELECT ok FROM gv) AS lp
         |  FROM bk LEFT JOIN mv USING (bucket)
         |), g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(lp) AS BIGINT) AS s
         |  FROM sc GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(g.n, 0) AS BIGINT) AS n_grams,
         |       CAST(coalesce(g.s, 0) AS BIGINT) AS weight_fp,
         |       CAST(coalesce(g.s, 0) AS DOUBLE) / 1000000000.0 AS weight
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
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
         |  WHERE CAST(list_cosine_similarity(ea.embedding, eb.embedding) AS DOUBLE)
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
    // the composite: every stage's replay chain composed into one
    // statement — NB (labels recomputed via the shared gateCte, class
    // counts + priors verified, scoring replayed), unigram LM (counts,
    // totals, cap selection verified, scoring replayed), Gopher rules
    // (pure SQL) — then the same joins and the same AND verdict.
    "model_curation_pipeline" ->
      s"""WITH nm AS (SELECT * FROM ${rp(McpNbModelHandoff)}),
         |np AS (SELECT * FROM ${rp(McpNbPriorHandoff)}),
         |uh AS (SELECT * FROM ${rp(McpLmVocabHandoff)}),
         |us AS (SELECT * FROM ${rp(McpLmStatsHandoff)}),
         |$labelCte,
         |tk AS (
         |  SELECT lt.doc_id, lab.keep, unnest(lt.w) AS token
         |  FROM lt JOIN lab ON lt.doc_id = lab.doc_id
         |), c AS (
         |  SELECT token,
         |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         |         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS c_neg
         |  FROM tk GROUP BY token
         |), tot AS (
         |  SELECT CAST(sum(c_pos) AS BIGINT) AS np_, CAST(sum(c_neg) AS BIGINT) AS nn_,
         |         CAST(count(*) AS BIGINT) AS v
         |  FROM c
         |), dtot AS (
         |  SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS npd,
         |         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS nnd
         |  FROM lab
         |), pv AS (
         |  SELECT np.prior_fp FROM np
         |  JOIN tot ON np.n_pos_tok = tot.np_ AND np.n_neg_tok = tot.nn_
         |          AND np.vocab_size = tot.v
         |  JOIN dtot ON np.n_pos_docs = dtot.npd AND np.n_neg_docs = dtot.nnd
         |  WHERE (SELECT count(*) FROM nm) = (SELECT v FROM tot)
         |    AND (SELECT CAST(sum(c_pos) + sum(c_neg) AS BIGINT) FROM nm) =
         |        (SELECT np_ + nn_ FROM tot)
         |), mv AS (
         |  SELECT nm.token, nm.llr_fp
         |  FROM nm JOIN c ON nm.token = c.token AND nm.c_pos = c.c_pos
         |                AND nm.c_neg = c.c_neg
         |), nsc AS (
         |  SELECT tk.doc_id, coalesce(mv.llr_fp, 0) AS lp
         |  FROM tk LEFT JOIN mv USING (token)
         |), ng AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(lp) AS BIGINT) AS s
         |  FROM nsc GROUP BY doc_id
         |), uc AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(w) AS token FROM lt) GROUP BY token
         |), utot AS (
         |  SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS vocab_total
         |  FROM uc
         |), uvs AS (
         |  SELECT us.oov_logp_fp FROM us JOIN utot
         |    ON us.n_tokens = utot.n_tokens AND us.vocab_total = utot.vocab_total
         |  WHERE (SELECT count(*) FROM uh) =
         |        least($LmCap, (SELECT vocab_total FROM utot))
         |), ucap AS (
         |  SELECT token, cnt FROM uc ORDER BY cnt DESC, token LIMIT $LmCap
         |), uhv AS (
         |  SELECT uh.token, uh.logp_fp
         |  FROM uh JOIN ucap ON uh.token = ucap.token AND uh.cnt = ucap.cnt
         |), usc AS (
         |  SELECT t2.doc_id, coalesce(uhv.logp_fp, (SELECT oov_logp_fp FROM uvs)) AS lp
         |  FROM (SELECT doc_id, unnest(w) AS token FROM lt) t2
         |  LEFT JOIN uhv USING (token)
         |), ug AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |         CAST(-sum(lp) AS BIGINT) AS nll
         |  FROM usc GROUP BY doc_id
         |), gp AS (
         |  SELECT doc_id,
         |         (len(w) >= 50 AND len(w) <= 100000
         |          AND (CASE WHEN len(w) = 0 THEN 0.0
         |               ELSE CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w) END)
         |              BETWEEN 3.0 AND 10.0
         |          AND (CASE WHEN len(w) = 0 THEN 0.0
         |               ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
         |                      AS DOUBLE) / len(w) END) >= 0.8
         |          AND len(list_filter(w,
         |            x -> x IN ('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')))
         |              >= 2) AS gopher_keep
         |  FROM lt
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(ng.s, 0) + (SELECT prior_fp FROM pv) AS BIGINT) AS score_fp,
         |       (coalesce(ng.s, 0) + (SELECT prior_fp FROM pv)) > 0 AS keep_pred,
         |       CASE WHEN coalesce(ug.n, 0) = 0 THEN 0.0
         |            ELSE CAST(ug.nll AS DOUBLE) / 1000000000.0 / CAST(ug.n AS DOUBLE)
         |       END AS cross_entropy,
         |       gp.gopher_keep,
         |       ((coalesce(ng.s, 0) + (SELECT prior_fp FROM pv)) > 0
         |        AND gp.gopher_keep) AS keep
         |FROM documents d
         |LEFT JOIN ng ON d.doc_id = ng.doc_id
         |LEFT JOIN ug ON d.doc_id = ug.doc_id
         |JOIN gp ON d.doc_id = gp.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "t_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents
        |), g AS (
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
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, mean_token_len, frac_alpha_words, n_stop_hits,
        |       (n_tokens >= 50 AND n_tokens <= 100000
        |        AND mean_token_len >= 3.0 AND mean_token_len <= 10.0
        |        AND frac_alpha_words >= 0.8 AND n_stop_hits >= 2) AS keep
        |FROM g ORDER BY doc_id""".stripMargin
  )
}
