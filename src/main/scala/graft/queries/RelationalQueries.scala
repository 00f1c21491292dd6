package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Refresh

/** Relational-analytics coverage over the TPC-H-ish fixtures + the
  * incremental-refresh ops, oracle-checked. Money sums use exact
  * integer cents (see EventQueries parity note).
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // join + aggregate: revenue by month and return flag — the canonical
    // broadcast-dim/fact shape (orders is the bigger side at this SF;
    // the join key shuffle is the one unavoidable exchange)
    "rel_revenue_monthly" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .withColumn("rev_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("month"), col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), sum(col("rev_cents")).as("revenue_cents"))
        .orderBy(col("month"), col("l_returnflag"))
    },
    // histogram: order totals bucketed to integer bins
    "rel_price_histogram" -> { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("bucket", floor(col("o_totalprice") / 10000).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("bucket"))
    },
    // upsert-by-key merge: docs >= 450 arrive as a corrected batch
    "rel_upsert" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("lang"))
      val incoming = docs.filter(col("doc_id") >= 450)
        .withColumn("source", concat(lit("v2_"), col("source")))
      Refresh.upsertByKey(docs, incoming, "doc_id")
        .orderBy(col("doc_id"))
    },
    // keep-latest dedup by version
    "rel_latest_by_key" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val versioned = docs.withColumn("version", lit(1))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .withColumn("source", concat(lit("new_"), col("source")))
          .withColumn("version", lit(2)))
      Refresh.latestByKey(versioned, "doc_id", "version")
        .orderBy(col("doc_id"))
    },
    // stratified sample over Spark's Bernoulli sampler. The exact row
    // set is PERMANENTLY un-replayable by another engine (adjudicated
    // r12: the XORShift stream is the product and only Spark draws
    // it), but the row set is still independently VERIFIABLE — the
    // ev_sketch_profile pattern: Spark publishes the sampled ids, and
    // BOTH engines re-derive from raw `documents` the per-stratum
    // population counts and check (1) membership ⊆ population with the
    // declared strata, (2) id-distinctness (Bernoulli never
    // duplicates), (3) the sampled count inside an exact-integer
    // 6-sigma binomial envelope: with p = 1/2 the test is
    // (2k − n)² ≤ 36n — mean n/2, std √n/2, so |k − n/2| ≤ 3√n = 6σ
    // (false-alarm ~2e-9 per stratum; a broken rate like p=0.25 trips
    // it for any stratum over ~150 rows). Pure int64 on both sides —
    // (2k − n)² ≤ n² stays in range for n < 3e9, far past any fixture
    // SF. The exact-twin (row-identical) contract lives in
    // rel_stratified_det; same-seed reproducibility and tighter rate
    // bounds stay scalatest-gated. Bench mode times the SAMPLER (the
    // production operator), not the gate instrumentation — the bound
    // check is exactly the oracle's workload (the ev_sketch rule).
    "rel_stratified_sample" -> { (s, dir) =>
      val strata = Seq("en", "de", "es", "fr", "zh")
      val sample = Refresh.stratifiedSample(Tables.documents(s, dir), "lang",
          strata.map(_ -> 0.5).toMap, seed = 42L)
        .select(col("doc_id"), col("lang"))
      if (Handoff.benchMode) sample.orderBy(col("doc_id"))
      else {
        val published = Handoff.publish(sample, StratSampleHandoff)
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        val pop = docs.filter(col("lang").isin(strata: _*))
          .groupBy(col("lang")).agg(count(lit(1)).as("n_pop"))
        val samp = published.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_samp"),
            countDistinct(col("doc_id")).as("n_distinct"))
        val alien = published.join(docs, Seq("doc_id", "lang"), "left_anti")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_alien"))
        pop.join(samp, Seq("lang"), "left_outer")
          .join(alien, Seq("lang"), "left_outer")
          .select(col("lang"), col("n_pop"),
            coalesce(col("n_samp"), lit(0L)).as("n_sampled"),
            (coalesce(col("n_alien"), lit(0L)) === 0L).as("subset_ok"),
            (coalesce(col("n_samp"), lit(0L)) ===
              coalesce(col("n_distinct"), lit(0L))).as("distinct_ok"),
            ((lit(2L) * coalesce(col("n_samp"), lit(0L)) - col("n_pop")) *
              (lit(2L) * coalesce(col("n_samp"), lit(0L)) - col("n_pop")) <=
              lit(36L) * col("n_pop")).as("bound_ok"))
          .orderBy(col("lang"))
      }
    },
    // engine-portable deterministic stratified sample: md5-threshold
    // survival (no RNG stream), so the DuckDB oracle reproduces the
    // EXACT row set — the reproducibility contract the RNG variant
    // above cannot give (that one stays rows-only by nature)
    "rel_stratified_det" -> { (s, dir) =>
      Refresh.stratifiedSampleDet(Tables.documents(s, dir), "lang",
          Map("en" -> 0.5, "de" -> 0.25, "fr" -> 1.0), "doc_id", salt = "r5")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    // deterministic train/val/test split: 80/10/10 by key hash with
    // EXACT integer thresholds on the 52-bit md5 prefix — stable
    // across corpus versions (membership depends only on the key), no
    // RNG, no float boundary, zero shuffle
    "rel_hash_split" -> { (s, dir) =>
      Refresh.hashSplit(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "r9")
        .orderBy(col("doc_id"))
    },
    // temperature-based domain mixing (share ∝ n_lang^0.5): md5-ranked,
    // RNG-free, so the DuckDB oracle reproduces the exact row set —
    // sqrt is IEEE-correctly-rounded in both engines
    "rel_domain_mix" -> { (s, dir) =>
      Refresh.temperatureMix(Tables.documents(s, dir), "lang", "doc_id",
          targetRows = 200, alpha = 0.5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    // token-budget corpus assembly: per-language greedy prefix in md5
    // draw order until ~5000 tokens — the token-denominated complement
    // to rel_domain_mix's row shares; exact row-set parity
    "rel_token_budget" -> { (s, dir) =>
      Refresh.tokenBudgetMix(
          Tables.documents(s, dir).select(col("doc_id"), col("lang"),
            size(array_remove(split(col("text"), " "), ""))
              .cast("long").as("n_tok")),
          "lang", "doc_id", "n_tok", budgetTokens = 5000L)
        .orderBy(col("doc_id"))
    },
    // pre-promotion data-quality gate: per-column null/blank counts in
    // ONE corpus pass (conditional sums in a single agg, no per-column
    // jobs)
    "corpus_health" -> { (s, dir) =>
      graft.operators.Maintenance.corpusHealth(Tables.documents(s, dir))
        .orderBy(col("column"))
    },
    // corpus snapshot diff: deterministic v2 mutation (drop %31, edit
    // %7, add %13 under shifted ids) audited by fingerprint — the join
    // ships (id, md5) only, never payloads
    "corpus_diff" -> { (s, dir) =>
      val (o, n) = diffFixture(s, dir)
      graft.operators.Maintenance.corpusDiff(o, n, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    "corpus_diff_stats" -> { (s, dir) =>
      val (o, n) = diffFixture(s, dir)
      graft.operators.Maintenance.corpusDiffStats(o, n, "doc_id", "text")
        .orderBy(col("status"))
    }
  )

  /** Old/new snapshot pair for the diff queries, derived
    * deterministically from the documents fixture. */
  private def diffFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, dir)
    val oldDocs = docs.select(col("doc_id"), col("text"))
    val newDocs = docs.where(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    (oldDocs, newDocs)
  }

  private val diffCte =
    """WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents),
      |n AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS new_fp
      |  FROM documents WHERE doc_id % 31 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, md5(text) AS new_fp
      |  FROM documents WHERE doc_id % 13 = 0
      |), d AS (
      |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |         CASE WHEN o.doc_id IS NULL THEN 'added'
      |              WHEN n.doc_id IS NULL THEN 'removed'
      |              WHEN o.old_fp <> n.new_fp THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |)""".stripMargin

  /** The rel_stratified_sample Spark↔oracle handoff: the sampled
    * (doc_id, lang) rows, written by the Spark gate, bound-checked by
    * both engines against raw `documents`. */
  private val StratSampleHandoff = Handoff.path("strat_sample")

  val oracle: Map[String, String] = Map(
    // statistical-bound oracle over the published sample (the
    // ev_sketch_profile pattern): DuckDB re-derives per-stratum
    // population counts from raw documents and checks membership,
    // distinctness, and the exact-integer 6-sigma binomial envelope
    // (2k − n)² ≤ 36n — the RNG stream itself stays unreplayed; a
    // broken sampler flips a boolean on both sides of the compare
    "rel_stratified_sample" ->
      s"""WITH s AS (SELECT * FROM read_parquet('$StratSampleHandoff/*.parquet')),
         |pop AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_pop FROM documents
         |  WHERE lang IN ('en', 'de', 'es', 'fr', 'zh') GROUP BY 1
         |),
         |samp AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_samp,
         |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct
         |  FROM s GROUP BY 1
         |),
         |alien AS (
         |  SELECT s.lang, CAST(count(*) AS BIGINT) AS n_alien
         |  FROM s LEFT JOIN documents d
         |    ON d.doc_id = s.doc_id AND d.lang = s.lang
         |  WHERE d.doc_id IS NULL GROUP BY s.lang
         |)
         |SELECT p.lang, p.n_pop,
         |       coalesce(m.n_samp, 0) AS n_sampled,
         |       coalesce(a.n_alien, 0) = 0 AS subset_ok,
         |       coalesce(m.n_samp, 0) = coalesce(m.n_distinct, 0) AS distinct_ok,
         |       (2 * coalesce(m.n_samp, 0) - p.n_pop)
         |         * (2 * coalesce(m.n_samp, 0) - p.n_pop) <= 36 * p.n_pop AS bound_ok
         |FROM pop p
         |LEFT JOIN samp m USING (lang)
         |LEFT JOIN alien a USING (lang)
         |ORDER BY p.lang""".stripMargin,
    // md5-threshold survival: top 52 md5 bits of 'doc_id:salt' as an
    // exact int64, kept iff < floor(fraction * 2^52) (same hex→integer
    // trick as shard_assign; thresholds are precomputed literals)
    "rel_stratified_det" ->
      """WITH u AS (
        |  SELECT doc_id, lang,
        |         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r5'), 1, 13) AS UBIGINT) AS BIGINT) AS u52
        |  FROM documents
        |)
        |SELECT doc_id, lang FROM u
        |WHERE (lang = 'en' AND u52 < 2251799813685248)
        |   OR (lang = 'de' AND u52 < 1125899906842624)
        |   OR (lang = 'fr' AND u52 < 4503599627370496)
        |ORDER BY doc_id""".stripMargin,
    // the same 52-bit hash parse as rel_stratified_det; thresholds are
    // the operator's OWN integers (hashSplitBounds), interpolated — the
    // oracle never re-derives a float boundary
    "rel_hash_split" -> {
      val b = Refresh.hashSplitBounds(Seq("train" -> 80, "val" -> 10, "test" -> 10))
      s"""WITH u AS (
         |  SELECT doc_id, lang,
         |         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|r9'), 1, 13)
         |              AS UBIGINT) AS BIGINT) AS h52
         |  FROM documents
         |)
         |SELECT doc_id, lang,
         |       CASE WHEN h52 IS NULL THEN NULL
         |            WHEN h52 < ${b(0)} THEN 'train'
         |            WHEN h52 < ${b(1)} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM u ORDER BY doc_id""".stripMargin
    },
    "corpus_diff" ->
      s"""$diffCte
         |SELECT doc_id, status FROM d ORDER BY doc_id""".stripMargin,
    "corpus_diff_stats" ->
      s"""$diffCte
         |SELECT status, CAST(count(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY status ORDER BY status""".stripMargin,
    "rel_revenue_monthly" ->
      """SELECT strftime(o.o_orderdate, '%Y-%m') AS month, l.l_returnflag,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY month, l_returnflag""".stripMargin,
    "rel_price_histogram" ->
      """SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
        |       count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "rel_upsert" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id >= 450 THEN 'v2_' || source ELSE source END AS source,
        |       lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "rel_latest_by_key" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 5 = 0 THEN 'new_' || source ELSE source END AS source,
        |       CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS version
        |FROM documents ORDER BY doc_id""".stripMargin,
    "rel_domain_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_d FROM documents GROUP BY lang
        |), w AS (
        |  SELECT lang, sqrt(CAST(n_d AS DOUBLE)) AS w FROM c
        |), s AS (
        |  SELECT sum(w) AS wsum FROM w
        |), r AS (
        |  SELECT d.doc_id, d.lang, w.w, s.wsum,
        |         row_number() OVER (PARTITION BY d.lang
        |           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
        |  FROM documents d JOIN w ON d.lang = w.lang CROSS JOIN s
        |)
        |SELECT doc_id, lang FROM r
        |WHERE rk <= ceil(200 * w / wsum)
        |ORDER BY doc_id""".stripMargin,
    "corpus_health" -> {
      // coalesce(sum, 0): the Scala side reports 0 counts for an empty
      // corpus (Row.getAs unboxes the null sum), so the oracle must too
      def strCol(name: String) =
        s"""SELECT '$name' AS "column", 'string' AS dtype,
           |       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
           |       CAST(coalesce(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
           |       CAST(coalesce(sum(CASE WHEN trim($name) = '' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_blank
           |FROM documents""".stripMargin
      def numCol(name: String) =
        s"""SELECT '$name' AS "column", 'bigint' AS dtype,
           |       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
           |       CAST(coalesce(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
           |       CAST(NULL AS BIGINT) AS n_blank
           |FROM documents""".stripMargin
      Seq(numCol("doc_id"), strCol("text"), strCol("lang"),
        strCol("source"), numCol("n_chars"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "rel_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
        |         md5(CAST(doc_id AS VARCHAR) || '|') AS draw
        |  FROM documents WHERE lang IS NOT NULL
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang ORDER BY draw, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tok FROM c
        |WHERE cum - n_tok < 5000
        |ORDER BY doc_id""".stripMargin
  )
}
