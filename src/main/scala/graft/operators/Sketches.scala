package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based aggregations — the 100 TB path for the statistics the
  * exact operators compute at oracle scale (north-star scope).
  *
  * Exact `percentile` sorts every group's values (a full shuffle of the
  * raw column and per-group sort); exact `count(DISTINCT x)` shuffles
  * every distinct value. At 100 TB both are memory-bound. The sketch
  * forms are single-pass, mergeable, fixed-size state:
  *
  *  - quantiles: Spark's `approx_percentile` (Greenwald-Khanna variant,
  *    `accuracy` controls the 1/accuracy rank-error bound);
  *  - distinct counts: `approx_count_distinct` (HyperLogLog++,
  *    `rsd` relative standard deviation, default 5%).
  *
  * Both are partial-aggregating (map-side combine) — the shuffle carries
  * one sketch per group per partition, independent of row count. The
  * exact twins remain the correctness oracles at test SF
  * (`ev_quantiles`, `c2_distinct_docs`); SketchesSpec pins the error
  * bounds so a library upgrade that degrades a sketch fails the suite. */
object Sketches {

  /** Per-group approximate quantiles, single pass, mergeable state.
    * Output columns are named p50/p90/p99-style from the rounded
    * percentage (p999 for 0.999); names must be distinct. */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probabilities.nonEmpty, "approxQuantiles: probabilities must be non-empty")
    // round with tolerance, not toInt: 0.29*100 is 28.999... in double
    // and would truncate to p28; genuinely fractional percentages
    // (0.999) fall through to the per-mille form (p999)
    def name(p: Double): String = {
      val c = math.round(p * 100)
      if (math.abs(p * 100 - c) < 1e-9) s"p$c" else s"p${math.round(p * 1000)}"
    }
    val names = probabilities.map(name)
    require(names.distinct.size == names.size,
      s"approxQuantiles: probabilities map to colliding column names $names")
    val aggs = probabilities.zip(names).map { case (p, nm) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(nm)
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group HyperLogLog++ distinct counts (rsd = relative standard
    * deviation, e.g. 0.05 = 5%). */
  def approxDistinct(df: DataFrame, groupCol: String, distinctCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"))

  /** Heavy hitters: every value of `itemCol` occurring in more than
    * `support` fraction of rows (Karp/Misra-Gries single-pass sketch
    * via Spark's `stat.freqItems` — mergeable partial summaries, one
    * corpus pass, no value-keyed shuffle). The sketch guarantees NO
    * FALSE NEGATIVES (every true heavy hitter is returned) but may
    * include false positives just under the threshold, so the exact
    * count is re-attached with ONE aggregation restricted to the
    * candidate set (tiny broadcast) and the threshold re-applied —
    * output is then exact: (item, n) for items with n > support·total.
    * This is the "top domains / hottest users" primitive where an
    * exact groupBy-count over all values is the thing being avoided:
    * the only full-cardinality structure ever built is per-partition
    * and size-bounded by 1/support.
    *
    * NULL items are EXCLUDED (filtered before the sketch, so a
    * null-heavy column cannot silently vanish through the semi-join's
    * no-match path instead) — "is null frequent" is a data-quality
    * question `count(when(isnull...))` answers in one pass; the
    * support denominator is the non-null row count accordingly. */
  def heavyHitters(df: DataFrame, itemCol: String,
                   support: Double = 0.01): DataFrame = {
    require(support > 1e-4 && support < 1.0,
      s"support must be in (1e-4, 1), got $support")
    val nonNull = df.filter(col(itemCol).isNotNull)
    val candidates = nonNull.stat.freqItems(Seq(itemCol), support)
      .select(explode(col(s"${itemCol}_freqItems")).as(itemCol))
    val totalDf = nonNull.agg(count(lit(1)).as("__total"))
    nonNull.join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(totalDf))
      .filter(col("n").cast("double") > lit(support) * col("__total").cast("double"))
      .drop("__total")
  }

  /** The combined event-stream profile a monitoring pipeline keeps:
    * count, HLL distinct users, and p50/p90/p99 value quantiles per
    * event type — all one pass, all mergeable. */
  def eventProfile(events: DataFrame, accuracy: Int = 10000,
                   rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(col("user_id"), rsd).as("approx_users"),
      percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("p50"),
      percentile_approx(col("value"), lit(0.9), lit(accuracy)).as("p90"),
      percentile_approx(col("value"), lit(0.99), lit(accuracy)).as("p99"))

  /** Sketch ACCEPTANCE TEST: check an [[eventProfile]] output against
    * exact twins computed from the raw events — the oracle-scale
    * validation a sketch deployment runs before trusting the sketches
    * at full scale. Every bound is integer/rank arithmetic so an
    * independent SQL engine reproduces the booleans bit-for-bit:
    *  - `hll_ok`: |approx − exact| · 4 ≤ exact (±25 %, 5× the default
    *    5 % rsd — a failure means the sketch is broken, not unlucky);
    *  - `pXX_ok`: the sketch quantile lies between the exact values at
    *    ranks `(n·(p−1)) div 100` and `(n·(p+1)) div 100 + 1` (±1
    *    percentile-point rank window — 100× the 1e-4 GK bound; integer
    *    `DIV` keeps both engines' rank cutoffs identical, where a
    *    float `0.49·n` would straddle exact-integer boundaries).
    * Value-at-rank is well-defined under ties (the sorted multiset is
    * deterministic even though row_number's tie order is not).
    * NULL values are excluded from the rank window and from `nn` on
    * BOTH engines: percentile_approx ignores nulls, and Spark's
    * NULLS-FIRST default vs DuckDB's NULLS-LAST would otherwise shift
    * every rank cutoff on a null-bearing column. */
  def profileCheck(events: DataFrame, profile: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val wg = Window.partitionBy(col("event_type"))
    def kLo(p: Int) = greatest(lit(1L), expr(s"(nn * ${p - 1}) DIV 100"))
    def kHi(p: Int) = least(col("nn"), expr(s"(nn * ${p + 1}) DIV 100") + lit(1L))
    val ranked = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nn", count(lit(1)).over(wg))
    def at(k: Column, nm: String) = min(when(col("rn") === k, col("value"))).as(nm)
    val bounds = ranked.groupBy(col("event_type")).agg(
      at(kLo(50), "lo50"), at(kHi(50), "hi50"),
      at(kLo(90), "lo90"), at(kHi(90), "hi90"),
      at(kLo(99), "lo99"), at(kHi(99), "hi99"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    def ok(p: Int) =
      (col(s"p$p") >= col(s"lo$p") && col(s"p$p") <= col(s"hi$p")).as(s"p${p}_ok")
    profile.join(bounds, Seq("event_type")).join(exact, Seq("event_type"))
      .select(col("event_type"), col("n"),
        (abs(col("approx_users") - col("exact_users")) * 4 <= col("exact_users"))
          .as("hll_ok"),
        ok(50), ok(90), ok(99))
  }
}
