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
}
