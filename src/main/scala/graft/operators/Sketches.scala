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

  /** Per-group approximate quantiles, single pass, mergeable state. */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val aggs = probabilities.zipWithIndex.map { case (p, i) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).toInt}")
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group HyperLogLog++ distinct counts (rsd = relative standard
    * deviation, e.g. 0.05 = 5%). */
  def approxDistinct(df: DataFrame, groupCol: String, distinctCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"))

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
