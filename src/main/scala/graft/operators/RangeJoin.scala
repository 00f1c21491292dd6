package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketing — the scale-safe form of
  * `p.ts BETWEEN i.start AND i.end` (+ equi-keys). Spark plans the
  * naive inequality join as BroadcastNestedLoop/cartesian-with-filter;
  * at corpus scale that is a near-cross-product. The standard fix:
  *
  *   1. pick a bucket width W (≈ typical interval length);
  *   2. each interval explodes to every W-bucket it overlaps (an
  *      interval of length ≤ W spans ≤ 2 buckets);
  *   3. each point maps to its single bucket;
  *   4. equi-join on (keys, bucket) — a plain shuffled hash join —
  *      then apply the exact BETWEEN predicate.
  *
  * A (point, interval) pair meets in EXACTLY the point's bucket, so no
  * dedup pass is needed. Shuffle volume: |points| + |intervals| ×
  * ceil(len/W + 1) rows on (keys, bucket) — linear, AQE-skew-safe,
  * no broadcast requirement. Bucket arithmetic is exact integer
  * (`a - pmod(a, W)`) — no double rounding, safe for epoch-nanos
  * beyond 2^53.
  */
object RangeJoin {

  /** floor(a / w) * w as exact integer arithmetic on a LongType column
    * (floorDiv semantics for negative values too, unlike `DIV`). */
  private def bucketOf(a: Column, w: Long): Column =
    ((a - pmod(a, lit(w))) / w).cast("long")

  /** Join points to the intervals containing them (inclusive ends).
    *
    * @param rightSelect (intervalCol, outName) pairs carried from the
    *        matched interval; outNames must not clash with point columns.
    * @param bucketWidth W in the timestamp's own unit. Choose ≈ the
    *        typical interval length: too small explodes intervals into
    *        many buckets, too large packs everything into few buckets
    *        (degrades toward the cross join). */
  def pointInRange(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   ptCol: String, startCol: String, endCol: String,
                   bucketWidth: Long,
                   rightSelect: Seq[(String, String)]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val outNames = rightSelect.map(_._2)
    require(outNames.distinct.size == outNames.size,
      s"pointInRange: duplicate output names $outNames")
    val clash = outNames.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty, s"pointInRange: output names clash with point columns: $clash")

    val p = points.withColumn("__bucket", bucketOf(col(ptCol), bucketWidth))
    val i = intervals
      .filter(col(endCol) >= col(startCol)) // empty intervals match nothing
      .select(
        keys.map(col) ++
          Seq(col(startCol).as("__start"), col(endCol).as("__end")) ++
          rightSelect.map { case (c, out) => col(c).as(out) }: _*)
      .withColumn("__bucket",
        explode(sequence(bucketOf(col("__start"), bucketWidth),
          bucketOf(col("__end"), bucketWidth))))
    p.join(i, keys :+ "__bucket")
      .filter(col(ptCol) >= col("__start") && col(ptCol) <= col("__end"))
      .drop("__bucket", "__start", "__end")
  }
}
