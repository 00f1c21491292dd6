package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-attribution primitive a
  * training-data pipeline needs (label each event with the most recent
  * state at or before its timestamp). Spark has no native ASOF JOIN;
  * a naive range join (`l.ts >= r.ts` + keep-latest) is a near-cross
  * product. This operator uses the union+window construction instead:
  *
  *   1. union both sides — right rows carry their payload as ONE
  *      struct column (so a match is all-or-nothing: null payload
  *      FIELDS in the matched row come through as nulls, never as
  *      stale values torn from older rows), left rows carry null there;
  *   2. one window over (keys) ordered by (ts, side) with right rows
  *      sorting BEFORE left rows at equal ts (inclusive `>=` match);
  *   3. `last(payloadStruct, ignoreNulls)` propagates the latest right
  *      row forward; keep only left rows, unpack the struct.
  *
  * Cost: ONE shuffle of |left|+|right| rows on the keys, then a linear
  * per-partition sort-scan — the same asymptotics as a co-partitioned
  * merge as-of, and it survives 100 TB where the range-join
  * formulation explodes. Matches DuckDB's `ASOF JOIN ... ON l.k = r.k
  * AND l.ts >= r.ts` exactly (the gate oracle): right rows with a null
  * timestamp are dropped (a null compare can never match), and the
  * caller contract is the same — right (keys, ts) pairs should be
  * unique; among exact duplicates the kept row is order-dependent in
  * both engines.
  */
object AsofJoin {

  private val Reserved = Seq("__ts", "__side", "__payload")

  /** Backward-inclusive as-of join.
    *
    * @param rightSelect (rightCol, outName) pairs to carry from the
    *        matched right row; outNames must not clash with left
    *        columns. Map the right ts col here to expose the match time.
    * @param how "inner" (drop unmatched left rows) or "left" (keep
    *        them with null payload). */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightSelect: Seq[(String, String)],
                   how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left", s"how must be inner|left, got $how")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"as-of timestamp types differ: ${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType}")
    val outNames = rightSelect.map(_._2)
    require(outNames.distinct.size == outNames.size,
      s"asofBackward: duplicate output names $outNames")
    val clash = outNames.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofBackward: output names clash with left columns: $clash")
    val reservedHit = Reserved.toSet
      .intersect(left.columns.toSet ++ right.columns.toSet ++ outNames)
    require(reservedHit.isEmpty,
      s"asofBackward: inputs use reserved column names $reservedHit")

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      // a null right timestamp can never satisfy ts <= T — and left in,
      // it would sort NULLS FIRST and seed every partition with a
      // phantom match
      .filter(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(rightSelect.map { case (c, out) => col(c).as(out) }: _*).as("__payload")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // a left row at ts T matches right rows with ts <= T (inclusive)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched =
      if (how == "inner") carried.filter(col("__payload").isNotNull) else carried
    outNames.foldLeft(matched) { (df, out) =>
        df.withColumn(out, col("__payload").getField(out))
      }
      .drop("__ts", "__side", "__payload")
  }
}
