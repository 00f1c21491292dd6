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

  private val Reserved = Seq("__ts", "__side", "__payload", "__slice", "__m", "__carry")

  private def validate(left: DataFrame, right: DataFrame,
                       leftTs: String, rightTs: String,
                       rightSelect: Seq[(String, String)], how: String): Unit = {
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
  }

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
    validate(left, right, leftTs, rightTs, rightSelect, how)
    val outNames = rightSelect.map(_._2)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      // a null right timestamp can never satisfy ts <= T — and left in,
      // it would sort NULLS FIRST and seed every partition with a
      // phantom match
      .filter(col(rightTs).isNotNull)
      // SQL join equality never matches NULL keys (DuckDB ASOF included),
      // but Window.partitionBy groups all-null keys into ONE partition —
      // left in, null-key right rows would silently match null-key left
      // rows. Dropping them right-side-only gives exact SQL semantics in
      // both modes: a null-key left row can then never see a payload, so
      // "inner" drops it and "left" keeps it null-extended.
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
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

  /** floor(a / w), exact for any long
    * ([[graft.functions.IntMath.floorDiv]]). */
  private def sliceOf(a: Column, w: Long): Column =
    graft.functions.IntMath.floorDiv(a, w)

  /** Skew-hardened [[asofBackward]]: identical semantics, but the window
    * partition key is (keys, timeSlice) instead of (keys) — a hot key
    * with millions of rows becomes span/`sliceWidth` parallel tasks
    * instead of one. The price of slicing is the carry-in: a left row in
    * slice S must still see the latest right row from any earlier slice.
    * That is computed join-free on a per-(key, slice) SUMMARY table
    * (one row per populated slice — thousands of rows where the data has
    * millions), with a range-frame window carrying the last summary
    * payload strictly before each left-populated slice; the result is
    * injected into S as a phantom row at the slice start that sorts
    * before everything else (`__side = -1`).
    *
    * Cost: the big (keys, slice) shuffle of |L|+|R| rows — same volume
    * as the base operator — plus two SMALL shuffles over per-slice
    * summary rows. Still no join node anywhere in the plan.
    *
    * Timestamps must be an integral type (the slicing arithmetic is
    * exact integer floor-division; doubles lose precision past 2^53).
    *
    * @param sliceWidth slice span in the timestamp's own unit. Choose so
    *        a hot key's densest slice fits a task comfortably (e.g. one
    *        hour of events); width only affects parallelism, never the
    *        result. */
  def asofBackwardSliced(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTs: String, rightTs: String,
                         rightSelect: Seq[(String, String)],
                         sliceWidth: Long,
                         how: String = "inner"): DataFrame = {
    validate(left, right, leftTs, rightTs, rightSelect, how)
    require(sliceWidth > 0, s"sliceWidth must be positive, got $sliceWidth")
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(left.schema(leftTs).dataType),
      s"asofBackwardSliced needs an integral timestamp, got ${left.schema(leftTs).dataType}")
    val outNames = rightSelect.map(_._2)

    val l = left
      .withColumn("__ts", col(leftTs).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__slice", sliceOf(col("__ts"), sliceWidth))
    val r = right
      .filter(col(rightTs).isNotNull)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).cast("long").as("__ts"), lit(0).as("__side"),
          struct(rightSelect.map { case (c, out) => col(c).as(out) }: _*).as("__payload")): _*)
      .withColumn("__slice", sliceOf(col("__ts"), sliceWidth))

    // one row per populated (keys, slice): the slice's latest right payload
    val summaries = r
      .groupBy((keys :+ "__slice").map(col): _*)
      .agg(max_by(col("__payload"), col("__ts")).as("__payload"))
    // slices that contain left rows and therefore need a carry-in
    val payloadType = summaries.schema("__payload").dataType
    val leftSlices = l
      .select((keys :+ "__slice").map(col): _*).distinct()
      .withColumn("__payload", lit(null).cast(payloadType))
    // carry for slice S = last summary payload from any slice < S
    // (range frame, so empty slices in between are simply absent rows)
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__slice"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val carries = leftSlices.withColumn("__m", lit(1))
      .unionByName(summaries.withColumn("__m", lit(0)))
      .withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(wCarry))
      .filter(col("__m") === 1 && col("__carry").isNotNull)
      .select(
        keys.map(col) ++ Seq(
          (col("__slice") * sliceWidth).as("__ts"), // slice start: sorts first
          lit(-1).as("__side"),
          col("__carry").as("__payload"),
          col("__slice")): _*)

    val w = Window.partitionBy((keys :+ "__slice").map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l
      .unionByName(r, allowMissingColumns = true)
      .unionByName(carries, allowMissingColumns = true)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched =
      if (how == "inner") carried.filter(col("__payload").isNotNull) else carried
    outNames.foldLeft(matched) { (df, out) =>
        df.withColumn(out, col("__payload").getField(out))
      }
      .drop("__ts", "__side", "__payload", "__slice")
  }
}
