package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking at scale (north-star scope: "keep the top X%
  * by quality" is the selection step of every curation pipeline, and
  * the naive `row_number() OVER (ORDER BY ...)` is the classic scale
  * trap — Spark plans it as a SINGLE-partition window, so the whole
  * corpus funnels through one task).
  *
  * Construction: range-exchange on the order columns (each partition
  * owns a contiguous key range), per-partition sort, then global rank =
  * partition offset + local position. The offsets come from one cheap
  * counting job over the shuffled partitions — this is `zipWithIndex`'s
  * count-then-emit contract, and the one genuinely imperative step
  * (a running counter per partition), which is exactly the RDD seam's
  * sanctioned use. Cost: one range shuffle + two result-stage passes
  * over it (count, emit) — the shuffle files are reused across the two
  * jobs, nothing re-shuffles, and no task ever sees more than its own
  * partition.
  *
  * Determinism contract: `orderCols` must be a TOTAL order (add a
  * unique tie-break column, e.g. the doc id) — with ties, the two
  * passes could disagree on within-tie positions and rank stability
  * across runs would be partitioning luck, the same caveat
  * `latestByKey` documents. */
object Ranking {

  /** The distributed stage whose plan carries the scale contract:
    * range exchange + in-partition sort (package-visible so the spec
    * can assert the plan — the public result is an RDD-backed frame
    * whose SQL plan is an opaque `Scan ExistingRDD`). */
  private[graft] def ranged(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)

  /** Attach `rankCol` = 1-based global rank under `orderCols`. */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
                 rankCol: String = "global_rank"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val ranged = this.ranged(df, orderCols)
    val schema = ranged.schema.add(rankCol, LongType, nullable = false)
    val rdd = ranged.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** ANSI `ntile(n)` over the WHOLE corpus without the global-window
    * trap — quality deciles for curriculum ordering / decile-based
    * filtering. `ntile(n) OVER (ORDER BY …)` plans as a
    * single-partition window exactly like global row_number; here the
    * bucket derives from [[globalRank]] with pure integer math.
    *
    * ANSI sizing is remainder-to-LEADING-buckets: with q = total DIV n
    * and r = total MOD n, the first r buckets hold q+1 rows and the
    * rest hold q. The one-liner `(rank−1)·n DIV total + 1` is NOT that
    * distribution — it interleaves the big buckets evenly (total=10,
    * n=4 gives 3,2,3,2 where ANSI gives 3,3,2,2) — so the bucket is
    * computed piecewise exactly as the standard defines it (the
    * DuckDB-ntile oracle pins the parity on a fixture whose count is
    * NOT divisible by n). Same determinism contract as globalRank:
    * `orderCols` must be a total order. */
  def ntileBuckets(df: DataFrame, orderCols: Seq[Column], n: Int,
                   bucketCol: String = "bucket"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ranked = globalRank(df, orderCols, "__rank")
    val totalDf = ranked.agg(coalesce(max(col("__rank")), lit(0L)).as("__total"))
    ranked.crossJoin(broadcast(totalDf))
      .withColumn(bucketCol, ansiNtile(col("__rank"), col("__total"), n))
      .drop("__rank", "__total")
  }

  /** Top `k` rows per group — "best 5 docs per language", the
    * group-wise selection step of quality curation. A per-group window
    * IS the scale-correct plan here (unlike the global-rank case): the
    * window partitions by the group keys, and Catalyst's
    * WindowGroupLimit rewrite makes each map task keep only its local
    * top-k per group BEFORE the shuffle, so the exchange carries
    * O(k · groups · tasks) rows, not the corpus. `orderCols` should be
    * a total order within a group (tie-break on a unique id) or the
    * kept set at the k-boundary is partitioning luck. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
                   k: Int, rankCol: String = "group_rank"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    // long for parity with globalRank (and ANSI engines' BIGINT row_number)
    df.withColumn(rankCol, row_number().over(
        Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Keep the top `percent`% rows under `orderCols` (at least one row
    * for a non-empty input): rank ≤ max(1, n·percent DIV 100) — pure
    * integer math so any engine draws the same boundary. The count is
    * a 1-row broadcast, not a driver constant baked into the plan —
    * and it is derived from the RANKED output (n = max rank), not
    * from a second scan of `df`: the source is evaluated exactly once
    * into the range shuffle, the count pass reuses those shuffle
    * files, and rank and count can never disagree. */
  /** Keep the top `percent`% rows of EACH group under `orderCols` (at
    * least one row per non-empty group) — the per-language/per-domain
    * curation selector ("best 60% of every language", where a global
    * [[topFraction]] would let a high-scoring language crowd the rest
    * out entirely). Unlike the global fraction (range exchange), the
    * per-group form is window-friendly and scale-correct as a plain
    * window WHEN groups are numerous relative to tasks (domains,
    * shards, users): rank and group-count partition by the group
    * keys — ONE shuffle by group, no single-partition window
    * anywhere. For a FEW FAT groups (5 languages over 100 TB — each
    * whole group lands in one task), rank with [[groupRank]] instead
    * and draw the same boundary from its per-group totals. Same
    * integer boundary as [[topFraction]]: rank ≤ max(1,
    * n·percent DIV 100), engine-exact. `orderCols` must totally order
    * within a group (tie-break on a unique id). */
  def topFractionPerGroup(df: DataFrame, groupCols: Seq[Column],
                          orderCols: Seq[Column], percent: Int,
                          rankCol: String = "group_rank"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(percent >= 1 && percent <= 100,
      s"percent must be in [1,100], got $percent")
    // both window functions share the partitioning → one Exchange
    df.withColumn(rankCol, row_number().over(
        Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(groupCols: _*)))
      .filter(col(rankCol) <=
        greatest(lit(1L), expr(s"(__n * $percent) DIV 100")))
      .drop("__n")
  }

  /** 1-based rank WITHIN each group under `orderCols`, without the
    * low-cardinality-group window trap: `row_number() OVER (PARTITION
    * BY grp …)` materializes each whole group in ONE task — with 5
    * languages over 100 TB that funnels ~20 TB through one executor.
    * (For NUMEROUS small groups the plain window is the better plan —
    * [[topKPerGroup]]/[[topFractionPerGroup]] document that regime;
    * this operator is the few-fat-groups complement.)
    * Here the plan is the grouped [[globalRank]]: range-exchange on
    * (groupCols ++ orderCols) — each group spans a contiguous RUN of
    * partitions, no partition holds more than its range — then one
    * cheap pass over the shuffled files collects per-(partition,
    * group-run) counts (≤ #partitions + #groups rows, the
    * driver-state bound), prefix-sums them into per-partition group
    * offsets, and a second pass emits offset + local position. Both
    * passes reuse the same shuffle files (the zipWithIndex contract).
    *
    * Group values must have well-defined equality (strings/numerics —
    * not arrays/binary/NaN), and `orderCols` must totally order
    * within a group (tie-break on a unique id) — the [[globalRank]]
    * determinism contract, per group. */
  def groupRank(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
                rankCol: String = "group_rank"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val gkIdx = df.schema.size // __gk appended after the user columns
    val ranged = this.ranged(df.withColumn("__gk", struct(groupCols: _*)),
      col("__gk") +: orderCols)
    val rdd = ranged.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: ordered (group, count) runs per partition — rows are
    // sorted by __gk within each partition, so every group is one run
    val runs: Array[(Int, Array[(Any, Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[(Any, Long)]
        var cur: Any = null; var n = 0L; var any = false
        it.foreach { row =>
          val k = row.get(gkIdx)
          if (!any || k != cur) {
            if (any) acc += ((cur, n))
            cur = k; n = 1L; any = true
          } else n += 1L
        }
        if (any) acc += ((cur, n))
        Iterator.single((pid, acc.toArray))
      }.collect()
    // prefix-sum across partitions (pid order == range order): the
    // offset of group g in partition p = rows of g in partitions < p
    val offsets = Array.fill(runs.length)(
      scala.collection.mutable.HashMap.empty[Any, Long])
    val running = scala.collection.mutable.HashMap.empty[Any, Long]
    runs.sortBy(_._1).foreach { case (pid, rs) =>
      rs.foreach { case (k, n) =>
        offsets(pid).update(k, running.getOrElse(k, 0L))
        running.update(k, running.getOrElse(k, 0L) + n)
      }
    }
    val offB = spark.sparkContext.broadcast(offsets.map(_.toMap))
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(rankCol, LongType, nullable = false))
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = offB.value(pid)
      var cur: Any = null; var pos = 0L; var any = false
      it.map { row =>
        val k = row.get(gkIdx)
        if (!any || k != cur) { cur = k; pos = off(k); any = true }
        pos += 1L
        Row.fromSeq(row.toSeq.take(gkIdx) :+ pos)
      }
    }
    val out = spark.createDataFrame(ranked, outSchema)
    rdd.unpersist(blocking = false)
    out
  }

  /** ANSI `ntile(n)` WITHIN each group — per-language quality
    * terciles (the CCNet head/middle/tail split is per language), on
    * [[groupRank]]'s scale-correct plan instead of a grouped window.
    * Bucket math is the same remainder-to-leading-buckets piecewise
    * form as [[ntileBuckets]], fed per-group totals (≤ one row per
    * group, broadcast). Same determinism contract as [[groupRank]]. */
  def ntilePerGroup(df: DataFrame, groupCols: Seq[Column],
                    orderCols: Seq[Column], n: Int,
                    bucketCol: String = "bucket"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ranked = groupRank(df, groupCols, orderCols, "__rank")
      .withColumn("__gk", struct(groupCols: _*))
    val totals = ranked.groupBy(col("__gk"))
      .agg(max(col("__rank")).as("__total"))
    ranked.join(broadcast(totals), Seq("__gk"))
      .withColumn(bucketCol, ansiNtile(col("__rank"), col("__total"), n))
      .drop("__gk", "__rank", "__total")
  }

  /** The ANSI ntile bucket of `rank` among `total` rows — remainder
    * to the LEADING buckets (see [[ntileBuckets]]'s scaladoc for why
    * the interleaving one-liner is wrong). */
  private def ansiNtile(rank: Column, total: Column, n: Int): Column = {
    import graft.functions.IntMath.integralDivide
    val q = integralDivide(total, lit(n.toLong))
    val r = total - q * n
    val bigSpan = r * (q + 1)
    when(rank <= bigSpan, integralDivide(rank - 1, q + 1) + 1)
      .otherwise(r + integralDivide(rank - bigSpan - 1,
        greatest(q, lit(1L))) + 1)
  }

  def topFraction(df: DataFrame, orderCols: Seq[Column], percent: Int,
                  rankCol: String = "global_rank"): DataFrame = {
    require(percent >= 1 && percent <= 100,
      s"percent must be in [1,100], got $percent")
    val ranked = globalRank(df, orderCols, rankCol)
    val nDf = ranked.agg(coalesce(max(col(rankCol)), lit(0L)).as("__n"))
    ranked
      .crossJoin(broadcast(nDf))
      .filter(col(rankCol) <=
        greatest(lit(1L), expr(s"(__n * $percent) DIV 100")))
      .drop("__n")
  }
}
