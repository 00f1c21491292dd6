package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Global-rank semantics (== single-partition row_number on small
  * data), partitioning independence, and the no-single-partition-
  * window plan contract. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = spark.range(0, 1000)
    .select(col("id"),
      // deliberately collision-heavy sort key to exercise tie-breaks
      (col("id") * 37 % 101).as("score"))

  test("globalRank == row_number over the same total order") {
    val expected = fixture.orderBy(col("score").desc, col("id"))
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val got = Ranking.globalRank(fixture, Seq(col("score").desc, col("id").asc))
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("globalRank is partitioning-independent and deterministic across runs") {
    val base = Ranking.globalRank(fixture, Seq(col("score").desc, col("id").asc))
      .select("id", "global_rank").as[(Long, Long)].collect().toSet
    for (p <- Seq(1, 7, 64)) {
      val other = Ranking.globalRank(fixture.repartition(p),
          Seq(col("score").desc, col("id").asc))
        .select("id", "global_rank").as[(Long, Long)].collect().toSet
      assert(other === base, s"ranks changed under repartition($p)")
    }
  }

  test("globalRank plan: range exchange, never a single-partition sort") {
    // the public result is RDD-backed (opaque ExistingRDD scan); the
    // scale contract lives in the ranged stage it executes
    val plan = Ranking.ranged(fixture, Seq(col("score").desc, col("id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global rank must not funnel into one partition:\n$plan")
  }

  test("topFraction keeps exactly max(1, n*percent DIV 100) rows, the top ones") {
    val out = Ranking.topFraction(fixture,
        Seq(col("score").desc, col("id").asc), percent = 20)
      .as[(Long, Long, Long)].collect()
    assert(out.length === 200)
    assert(out.map(_._3).max === 200L)
    // every kept score must be >= every dropped score
    val keptMin = out.map(_._2).min
    val all = fixture.as[(Long, Long)].collect()
    val dropped = all.filterNot(r => out.exists(_._1 == r._1))
    assert(dropped.forall(_._2 <= keptMin))
    // tiny input: at least one row survives
    val one = Ranking.topFraction(fixture.limit(3),
      Seq(col("score").desc, col("id").asc), percent = 1)
    assert(one.count() === 1L)
  }

  test("topFractionPerGroup: exact per-group boundary, min-1 row, one-Exchange plan") {
    // 3 uneven groups: g0 = 334 ids, g1 = 333, g2 = 333
    val grouped = fixture.withColumn("g", col("id") % 3)
    val out = Ranking.topFractionPerGroup(grouped, Seq(col("g")),
        Seq(col("score").desc, col("id").asc), percent = 20)
      .select("id", "score", "g", "group_rank")
      .as[(Long, Long, Long, Long)].collect()
    val byG = out.groupBy(_._3)
    val sizes = Map(0L -> 334L, 1L -> 333L, 2L -> 333L)
    sizes.foreach { case (g, n) =>
      val kept = byG(g)
      assert(kept.length.toLong === math.max(1L, n * 20 / 100), s"group $g")
      assert(kept.map(_._4).max === kept.length.toLong, s"dense ranks, group $g")
      // per-group dominance: every kept score >= every dropped score IN g
      val keptIds = kept.map(_._1).toSet
      val droppedMax = grouped.filter(col("g") === g)
        .as[(Long, Long, Long)].collect()
        .filterNot(r => keptIds(r._1)).map(_._2).max
      assert(kept.map(_._2).min >= droppedMax, s"dominance, group $g")
    }
    // a 2-row group under percent=1 still keeps its best row
    val tiny = Ranking.topFractionPerGroup(
      Seq((1L, 10L, "x"), (2L, 20L, "x")).toDF("id", "score", "g"),
      Seq(col("g")), Seq(col("score").desc, col("id").asc), percent = 1)
      .as[(Long, Long, String, Long)].collect()
    assert(tiny.map(t => (t._1, t._4)).toSeq === Seq((2L, 1L)))
    // plan: rank and count share ONE hash exchange by the group keys,
    // and nothing funnels into a single partition
    val plan = Ranking.topFractionPerGroup(grouped, Seq(col("g")),
        Seq(col("score").desc, col("id").asc), percent = 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"per-group fraction must not use a global window:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan).length >= 1 &&
      plan.split("Exchange").length - 1 <= 2,
      s"expected the group-key exchange (not one per window):\n$plan")
  }

  test("topKPerGroup keeps exactly the k best rows per group, dense 1..k ranks") {
    val grouped = fixture.withColumn("grp", (col("id") % 5).cast("long"))
    val got = Ranking.topKPerGroup(grouped, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc), k = 3)
      .select("grp", "id", "score", "group_rank")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === 15) // 5 groups x 3
    val byGrp = got.groupBy(_._1)
    for ((g, rows) <- byGrp) {
      assert(rows.map(_._4).sorted === Array(1L, 2L, 3L), s"ranks not dense in group $g")
      // every kept row beats every dropped row of its group under the order
      val keptWorst = rows.map(r => (r._3, -r._2)).min // (score desc, id asc)
      val all = grouped.filter(col("grp") === g).select("id", "score")
        .as[(Long, Long)].collect()
      val droppedBest = all.filterNot(a => rows.exists(_._2 == a._1))
        .map(a => (a._2, -a._1)).maxOption
      droppedBest.foreach(d => assert(d._1 < keptWorst._1 ||
        (d._1 == keptWorst._1 && d._2 < keptWorst._2),
        s"group $g kept a worse row than it dropped: kept-worst $keptWorst, dropped-best $d"))
    }
  }

  test("topKPerGroup plan: WindowGroupLimit prunes before the shuffle") {
    val grouped = fixture.withColumn("grp", (col("id") % 5).cast("long"))
    val plan = Ranking.topKPerGroup(grouped, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected Catalyst's WindowGroupLimit rewrite (map-side top-k per group):\n$plan")
    intercept[IllegalArgumentException](
      Ranking.topKPerGroup(grouped, Seq(col("grp")), Seq(col("id")), 0))
    intercept[IllegalArgumentException](
      Ranking.topKPerGroup(grouped, Nil, Seq(col("id")), 1))
  }

  test("ntileBuckets == ANSI ntile sizing (remainder to leading buckets)") {
    def ansiReplay(total: Int, n: Int, order: Array[Long]): Map[Long, Long] = {
      val (q, r) = (total / n, total % n)
      order.zipWithIndex.map { case (id, i) =>
        // first r buckets have q+1 rows — the interleaved-remainder
        // formula this operator once used diverges whenever
        // total mod n is in [2, n-2], so test exactly there
        val bucket = if (i < r * (q + 1)) i / (q + 1) + 1
                     else (i - r * (q + 1)) / q + r + 1
        id -> bucket.toLong
      }.toMap
    }
    val order = fixture.as[(Long, Long)].collect()
      .sortBy(r => (-r._2, r._1)).map(_._1)
    // 1000 mod 6 = 4 ∈ [2, n-2]: sizes 167 x4 then 166 x2
    for (n <- Seq(6, 7, 4)) {
      val got = Ranking.ntileBuckets(fixture,
          Seq(col("score").desc, col("id").asc), n = n)
        .select("id", "bucket").as[(Long, Long)].collect()
      assert(got.toMap === ansiReplay(1000, n, order), s"n=$n")
      assert(got.map(_._2).toSet === (1L to n).toSet)
    }
    // the exact counterexample to the interleaved formula: 10 rows, n=4
    // must size 3,3,2,2 (rank 6 -> bucket 2, not 3)
    val ten = fixture.limit(10)
    val tenOrder = ten.as[(Long, Long)].collect().sortBy(r => (-r._2, r._1)).map(_._1)
    val tenGot = Ranking.ntileBuckets(ten, Seq(col("score").desc, col("id").asc), 4)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(tenGot === ansiReplay(10, 4, tenOrder))
    assert(tenGot(tenOrder(5)) === 2L, "rank 6 of 10 with n=4 is ANSI bucket 2")
    // n > total: one row per leading bucket
    val three = Ranking.ntileBuckets(ten.limit(3), Seq(col("id").asc), 8)
      .select("bucket").as[Long].collect().sorted
    assert(three === Array(1L, 2L, 3L))
    // partitioning independence
    val again = Ranking.ntileBuckets(fixture.repartition(13),
        Seq(col("score").desc, col("id").asc), n = 6)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(again === ansiReplay(1000, 6, order))
    intercept[IllegalArgumentException](
      Ranking.ntileBuckets(fixture, Seq(col("id")), 0))
  }

  test("groupRank == per-group row_number; groups that span partitions") {
    // 2 fat groups over default parallelism: the range exchange MUST
    // split each group across many partitions (the whole point vs a
    // grouped window), and ranks must still be dense per group
    val grouped = fixture.withColumn("g", (col("id") % 2).cast("long"))
    val expected = grouped.select("id", "score", "g")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._3).flatMap { case (_, rows) =>
        rows.toSeq.sortBy(r => (-r._2, r._1)).zipWithIndex
          .map { case (r, i) => r._1 -> (i + 1L) }
      }.toMap
    val got = Ranking.groupRank(grouped, Seq(col("g")),
        Seq(col("score").desc, col("id").asc))
      .select("id", "group_rank").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // multi-column group keys
    val mc = fixture.withColumn("g1", (col("id") % 2).cast("long"))
      .withColumn("g2", (col("id") % 3).cast("long"))
    val mcExpected = mc.select("id", "score", "g1", "g2")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._3, r._4)).flatMap { case (_, rows) =>
        rows.toSeq.sortBy(r => (-r._2, r._1)).zipWithIndex
          .map { case (r, i) => r._1 -> (i + 1L) }
      }.toMap
    val mcGot = Ranking.groupRank(mc, Seq(col("g1"), col("g2")),
        Seq(col("score").desc, col("id").asc))
      .select("id", "group_rank").as[(Long, Long)].collect().toMap
    assert(mcGot === mcExpected)
  }

  test("groupRank is partitioning-independent; empty input; bad args") {
    val grouped = fixture.withColumn("g", (col("id") % 3).cast("long"))
    val base = Ranking.groupRank(grouped, Seq(col("g")),
        Seq(col("score").desc, col("id").asc))
      .select("id", "group_rank").as[(Long, Long)].collect().toSet
    for (p <- Seq(1, 7, 64)) {
      val other = Ranking.groupRank(grouped.repartition(p), Seq(col("g")),
          Seq(col("score").desc, col("id").asc))
        .select("id", "group_rank").as[(Long, Long)].collect().toSet
      assert(other === base, s"group ranks changed under repartition($p)")
    }
    assert(Ranking.groupRank(grouped.filter(lit(false)), Seq(col("g")),
      Seq(col("id"))).count() === 0L)
    intercept[IllegalArgumentException](
      Ranking.groupRank(grouped, Nil, Seq(col("id"))))
    intercept[IllegalArgumentException](
      Ranking.groupRank(grouped, Seq(col("g")), Nil))
  }

  test("groupRank plan: range exchange on (group, order), no grouped window") {
    // the scale contract: the shuffled stage range-partitions — a
    // grouped window (hashpartitioning on g alone) would funnel each
    // whole group through one task
    val grouped = fixture.withColumn("g", (col("id") % 2).cast("long"))
    val plan = Ranking.ranged(
        grouped.withColumn("__gk", struct(col("g"))),
        Seq(col("__gk"), col("score").desc, col("id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange:\n$plan")
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"grouped rank must not use a window or a single partition:\n$plan")
  }

  test("ntilePerGroup == ANSI ntile PARTITION BY group") {
    import org.apache.spark.sql.expressions.Window
    val grouped = fixture.withColumn("g", (col("id") % 3).cast("long"))
    // expected via Spark's own window ntile (ANSI) on small data
    val expected = grouped.withColumn("b",
        ntile(4).over(Window.partitionBy(col("g"))
          .orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select("id", "b").as[(Long, Long)].collect().toMap
    val got = Ranking.ntilePerGroup(grouped, Seq(col("g")),
        Seq(col("score").desc, col("id").asc), n = 4)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // group smaller than n: one row per leading bucket, like ntileBuckets
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "g")
    val tinyGot = Ranking.ntilePerGroup(tiny, Seq(col("g")),
        Seq(col("id").asc), n = 8)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(tinyGot === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    intercept[IllegalArgumentException](
      Ranking.ntilePerGroup(grouped, Seq(col("g")), Seq(col("id")), 0))
  }

  test("topFraction rejects bad percent; empty input stays empty") {
    intercept[IllegalArgumentException](
      Ranking.topFraction(fixture, Seq(col("id").asc), 0))
    intercept[IllegalArgumentException](
      Ranking.topFraction(fixture, Seq(col("id").asc), 101))
    val empty = Ranking.globalRank(fixture.filter(lit(false)), Seq(col("id").asc))
    assert(empty.count() === 0L)
  }
}
