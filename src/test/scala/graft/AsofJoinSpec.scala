package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** As-of join semantics: backward-inclusive match, tie handling,
  * inner/left forms, and the no-join-node plan shape. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    // (key, ts, price)
    ("A", 10L, 100L),
    ("A", 20L, 200L),
    ("A", 30L, 300L),
    ("B", 15L, 150L)
  ).toDF("k", "ts", "price")

  private lazy val trades = Seq(
    // (key, ts, qty)
    ("A", 5L, 1L),   // before any quote → unmatched
    ("A", 20L, 2L),  // exact tie → inclusive match at 20
    ("A", 25L, 3L),  // between 20 and 30 → 20
    ("A", 99L, 4L),  // after all → 30
    ("B", 14L, 5L),  // before B's only quote → unmatched
    ("C", 50L, 6L)   // key with no quotes at all → unmatched
  ).toDF("k", "ts", "qty")

  test("backward-inclusive semantics, inner join drops unmatched") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
        rightSelect = Seq("ts" -> "quote_ts", "price" -> "price"))
      .select($"k", $"ts", $"qty", $"quote_ts", $"price")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("A", 20L, 2L, 20L, 200L),
      ("A", 25L, 3L, 20L, 200L),
      ("A", 99L, 4L, 30L, 300L)))
  }

  test("left form keeps unmatched rows with null payload") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "price"), how = "left")
      .select($"k", $"ts", $"price")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(out.contains(("A", 5L, None)))
    assert(out.contains(("B", 14L, None)))
    assert(out.contains(("C", 50L, None)))
    assert(out.contains(("A", 25L, Some(200L))))
    assert(out.size === trades.count())
  }

  test("plan shape: window over one shuffle, no join node") {
    val plan = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
      rightSelect = Seq("price" -> "price")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("null right timestamps never match (DuckDB ASOF parity)") {
    val q = Seq(("A", Option.empty[Long], 999L), ("A", Some(20L), 200L))
      .toDF("k", "ts", "price")
    val t = Seq(("A", 5L, 1L), ("A", 25L, 2L)).toDF("k", "ts", "qty")
    val out = AsofJoin.asofBackward(t, q, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "price"))
      .select($"ts", $"price").as[(Long, Long)].collect().toSet
    // the trade at ts=5 has NO prior non-null quote: dropped, not
    // phantom-matched to the null-ts row's payload
    assert(out === Set((25L, 200L)))
  }

  test("null join keys never match (SQL equality parity)") {
    val q = Seq((Option.empty[String], 10L, 999L), (Some("A"), 10L, 100L))
      .toDF("k", "ts", "price")
    val t = Seq((Option.empty[String], 25L, 1L), (Some("A"), 25L, 2L))
      .toDF("k", "ts", "qty")
    // inner: the null-key trade is dropped — it must NOT match the
    // null-key quote (Window.partitionBy would group them together)
    val inner = AsofJoin.asofBackward(t, q, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "price"))
      .select($"qty", $"price").as[(Long, Long)].collect().toSet
    assert(inner === Set((2L, 100L)))
    // left: the null-key trade survives, null-extended
    val lft = AsofJoin.asofBackward(t, q, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "price"), how = "left")
      .select($"qty", $"price").as[(Long, Option[Long])].collect().toSet
    assert(lft === Set((1L, None), (2L, Some(100L))))
  }

  test("null payload fields come from the matched row, never torn from older rows") {
    val q = Seq(
      ("A", 10L, Some(5L), Some(7L)),
      ("A", 20L, Option.empty[Long], Some(8L)) // matched row has null price
    ).toDF("k", "ts", "price", "qty")
    val t = Seq(("A", 25L, 1L)).toDF("k", "ts", "tid")
    val out = AsofJoin.asofBackward(t, q, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "price", "qty" -> "qty"))
      .select($"price", $"qty").as[(Option[Long], Option[Long])].collect().toSeq
    // DuckDB ASOF matches ts=20 → (null, 8); per-column last(ignoreNulls)
    // would tear (5, 8) from two different rows
    assert(out === Seq((None, Some(8L))))
  }

  test("guards: name clashes, unknown how, mismatched ts types") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "qty")) // clashes with left column
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "p"), how = "full")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades.withColumn("ts", $"ts".cast("int")), quotes,
        Seq("k"), "ts", "ts", rightSelect = Seq("price" -> "p"))
    }
    // reserved temp names are rejected, not silently overwritten
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades.withColumn("__side", lit(9)), quotes,
        Seq("k"), "ts", "ts", rightSelect = Seq("price" -> "p"))
    }
  }

  test("sliced variant: identical results to base on the small fixtures") {
    for (how <- Seq("inner", "left"); w <- Seq(1L, 7L, 100L)) {
      val base = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
          rightSelect = Seq("ts" -> "quote_ts", "price" -> "price"), how = how)
        .select($"k", $"ts", $"qty", $"quote_ts", $"price")
        .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSet
      val sliced = AsofJoin.asofBackwardSliced(trades, quotes, Seq("k"), "ts", "ts",
          rightSelect = Seq("ts" -> "quote_ts", "price" -> "price"),
          sliceWidth = w, how = how)
        .select($"k", $"ts", $"qty", $"quote_ts", $"price")
        .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(sliced === base, s"how=$how sliceWidth=$w")
    }
  }

  test("sliced variant: carry-in crosses arbitrarily many empty slices") {
    val q = Seq(("A", 0L, 100L)).toDF("k", "ts", "price")
    val t = Seq(("A", 999999L, 1L), ("A", -5L, 2L)).toDF("k", "ts", "qty")
    val out = AsofJoin.asofBackwardSliced(t, q, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "price"), sliceWidth = 10L)
      .select($"qty", $"price").as[(Long, Long)].collect().toSet
    // ts=999999 sits ~100k empty slices after the only quote; ts=-5 is
    // before it (negative slice — floor, not truncate-toward-zero)
    assert(out === Set((1L, 100L)))
  }

  test("sliced variant: hot key — one key holds all rows, partitions split, no join node") {
    val n = 4000
    val rights = (0 until n).map(i => ("HOT", i.toLong * 10, i.toLong)).toDF("k", "ts", "price")
    val lefts = (0 until n).map(i => ("HOT", i.toLong * 10 + 5, i.toLong)).toDF("k", "ts", "qty")
    val sliced = AsofJoin.asofBackwardSliced(lefts, rights, Seq("k"), "ts", "ts",
      rightSelect = Seq("ts" -> "p_ts", "price" -> "price"), sliceWidth = 1000L)
    val plan = sliced.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val out = sliced.select($"ts", $"p_ts", $"price").as[(Long, Long, Long)].collect()
    assert(out.length === n)
    // every left row at i*10+5 matches the right row at i*10 exactly,
    // boundary rows included (e.g. ts=1005 in slice 1 matching ts=1000,
    // and carry-in covering any left row whose match fell in an earlier slice)
    out.foreach { case (ts, pTs, price) =>
      assert(pTs === ts - 5, s"left ts=$ts")
      assert(price === (ts - 5) / 10)
    }
    // the base operator would put all n rows in ONE window partition;
    // the sliced one splits the hot key across ~40 slices
    val slices = lefts.select((col("ts") - pmod(col("ts"), lit(1000L))).divide(lit(1000L)))
      .distinct().count()
    assert(slices > 10)
  }

  test("sliced variant: guards — non-integral ts and bad width rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackwardSliced(trades.withColumn("ts", $"ts".cast("double")),
        quotes.withColumn("ts", $"ts".cast("double")), Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "p"), sliceWidth = 10L)
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackwardSliced(trades, quotes, Seq("k"), "ts", "ts",
        rightSelect = Seq("price" -> "p"), sliceWidth = 0L)
    }
  }

  test("matches DuckDB-style semantics on the events fixture (vs driver-side loop)") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val out = AsofJoin.asofBackward(clicks, purchases, Seq("user_id"), "ts", "ts",
        rightSelect = Seq("ts" -> "p_ts"))
      .select($"event_id", $"p_ts").as[(Long, Long)].collect().toMap
    // driver-side reference computation
    val cl = clicks.as[(Long, Long, Long)].collect()
    val pu = purchases.select($"user_id", $"ts").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    var checked = 0
    for ((eid, uid, ts) <- cl) {
      val expected = pu.get(uid).flatMap(arr => arr.takeWhile(_ <= ts).lastOption)
      expected match {
        case Some(p) => assert(out(eid) === p, s"event $eid"); checked += 1
        case None    => assert(!out.contains(eid), s"event $eid should be unmatched")
      }
    }
    assert(checked > 0)
  }
}
