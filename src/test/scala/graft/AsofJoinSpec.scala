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
