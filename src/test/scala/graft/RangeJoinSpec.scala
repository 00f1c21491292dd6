package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed point-in-interval join: boundary semantics, bucket-crossing
  * intervals, no-dup guarantee, and the no-cross-product plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val intervals = Seq(
    ("A", 10L, 20L, "i1"),   // within one bucket (W=100)
    ("A", 90L, 210L, "i2"),  // spans three buckets
    ("B", 50L, 50L, "i3"),   // degenerate single-point interval
    ("B", 60L, 40L, "i4")    // inverted → matches nothing
  ).toDF("k", "s", "e", "iid")

  private lazy val points = Seq(
    ("A", 10L, 1L), ("A", 20L, 2L), ("A", 21L, 3L),  // i1 boundaries + outside
    ("A", 100L, 4L), ("A", 205L, 5L),                 // i2 in two different buckets
    ("B", 50L, 6L), ("B", 45L, 7L)                    // i3 exact; i4 never
  ).toDF("k", "ts", "pid")

  test("inclusive boundaries, bucket-crossing intervals, exactly-once pairs") {
    val out = RangeJoin.pointInRange(points, intervals, Seq("k"),
        "ts", "s", "e", bucketWidth = 100L, rightSelect = Seq("iid" -> "iid"))
      .select($"pid", $"iid").as[(Long, String)].collect().toList
    // no duplicates even though i2 spans 3 buckets
    assert(out.size === out.distinct.size)
    assert(out.toSet === Set(
      (1L, "i1"), (2L, "i1"),      // inclusive start and end
      (4L, "i2"), (5L, "i2"),      // two points in different buckets of i2
      (6L, "i3")))                 // degenerate interval matches its point
  }

  test("plan shape: shuffled equi-join, no nested-loop/cartesian") {
    val plan = RangeJoin.pointInRange(points, intervals, Seq("k"),
      "ts", "s", "e", 100L, Seq("iid" -> "iid")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("exact integer bucketing at epoch-nanos magnitude (beyond 2^53)") {
    val bigTs = 1704067200000000000L // 2024-01-01 in ns — double would lose precision
    val pts = Seq(("A", bigTs + 1, 1L)).toDF("k", "ts", "pid")
    val ivs = Seq(("A", bigTs, bigTs + 10, "i")).toDF("k", "s", "e", "iid")
    val out = RangeJoin.pointInRange(pts, ivs, Seq("k"), "ts", "s", "e",
      bucketWidth = 86400L * 1000 * 1000 * 1000, rightSelect = Seq("iid" -> "iid"))
    assert(out.count() === 1)
  }

  test("guards: bad width, name clash, reserved names, runaway intervals") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(points, intervals, Seq("k"), "ts", "s", "e",
        0L, Seq("iid" -> "iid"))
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(points, intervals, Seq("k"), "ts", "s", "e",
        100L, Seq("iid" -> "pid"))
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(points.withColumn("__bucket", lit(1)), intervals,
        Seq("k"), "ts", "s", "e", 100L, Seq("iid" -> "iid"))
    }
    // an open-ended sentinel interval fails fast with a clear message
    // instead of a sequence() explosion
    val openEnded = Seq(("A", 0L, Long.MaxValue, "open")).toDF("k", "s", "e", "iid")
    val err = intercept[Exception] {
      RangeJoin.pointInRange(points, openEnded, Seq("k"), "ts", "s", "e",
        100L, Seq("iid" -> "iid")).collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("buckets") ||
        Option(err.getCause).exists(_.getMessage.contains("buckets"))),
      s"expected the fail-fast span guard, got: $err")
  }
}
