package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch error bounds vs the exact twins on the events fixture. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir)

  test("approx_percentile within rank-error bound of exact percentile") {
    val exact = events.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("p50"),
        percentile($"value", lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val approx = Sketches.approxQuantiles(events, "event_type", "value",
      Seq(0.5, 0.9), accuracy = 10000)
      .as[(String, Double, Double)].collect()
    assert(approx.nonEmpty)
    // one job for all groups' sorted values, not one filter+collect per type
    val sortedByType = events.select($"event_type", $"value")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((et, a50, a90) <- approx) {
      val (e50, e90, n) = exact(et)
      // GK bound: rank error <= n/accuracy; translate to a value-rank
      // check — the approx value must fall within the exact values at
      // rank +- 2*n/accuracy (slack for interpolation)
      val values = sortedByType(et)
      def rankWindow(p: Double): (Double, Double) = {
        val r = (p * (n - 1)).toInt
        val eps = math.max(2 * n / 10000, 2).toInt
        (values(math.max(0, r - eps)), values(math.min(values.length - 1, r + eps)))
      }
      val (lo50, hi50) = rankWindow(0.5)
      val (lo90, hi90) = rankWindow(0.9)
      assert(a50 >= lo50 && a50 <= hi50, s"$et p50 $a50 not in [$lo50,$hi50] (exact $e50)")
      assert(a90 >= lo90 && a90 <= hi90, s"$et p90 $a90 not in [$lo90,$hi90] (exact $e90)")
    }
  }

  test("approxQuantiles: name derivation rounds and rejects collisions/empty") {
    val df = events.limit(10)
    val cols = Sketches.approxQuantiles(df, "event_type", "value", Seq(0.29, 0.999)).columns
    assert(cols.toSeq === Seq("event_type", "p29", "p999"))
    intercept[IllegalArgumentException] {
      Sketches.approxQuantiles(df, "event_type", "value", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      // 0.5 → p50; 0.050001 falls to the per-mille form → also p50
      Sketches.approxQuantiles(df, "event_type", "value", Seq(0.5, 0.050001))
    }
  }

  test("approx_count_distinct within 3*rsd of exact distinct count") {
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinct(events, "event_type", "user_id", rsd = 0.05)
      .as[(String, Long)].collect()
    assert(approx.nonEmpty)
    for ((et, a) <- approx) {
      val e = exact(et).toDouble
      assert(math.abs(a - e) <= 3 * 0.05 * e + 1,
        s"$et approx $a vs exact $e outside 3*rsd")
    }
  }

  test("heavyHitters: exact output == brute-force threshold count (planted hitter)") {
    import graft.operators.Sketches
    // 10_000 rows: "hot" at 15%, "warm" at 8%, 770 distinct cold values
    val rows = (0 until 10000).map { i =>
      if (i < 1500) "hot" else if (i < 2300) "warm" else s"cold_${i % 770}"
    }
    val df = rows.toDF("item")
    def exact(support: Double): Map[String, Long] =
      rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 > support * rows.size)
    for (support <- Seq(0.10, 0.05, 0.01)) {
      val got = Sketches.heavyHitters(df, "item", support)
        .as[(String, Long)].collect().toMap
      assert(got === exact(support), s"mismatch at support=$support")
    }
    // repartitioning must not change the (exact) answer
    val re = Sketches.heavyHitters(df.repartition(17), "item", 0.05)
      .as[(String, Long)].collect().toMap
    assert(re === exact(0.05))
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, "item", 1.5))
    // nulls are excluded BY CONTRACT and the support denominator is the
    // non-null count — a 60%-null column must still surface "hot"
    val withNulls = (rows.take(2000).map(Option(_)) ++
      Seq.fill(3000)(Option.empty[String])).toDF("item")
    val hh = Sketches.heavyHitters(withNulls, "item", 0.5)
      .as[(String, Long)].collect().toMap
    assert(hh === Map("hot" -> 1500L), s"got $hh") // 1500 of 2000 non-null
  }

  test("eventProfile: one-pass combined sketch profile, partial aggregation") {
    val prof = Sketches.eventProfile(events)
    val rows = prof.collect()
    assert(rows.nonEmpty)
    // quantiles are ordered p50 <= p90 <= p99 per group
    for (r <- rows) {
      val (p50, p90, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99, s"quantile ordering violated: $r")
    }
    // the plan must show map-side partial aggregation (one shuffle of
    // sketch state, not raw rows)
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
  }
}
