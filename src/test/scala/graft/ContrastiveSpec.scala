package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Contrastive

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)

  private def anchors(n: Long) = emb.filter($"vec_id" < n)
    .select($"vec_id".as("query_id"), $"embedding".as("query_embedding"),
      $"label".as("query_label"))

  /** Driver-side brute force: exact f32 L2 over the collected fixture,
    * independent of the operator's plan. */
  private def brute(): Map[Long, Seq[(Long, Int, Double)]] = {
    val rows = emb.select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val qs = rows.filter(_._1 < 4)
    qs.map { case (qid, qv, qlab) =>
      val ds = rows.map { case (id, v, lab) =>
        var acc = 0.0f
        var i = 0
        while (i < v.length) { val d = v(i) - qv(i); acc += d * d; i += 1 }
        (id, lab, math.sqrt(acc.toDouble).toFloat.toDouble)
      }
      qid -> ds.filter(_._2 != qlab).sortBy(t => (t._3, t._1)).toSeq
    }.toMap
  }

  test("hardNegatives: exact ranked different-label neighbors") {
    val got = Contrastive.hardNegatives(emb, anchors(4), k = 5).collect()
    val want = brute()
    assert(got.length === 4 * 5)
    got.foreach { r =>
      val (qid, rn) = (r.getLong(0), r.getLong(4))
      val (id, lab, dist) = want(qid)(rn.toInt - 1)
      assert(r.getLong(1) === id)
      assert(r.getInt(2) === lab)
      assert(r.getDouble(3) === dist)
    }
  }

  test("hardNegatives: the anchor's own label never appears, self excluded") {
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = Contrastive.hardNegatives(emb, anchors(8), k = 10).collect()
    got.foreach { r =>
      assert(r.getInt(2) !== labels(r.getLong(0)), s"same-label row mined: $r")
      assert(r.getLong(1) !== r.getLong(0))
    }
  }

  test("semiHardNegatives: every row is inside the (pos_dist, pos_dist+margin] band") {
    val margin = 0.05
    val got = Contrastive.semiHardNegatives(emb, anchors(8), k = 5, margin)
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dist, posDist) = (r.getDouble(2), r.getDouble(3))
      assert(dist > posDist, s"not harder than the nearest positive: $r")
      assert(dist <= posDist + margin, s"outside the margin band: $r")
    }
    // pos_dist really is the nearest positive: recompute via the
    // operator's own building block and compare
    val pos = Contrastive.nearestPositive(emb, anchors(8))
      .as[(Long, Double)].collect().toMap
    rows.foreach(r => assert(r.getDouble(3) === pos(r.getLong(0))))
  }

  test("an anchor with no positive (unique label) mines no semi-hard rows") {
    // give anchor 0 a label nothing else has
    val solo = emb.withColumn("label",
      when($"vec_id" === 0, lit(9999)).otherwise($"label"))
    val a = solo.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_embedding"),
        $"label".as("query_label"))
    val got = Contrastive.semiHardNegatives(solo, a, k = 5, margin = 10.0)
    assert(got.filter($"query_id" === 0).count() === 0L)
    assert(got.filter($"query_id" === 1).count() > 0L)
  }

  test("null-labeled corpus rows are neither positives nor negatives") {
    val holed = emb.withColumn("label",
      when($"vec_id" >= 100, lit(null).cast("int")).otherwise($"label"))
    val hard = Contrastive.hardNegatives(holed, anchors(4), k = 200).collect()
    assert(hard.nonEmpty)
    hard.foreach(r => assert(r.getLong(1) < 100, s"null-label row mined: $r"))
    val semi = Contrastive.semiHardNegatives(holed, anchors(4), k = 200,
      margin = 10.0).collect()
    semi.foreach(r => assert(r.getLong(1) < 100, s"null-label row mined: $r"))
  }

  test("plan: broadcast anchors + partial WindowGroupLimit below the rank exchange") {
    val df = Contrastive.hardNegatives(emb, anchors(4), k = 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
    val df2 = Contrastive.semiHardNegatives(emb, anchors(4), k = 5, margin = 0.05)
    val p2 = df2.queryExecution.executedPlan.toString
    assert(p2.contains("WindowGroupLimit") && p2.contains("Partial"), p2)
  }

  test("guards: bad k and bad margin are refused") {
    intercept[IllegalArgumentException](
      Contrastive.hardNegatives(emb, anchors(2), k = 0))
    intercept[IllegalArgumentException](
      Contrastive.semiHardNegatives(emb, anchors(2), k = 5, margin = 0.0))
    intercept[IllegalArgumentException](
      Contrastive.semiHardNegatives(emb, anchors(2), k = 5, margin = Double.NaN))
  }
}
