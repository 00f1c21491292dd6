package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.VectorSearch

/** Late-interaction (maxsim) multi-vector retrieval: driver-reference
  * parity, the 1-token degenerate case, null hygiene, plan shape. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Tables.embeddings(spark, sfDir)
    .filter($"vec_id" >= 8)
    .withColumn("doc_id", expr("vec_id div 8"))

  test("maxsim == driver-side reference on the fixture") {
    val qs = (0L to 3L).map(i => graft.queries.VectorQueries.qvec(spark, sfDir, i))
    val got = VectorSearch.maxSimTopK(corpus(), "doc_id", qs, k = 10)
      .select($"doc_id", $"maxsim_score")
      .as[(Long, Double)].collect().toSeq
    // reference: exact per-doc max of the ONE driver-side f32 kernel
    // twin (Rerank.cosSimLocal == the cosSimF32 expression bit for bit)
    val rows = corpus().select($"doc_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val ref = rows.groupBy(_._1).map { case (d, vs) =>
      val maxes = qs.map(q => vs.map(v =>
        graft.operators.Rerank.cosSimLocal(v._2.toArray, q.toArray).toDouble).max)
      d -> maxes.reduceLeft(_ + _)
    }
    val want = ref.toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
    assert(got === want)
  }

  test("single-token maxsim degenerates to best-chunk-per-group max cosine") {
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val got = VectorSearch.maxSimTopK(corpus(), "doc_id", Seq(q), k = 5)
      .select($"doc_id", $"maxsim_score").as[(Long, Double)].collect().toSeq
    val want = corpus()
      .withColumn("cs", cosSimF32($"embedding", typedLit(q)).cast("double"))
      .groupBy($"doc_id").agg(max($"cs").as("m"))
      .orderBy($"m".desc, $"doc_id").limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("null group ids and all-null groups are excluded; partial nulls ignored by max") {
    val qs = Seq(Seq(1.0f, 0.0f))
    val df = Seq(
      (java.lang.Long.valueOf(1L), Seq(1.0f, 0.0f)),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[Seq[Float]]),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[Seq[Float]]),
      (null.asInstanceOf[java.lang.Long], Seq(1.0f, 0.0f))
    ).toDF("doc_id", "embedding")
    val got = VectorSearch.maxSimTopK(df, "doc_id", qs, k = 10)
      .select($"doc_id", $"maxsim_score").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.0)))
  }

  test("plan: map-side partial aggregation below the exchange, TakeOrdered on top") {
    val qs = (0L to 1L).map(i => graft.queries.VectorQueries.qvec(spark, sfDir, i))
    val plan = VectorSearch.maxSimTopK(corpus(), "doc_id", qs, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered, not a global sort: $plan")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(aggIdx >= 0 && plan.indexOf("HashAggregate", aggIdx + 1) > 0,
      s"expected partial+final aggregate pair: $plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("guards: k >= 1, non-empty query set") {
    intercept[IllegalArgumentException](
      VectorSearch.maxSimTopK(corpus(), "doc_id", Seq(Seq(1.0f)), k = 0))
    intercept[IllegalArgumentException](
      VectorSearch.maxSimTopK(corpus(), "doc_id", Seq.empty, k = 1))
  }
}
