package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distance-kernel spec: hand-computed values, metric identities, and
  * interpreted-vs-codegen agreement (both paths execute depending on
  * plan shape — they must be bit-identical). */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(0.5f, -0.5f, 0.25f), Seq(0.5f, -0.5f, 0.25f)))

  test("dot/l2/cosine: hand-computed values") {
    val df = pairs.toDF("a", "b")
    val r = df.select(
      dotF32($"a", $"b").as("dot"),
      l2SqF32($"a", $"b").as("l2sq"),
      l2DistF32($"a", $"b").as("l2"),
      cosSimF32($"a", $"b").as("cos")).collect()

    assert(r(0).getFloat(0) === 0.0f)
    assert(r(0).getFloat(1) === 2.0f)
    assert(r(0).getFloat(2) === math.sqrt(2.0).toFloat)
    assert(r(0).getFloat(3) === 0.0f)

    assert(r(1).getFloat(0) === (4f + 10f + 18f))
    assert(r(1).getFloat(1) === (9f + 9f + 9f))

    assert(r(2).getFloat(1) === 0.0f) // l2sq(a,a) = 0
    assert(math.abs(r(2).getFloat(3) - 1.0f) < 1e-6f) // cos(a,a) = 1
  }

  test("symmetry: d(a,b) == d(b,a)") {
    val df = pairs.toDF("a", "b")
    val r = df.select(
      (l2SqF32($"a", $"b") === l2SqF32($"b", $"a")).as("s1"),
      (dotF32($"a", $"b") === dotF32($"b", $"a")).as("s2"),
      (cosSimF32($"a", $"b") === cosSimF32($"b", $"a")).as("s3")).collect()
    assert(r.forall(row => row.getBoolean(0) && row.getBoolean(1) && row.getBoolean(2)))
  }

  test("interpreted eval matches codegen result") {
    // force interpreted path by eval'ing the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val at = ArrayType(FloatType, containsNull = false)
    def lit(v: Seq[Float]) = Literal.create(ArrayData.toArrayData(v.toArray), at)
    for ((a, b) <- pairs) {
      val interp = graft.functions.EuclideanDistF32(lit(a), lit(b)).eval(null)
      val viaDf = Seq((a, b)).toDF("a", "b")
        .select(l2DistF32($"a", $"b")).head().getFloat(0)
      assert(interp === viaDf)
    }
  }

  test("null inputs propagate null (nullIntolerant contract)") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]),
      (Option.empty[Seq[Float]], Some(Seq(1.0f, 2.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f)))).toDF("a", "b")
    val r = df.select(dotF32($"a", $"b").as("d")).collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0) && !r(2).isNullAt(0))
  }

  test("length mismatch: kernels fail loudly (prefix-only scores are garbage)") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    // surfaces as IllegalArgumentException directly (constant-folded
    // local relation) or wrapped in SparkException from an executor
    val e = intercept[Exception] {
      df.select(dotF32($"a", $"b").as("d")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimensions differ")), e.toString)
  }

  test("cosine clamps to [-1, 1]: near-identical vectors never exceed 1 (DuckDB parity)") {
    // unclamped f32 rounds cos(v, v') above 1 for near-twins (the
    // sqrt(na)·sqrt(nb) product rounds low) — the r13 EmbScaleUp
    // fixture surfaced 1401 such pairs forking the oracle digest
    val v = Seq(0.1f, 0.3f, 0.7f, 0.011f)
    val w = v.updated(2, 0.7000001f) // distinct near-twin
    val df = Seq((v, v), (v, w)).toDF("a", "b")
    val r = df.select(cosSimF32($"a", $"b").as("c")).collect()
    assert(r(0).getFloat(0) === 1.0f)
    assert(r(1).getFloat(0) <= 1.0f)
    // the local serve kernel must mirror the clamp (parity specs ride it)
    assert(graft.operators.Rerank.cosSimLocal(v.toArray, v.toArray) === 1.0f)
  }

  test("cosine of a zero vector is 0, never NaN (ranking safety)") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val c = df.select(cosSimF32($"a", $"b").as("c")).head().getFloat(0)
    assert(c === 0.0f && !c.isNaN)
  }

  test("empty arrays: dot=0, l2sq=0") {
    val df = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val r = df.select(dotF32($"a", $"b").as("d"), l2SqF32($"a", $"b").as("s")).head()
    assert(r.getFloat(0) === 0.0f && r.getFloat(1) === 0.0f)
  }

  test("1 - l2sq is monotone-decreasing in distance (reference score semantics)") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val scored = e.select(l2SqF32($"embedding", typedLit(q)).cast("double").as("d"))
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0) - $"d")
      .orderBy($"d")
      .collect()
    val scores = scored.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("scoreAndThreshold over L2Sq == the inline 1 - dist^2 Euclidean form (metric-contract bridge)") {
    import graft.operators.VectorSearch
    import org.apache.spark.sql.functions.{col, lit}
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val viaHelper = VectorSearch.scoreAndThreshold(
        VectorSearch.topKWithScore(e, q, 10, VectorSearch.L2Sq), threshold = 0.1)
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    val viaEuclid = VectorSearch.topKWithScore(e, q, 10, VectorSearch.Euclidean)
      .withColumn("score", lit(1.0) - col("dist") * col("dist"))
      .filter(col("score") >= 0.1)
      .orderBy(col("score").desc, col("vec_id"))
      .select($"vec_id", $"score").as[(Long, Double)].collect().toSeq
    assert(viaHelper.map(_._1) === viaEuclid.map(_._1))
    // scores agree to f64 rounding of sqrt-then-square vs direct sum
    viaHelper.zip(viaEuclid).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
    assert(viaHelper.nonEmpty)
  }
}
