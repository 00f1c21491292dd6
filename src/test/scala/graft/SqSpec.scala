package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Sq

/** SQ8 scalar quantization: kernel arithmetic (clamp edges, zero
  * vector), exact integer dot, search contract, and recall sanity of
  * the quantized candidate ranking. */
class SqSpec extends SparkSpec {
  import spark.implicits._

  test("codes are d bytes, bounded to [-127,127]; dominant component hits the rail") {
    val c = Sq.sq8Codes(Array(0.0f, 5.0f, 0.0f))
    assert(c.toSeq === Seq[Byte](0, 127, 0))
    val n = Sq.sq8Codes(Array(-3.0f, 0.0f))
    assert(n.toSeq === Seq[Byte](-127, 0))
    val f = Sq.sq8Codes(Array.fill(64)(0.125f))
    assert(f.length === 64)
    assert(f.forall(b => b >= -127 && b <= 127))
  }

  test("zero vector quantizes to all-zero codes (no NaN path)") {
    assert(Sq.sq8Codes(Array(0.0f, 0.0f, 0.0f)).toSeq === Seq[Byte](0, 0, 0))
  }

  test("non-finite norms quantize to all-zero codes (Scala==SQL on pathological rows)") {
    // NaN component; Inf component; finite components whose f32 acc
    // overflows — all three must take the zero path, because Scala's
    // NaN.toByte (0) and DuckDB's LEAST(127, NaN) (127) disagree on
    // the unguarded arithmetic
    assert(Sq.sq8Codes(Array(Float.NaN, 1.0f)).toSeq === Seq[Byte](0, 0))
    assert(Sq.sq8Codes(Array(Float.PositiveInfinity, 1.0f)).toSeq === Seq[Byte](0, 0))
    assert(Sq.sq8Codes(Array(3.0e38f, 3.0e38f)).toSeq === Seq[Byte](0, 0))
  }

  test("quantization is scale-invariant (codes depend only on direction)") {
    val v = Array(0.3f, -0.7f, 0.64f, 0.01f)
    val scaled = v.map(_ * 8.0f) // exact f32 scaling: direction unchanged
    assert(Sq.sq8Codes(v).toSeq === Sq.sq8Codes(scaled).toSeq)
  }

  test("dot8 matches a BigInt reference on random codes") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val a = Array.fill(64)((rnd.nextInt(255) - 127).toByte)
      val b = Array.fill(64)((rnd.nextInt(255) - 127).toByte)
      val ref = a.zip(b).map { case (x, y) => BigInt(x.toInt) * BigInt(y.toInt) }.sum
      assert(BigInt(Sq.dot8(a, b)) === ref)
    }
  }

  test("quantize: null embedding stays null; code column is BinaryType") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val q = Sq.quantize(df)
    assert(q.schema("sq_code").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val rows = q.orderBy($"vec_id").select($"sq_code").collect()
    assert(rows(0).get(0) != null)
    assert(rows(1).get(0) == null)
  }

  test("searchSq8 returns k rows in (cos_sim desc, id) order with exact int dots") {
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" =!= 0)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val out = Sq.searchSq8(Sq.quantize(emb), q, k = 10, rerank = 32)
      .select($"vec_id", $"approx_dot", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.size === 10)
    assert(out.map(r => (-r._3, r._1)) === out.map(r => (-r._3, r._1)).sorted)
    // dots re-derived driver-side from the same kernel
    val all = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (i, e) => i -> Sq.sq8Codes(e.toArray) }.toMap
    val qc = Sq.sq8Codes(q.toArray)
    out.foreach { case (id, dot, _) => assert(dot === Sq.dot8(all(id), qc)) }
  }

  test("quantized candidate ranking reaches recall@10 >= 0.9 vs exact cosine") {
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" =!= 0)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val approx = Sq.searchSq8(Sq.quantize(emb), q, k = 10, rerank = 32)
      .select($"vec_id").as[Long].collect().toSet
    val exact = emb
      .withColumn("cs", cosSimF32($"embedding", typedLit(q)).cast("double"))
      .orderBy($"cs".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (approx & exact).size / 10.0
    info(f"SQ8 recall@10 = $recall%.2f")
    assert(recall >= 0.9, s"SQ8 with 32-candidate rerank should be near-exact, got $recall")
  }

  test("searchIvfSq8: nprobe=ALL + corpus-wide rerank equals exact cosine top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val idx = graft.operators.Ann.buildIvf(emb, numClusters = 8)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 3)
    val got = Sq.searchIvfSq8(idx, q, k = 10, rerank = 500, nprobe = 8)
      .select($"vec_id").as[Long].collect().toSeq
    val exact = emb
      .withColumn("cs", cosSimF32($"embedding", typedLit(q)).cast("double"))
      .orderBy($"cs".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === exact)
  }

  test("searchIvfSq8: results come only from the probed clusters") {
    val emb = Tables.embeddings(spark, sfDir)
    val idx = graft.operators.Ann.buildIvf(emb, numClusters = 8)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 3)
    val probed = graft.operators.Ann.rankProbes(idx.centroids, q.toArray, 2).toSet
    val clusters = Sq.searchIvfSq8(idx, q, k = 10, rerank = 32, nprobe = 2)
      .select($"ivf_cluster".cast("int")).as[Int].collect().toSet
    assert(clusters.subsetOf(probed))
  }

  test("embeddingHealth: nulls, zero vectors, non-finite components, ragged dims") {
    val rows = Seq(
      (1L, Seq(3.0f, 4.0f)),                       // norm exactly 5
      (2L, Seq(0.0f, -0.0f)),                      // zero vector (-0.0 counts)
      (3L, Seq(Float.NaN, 1.0f)),                  // non-finite
      (4L, Seq(Float.PositiveInfinity, 0.0f)),     // non-finite
      (5L, Seq(1.0f, 0.0f, 0.0f)),                 // ragged dim 3
      (6L, null.asInstanceOf[Seq[Float]]))
    val h = graft.operators.Maintenance
      .embeddingHealth(rows.toDF("vec_id", "embedding"))
      .collect()(0)
    assert(h.getAs[Long]("n_rows") === 6L)
    assert(h.getAs[Long]("n_null") === 1L)
    assert(h.getAs[Long]("n_zero") === 1L)
    assert(h.getAs[Long]("n_nonfinite") === 2L)
    assert(h.getAs[Long]("dim_min") === 2L)
    assert(h.getAs[Long]("dim_max") === 3L)
    assert(h.getAs[Long]("n_dims") === 2L)
    assert(h.getAs[Double]("norm_min") === 0.0)
  }

  test("embeddingHealth: a finite norm beyond the fixed-point domain is excluded, not overflowed") {
    // norm 2e19 is finite (no NaN/Inf component) but floor(2e19*2^20)
    // would overflow the ANSI long cast — the row must be counted
    // pathological and excluded from the envelope/mean
    val df = Seq((1L, Seq(2.0e19f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val h = graft.operators.Maintenance.embeddingHealth(df).collect()(0)
    assert(h.getAs[Long]("n_nonfinite") === 1L)
    assert(h.getAs[Double]("norm_max") === 5.0)
    assert(h.getAs[Double]("norm_mean") === 5.0)
  }

  test("embeddingHealth: all-null corpus reports null norm stats, no division error") {
    val df = Seq((1L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val h = graft.operators.Maintenance.embeddingHealth(df).collect()(0)
    assert(h.getAs[Long]("n_null") === 1L)
    assert(h.isNullAt(h.fieldIndex("norm_mean")))
    assert(h.isNullAt(h.fieldIndex("norm_min")))
  }

  test("searchSq8: a null-id row neither returns nor displaces a real candidate") {
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" =!= 0)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val clean = Sq.searchSq8(Sq.quantize(emb), q, k = 10, rerank = 12)
      .select($"vec_id").as[Long].collect().toSeq
    val withNullId = emb.unionByName(
      emb.limit(1).select(lit(null).cast("long").as("vec_id"),
        $"embedding", $"label"))
    val dirty = Sq.searchSq8(Sq.quantize(withNullId), q, k = 10, rerank = 12)
      .select($"vec_id").as[Long].collect().toSeq
    assert(dirty === clean)
  }

  test("two-phase plan: candidate scan reads only (id, code) from a stored-codes table; fetch pushes an id filter") {
    withTempDir("sq8codes") { dir =>
      val emb = Tables.embeddings(spark, sfDir)
      Sq.quantize(emb).write.mode("overwrite").parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
      val candPlan = Sq.sq8Candidates(stored, q, rerank = 32)
        .queryExecution.executedPlan.toString
      val readSchema = candPlan.linesIterator
        .find(_.contains("ReadSchema")).getOrElse("")
      assert(readSchema.contains("sq_code") && !readSchema.contains("embedding"),
        s"candidate scan must not read the f32 column: $readSchema")
      val fetchPlan = Sq.searchSq8(stored, q, k = 10, rerank = 32)
        .queryExecution.executedPlan.toString
      assert(fetchPlan.contains("PushedFilters") && fetchPlan.contains("In(vec_id"),
        s"fetch phase must push the candidate-id filter: $fetchPlan")
      // and the stored-codes path returns the same answer as in-plan quantize
      val viaStored = Sq.searchSq8(stored, q, 10, 32)
        .select($"vec_id").as[Long].collect().toSeq
      val viaInPlan = Sq.searchSq8(Sq.quantize(emb), q, 10, 32)
        .select($"vec_id").as[Long].collect().toSeq
      assert(viaStored === viaInPlan)
    }
  }

  test("searchSq8 guards: rerank >= k") {
    val emb = Tables.embeddings(spark, sfDir)
    intercept[IllegalArgumentException](
      Sq.searchSq8(Sq.quantize(emb), Seq(1.0f), k = 5, rerank = 4))
  }
}
