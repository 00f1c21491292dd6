package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Bq

/** Binary quantization: bit rule + packing, symmetric Hamming and
  * asymmetric fixed-point kernels vs naive references, the two-phase
  * search contract, and recall sanity of the 1-bit candidate cut. */
class BqSpec extends SparkSpec {
  import spark.implicits._

  test("bit rule: positive finite -> 1; zero, negative, NaN, Inf -> 0") {
    val c = Bq.bqCodes(Array(1.0f, -1.0f, 0.0f, -0.0f, Float.NaN,
      Float.PositiveInfinity, Float.NegativeInfinity, 0.5f))
    // LSB-first: bits 0 and 7 set -> 0b10000001
    assert(c.toSeq === Seq[Byte](0x81.toByte))
  }

  test("packing: LSB-first, ceil(d/8) bytes, pad bits zero") {
    val c = Bq.bqCodes(Array(1f, 0f, 1f, 0f, 0f, 0f, 0f, 0f, 1f, 1f))
    assert(c.length === 2)
    assert(c(0) === 0x05.toByte) // dims 0,2
    assert(c(1) === 0x03.toByte) // dims 8,9; pad bits 10..15 zero
  }

  test("hamming: packed popcount equals the naive disagreement count") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val d = 1 + rnd.nextInt(130)
      val a = Array.fill(d)(rnd.nextFloat() - 0.5f)
      val b = Array.fill(d)(rnd.nextFloat() - 0.5f)
      val naive = (0 until d).count(i =>
        (a(i) > 0f) != (b(i) > 0f))
      assert(Bq.hamming(Bq.bqCodes(a), Bq.bqCodes(b)) === naive,
        s"dim $d")
    }
  }

  test("adotFp matches a BigInt reference on random inputs") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val d = 1 + rnd.nextInt(100)
      val doc = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val q = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val qfp = Bq.qFixedPoint(q)
      val ref = (0 until d).map { i =>
        val bit = if (java.lang.Float.isFinite(doc(i)) && doc(i) > 0f) 1 else 0
        BigInt(2 * bit - 1) * BigInt(qfp(i))
      }.sum
      assert(BigInt(Bq.adotFp(Bq.bqCodes(doc), qfp)) === ref)
    }
  }

  test("qFixedPoint rejects non-finite queries (the engines fork on floor(NaN))") {
    intercept[IllegalArgumentException](Bq.qFixedPoint(Array(Float.NaN)))
    intercept[IllegalArgumentException](
      Bq.qFixedPoint(Array(Float.PositiveInfinity)))
  }

  test("quantize: null embedding stays null; code column is BinaryType; d/8 bytes") {
    val df = Seq((1L, Seq.fill(64)(1.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val q = Bq.quantize(df)
    assert(q.schema("bq_code").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val rows = q.orderBy($"vec_id").select($"bq_code").collect()
    assert(rows(0).getAs[Array[Byte]](0).length === 8)
    assert(rows(1).get(0) == null)
  }

  test("searchBq returns k rows in (cos_sim desc, id) order with exact integer dots") {
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" =!= 0)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val out = Bq.searchBq(Bq.quantize(emb), q, k = 10, rerank = 96)
      .select($"vec_id", $"adot_fp", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.size === 10)
    assert(out.map(r => (-r._3, r._1)) === out.map(r => (-r._3, r._1)).sorted)
    val all = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (i, e) => i -> Bq.bqCodes(e.toArray) }.toMap
    val qfp = Bq.qFixedPoint(q.toArray)
    out.foreach { case (id, dot, _) => assert(dot === Bq.adotFp(all(id), qfp)) }
  }

  test("1-bit candidate ranking with 96-oversample reaches recall@10 >= 0.9 vs exact cosine") {
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" =!= 0)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val approx = Bq.searchBq(Bq.quantize(emb), q, k = 10, rerank = 96)
      .select($"vec_id").as[Long].collect().toSet
    val exact = emb
      .withColumn("cs", cosSimF32($"embedding", typedLit(q)).cast("double"))
      .orderBy($"cs".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (approx & exact).size / 10.0
    info(f"BQ recall@10 = $recall%.2f")
    assert(recall >= 0.9, s"BQ with 96-candidate oversample got $recall")
  }

  test("searchBq: a null-id row neither returns nor displaces a real candidate") {
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" =!= 0)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
    val clean = Bq.searchBq(Bq.quantize(emb), q, k = 10, rerank = 12)
      .select($"vec_id").as[Long].collect().toSeq
    val withNullId = emb.unionByName(
      emb.limit(1).select(lit(null).cast("long").as("vec_id"),
        $"embedding", $"label"))
    val dirty = Bq.searchBq(Bq.quantize(withNullId), q, k = 10, rerank = 12)
      .select($"vec_id").as[Long].collect().toSeq
    assert(dirty === clean)
  }

  test("two-phase plan: candidate scan reads only (id, bq_code) from stored codes; fetch pushes the id filter") {
    withTempDir("bqcodes") { dir =>
      val emb = Tables.embeddings(spark, sfDir)
      Bq.quantize(emb).write.mode("overwrite").parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      val q = graft.queries.VectorQueries.qvec(spark, sfDir, 0)
      val candPlan = Bq.bqCandidates(stored, q, rerank = 96)
        .queryExecution.executedPlan.toString
      val readSchema = candPlan.linesIterator
        .find(_.contains("ReadSchema")).getOrElse("")
      assert(readSchema.contains("bq_code") && !readSchema.contains("embedding"),
        s"candidate scan must not read the f32 column: $readSchema")
      val fetchPlan = Bq.searchBq(stored, q, k = 10, rerank = 96)
        .queryExecution.executedPlan.toString
      assert(fetchPlan.contains("PushedFilters") && fetchPlan.contains("In(vec_id"),
        s"fetch phase must push the candidate-id filter: $fetchPlan")
      val viaStored = Bq.searchBq(stored, q, 10, 96)
        .select($"vec_id").as[Long].collect().toSeq
      val viaInPlan = Bq.searchBq(Bq.quantize(emb), q, 10, 96)
        .select($"vec_id").as[Long].collect().toSeq
      assert(viaStored === viaInPlan)
    }
  }

  test("searchIvfBq: nprobe=ALL + corpus-wide rerank equals exact cosine top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val idx = graft.operators.Ann.buildIvf(emb, numClusters = 8)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 3)
    val got = Bq.searchIvfBq(idx, q, k = 10, rerank = 500, nprobe = 8)
      .select($"vec_id").as[Long].collect().toSeq
    val exact = emb
      .withColumn("cs", cosSimF32($"embedding", typedLit(q)).cast("double"))
      .orderBy($"cs".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === exact)
  }

  test("searchIvfBq: results come only from the probed clusters") {
    val emb = Tables.embeddings(spark, sfDir)
    val idx = graft.operators.Ann.buildIvf(emb, numClusters = 8)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 3)
    val probed = graft.operators.Ann.rankProbes(idx.centroids, q.toArray, 2).toSet
    val clusters = Bq.searchIvfBq(idx, q, k = 10, rerank = 64, nprobe = 2)
      .select($"ivf_cluster".cast("int")).as[Int].collect().toSet
    assert(clusters.subsetOf(probed))
  }

  test("searchBq guards: rerank >= k") {
    val emb = Tables.embeddings(spark, sfDir)
    intercept[IllegalArgumentException](
      Bq.searchBq(Bq.quantize(emb), Seq(1.0f), k = 5, rerank = 4))
  }
}
