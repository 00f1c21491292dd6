package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq, VectorSearch}

/** IVF-PQ spec: reconstruction beats coarse-only quantization, codes
  * are m bytes, training is deterministic, and ADC search recall holds
  * on clustered data with exact rerank. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def normed(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  // 20 clusters x 30 members in 64 dims — the structured regime ANN is for
  private lazy val rows: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(normed(Array.fill(64)(rnd.nextGaussian().toFloat)))
    for {
      c <- centers.indices
      m <- 0 until 30
    } yield {
      val v = normed(centers(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      (c.toLong * 100 + m, v.toSeq)
    }
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var d = 0
    while (d < a.length) { val x = a(d) - b(d); acc += x * x; d += 1 }
    acc
  }

  test("codes are m bytes (32x smaller than the raw vector)") {
    val df = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvf(df, numClusters = 8)
    val model = Pq.train(Pq.residuals(index), "residual", m = 8, k = 16)
    val code = Pq.encode(index, model).select("pq_code").as[Array[Byte]].head()
    assert(code.length === 8) // vs 64 floats = 256 bytes
  }

  test("training is deterministic under a fixed seed") {
    val df = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvf(df, numClusters = 8)
    val res = Pq.residuals(index)
    val a = Pq.train(res, "residual", m = 8, k = 16, seed = 42L)
    val b = Pq.train(res, "residual", m = 8, k = 16, seed = 42L)
    assert(a.codebooks.flatten.flatten.toSeq === b.codebooks.flatten.flatten.toSeq)
  }

  test("PQ reconstruction error is well below coarse-only error") {
    val df = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvf(df, numClusters = 8)
    val model = Pq.train(Pq.residuals(index), "residual", m = 8, k = 16)
    val encoded = Pq.encode(index, model)
      .select(col("embedding"), col("ivf_cluster"), col("pq_code"))
      .as[(Seq[Float], Int, Array[Byte])].collect()
    val (pqErr, coarseErr) = encoded.foldLeft((0.0, 0.0)) {
      case ((pe, ce), (v, c, code)) =>
        val va = v.toArray
        val coarse = index.centroids(c)
        (pe + l2(va, Pq.decode(model, coarse, code)), ce + l2(va, coarse))
    }
    assert(pqErr < coarseErr * 0.5,
      s"PQ reconstruction $pqErr not clearly below coarse-only $coarseErr")
  }

  test("IVF-PQ search recall@10 >= 0.8 vs exact on clustered data") {
    val df = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvf(df, numClusters = 8)
    val model = Pq.train(Pq.residuals(index), "residual", m = 8, k = 16)
    val encoded = Pq.encode(index, model).cache()
    try {
      val recalls = (0 until 5).map { c =>
        val q = rows(c * 30)._2
        val exact = VectorSearch.topKWithScore(df, q, 10)
          .select("vec_id").as[Long].collect().toSet
        val approx = Pq.searchIvfPq(encoded, index, model, q, k = 10,
            nprobe = 3, refine = 4)
          .select("vec_id").as[Long].collect().toSet
        exact.intersect(approx).size / 10.0
      }
      val mean = recalls.sum / recalls.length
      assert(mean >= 0.8, s"mean recall $mean (per-query: $recalls)")
    } finally encoded.unpersist()
  }

  test("exact rerank orders the final k by true distance") {
    val df = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvf(df, numClusters = 8)
    val model = Pq.train(Pq.residuals(index), "residual", m = 8, k = 16)
    val encoded = Pq.encode(index, model)
    val out = Pq.searchIvfPq(encoded, index, model, rows.head._2, k = 5,
        nprobe = 3).select("dist").as[Double].collect()
    assert(out.length === 5)
    assert(out.sameElements(out.sorted))
  }

  test("guards: k > 256 and non-divisible dim are rejected") {
    val df = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvf(df, numClusters = 4)
    intercept[IllegalArgumentException] {
      Pq.train(Pq.residuals(index), "residual", m = 8, k = 300)
    }
    intercept[IllegalArgumentException] {
      Pq.train(Pq.residuals(index), "residual", m = 7, k = 16)
    }
  }
}
