package graft

import graft.operators.{Ann, Bm25}
import graft.queries.{AnnQueries, HybridQueries, VectorQueries}
import graft.serving.Serving

/** Driver-side serving probe path: result parity with the Spark
  * operators over the SAME persisted index layouts, plus the latency
  * property that justifies its existence (no Spark job on the read
  * path). */
class ServingSpec extends SparkSpec {
  import spark.implicits._

  private def ivfPath: String = AnnQueries.persistedIvfPath(spark, sfDir)

  test("IVF serving probe == Spark searchIvf, hit for hit") {
    val path = ivfPath
    val q = VectorQueries.qvec(spark, sfDir, 0)
    val index = Ann.loadIvf(spark, path)
    val viaSpark = Ann.searchIvf(index, q, 10, nprobe = 4)
      .select($"vec_id", $"label", $"ivf_cluster".cast("int"), $"dist")
      .as[(Long, Int, Int, Double)].collect().toSeq
    val viaServing = Serving.searchIvf(path, q.toArray, 10, nprobe = 4)
      .map(h => (h.vecId, h.label, h.cluster, h.dist))
    assert(viaServing === viaSpark)
  }

  test("BM25 serving probe == Spark searchPersistedIndex, hit for hit") {
    val path = HybridQueries.persistedBm25(spark, sfDir)
    val terms = Seq("vector", "hash", "join")
    val viaSpark = Bm25.searchPersistedIndex(spark, path, terms, k = 20,
        rationalIdf = true)
      .as[(Long, Long, Long)].collect().toSeq
    val viaServing = Serving.searchBm25(path, terms, k = 20)
      .map(h => (h.id, h.bm25Fp, h.nTerms))
    assert(viaServing === viaSpark)
  }

  test("serving probe answers without a Spark job, well under the job floor") {
    val path = ivfPath
    val q = VectorQueries.qvec(spark, sfDir, 0).toArray
    Serving.searchIvf(path, q, 10, nprobe = 4) // warm (FS metadata, classloading)
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val hits = Serving.searchIvf(path, q, 10, nprobe = 4)
    val servingMs = (System.nanoTime() - t0) / 1e6
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(hits.size === 10)
    assert(jobsAfter === jobsBefore, "serving probe must not launch Spark jobs")
    info(f"serving probe latency: $servingMs%.1f ms (warm)")
    // generous bound — the point is the ORDER of magnitude vs a Spark
    // job's ~100ms+ floor; single-digit ms is typical at this SF
    assert(servingMs < 500.0, f"serving probe took $servingMs%.1f ms")
  }
}
