package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, PartitionedTopK, VectorSearch}

/** ANN + scale-path search queries. `batch_topk_partitioned` is exact
  * (same oracle as the window formulation — the plans differ, the answer
  * must not). The LSH/IVF paths are approximate → rows-only here,
  * recall-verified against exact KNN in scalatest.
  */
object AnnQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-partition-heap batch top-k: identical answer to batch_topk,
    // shuffle reduced from |corpus|x|queries| rows to partitions*q*k.
    "batch_topk_partitioned" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      PartitionedTopK.batchTopK(emb, qs.toSeq, 5).drop("rn")
    },
    // sign-LSH ANN with Hamming-1 multi-probe (rows-only; recall vs
    // exact is scalatest-gated).
    "ann_sign_lsh" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = VectorQueries.qvec(s, dir, 0)
      Ann.searchSignLsh(Ann.withSignBucket(emb, nBits = 12), q, 10, nBits = 12)
        .drop("embedding")
    },
    // IVF ANN: seeded k-means routing, nprobe=4 of 16 clusters
    // (rows-only; recall scalatest-gated). Searches a PERSISTED index —
    // build happens once per fixture dir and is reused, so the gate/bench
    // time the probe-scan over the cluster-partitioned corpus (the path
    // the 100 TB story depends on), not the k-means fit.
    "ann_ivf" -> { (s, dir) =>
      val q = VectorQueries.qvec(s, dir, 0)
      Ann.searchIvf(persistedIvf(s, dir), q, 10, nprobe = 4).drop("embedding")
    },
    // IVF-PQ: same persisted coarse index, corpus re-expressed as
    // 8-byte residual codes, ADC candidate ranking + exact rerank
    // (rows-only; recall/reconstruction are PqSpec-gated). The train +
    // encode here are part of the timed query by design: they are the
    // index-maintenance cost a 100 TB deployment amortizes per WRITE,
    // and at this SF they are sub-second.
    "ann_ivfpq" -> { (s, dir) =>
      val index = persistedIvf(s, dir)
      val model = graft.operators.Pq.train(
        graft.operators.Pq.residuals(index), "residual", m = 8, k = 16)
      val encoded = graft.operators.Pq.encode(index, model)
      graft.operators.Pq.searchIvfPq(encoded, index, model,
        VectorQueries.qvec(s, dir, 0), k = 10, nprobe = 4)
    },
    // incremental index maintenance: assign a "nightly" append slice to
    // the persisted index without refit, then the drift report over
    // corpus+append — the numbers that decide refit-vs-keep-appending
    // (rows-only: k-means centroids are not SQL-expressible; the
    // assignment==MLlib invariant and drift behavior are AnnSpec-gated)
    "ann_ivf_append" -> { (s, dir) =>
      val index = persistedIvf(s, dir)
      val newRows = Tables.embeddings(s, dir)
        .where(col("vec_id") % 10 === 0)
        .select(col("vec_id") + 1000000, col("embedding"))
        .toDF("vec_id", "embedding")
      val appended = Ann.assignToIvf(index, newRows)
      val union = index.assigned
        .select(col("vec_id"), col("embedding"), col("ivf_cluster"))
        .unionByName(appended)
      Ann.ivfDriftReport(index.copy(assigned = union))
        .orderBy(col("ivf_cluster"))
    },
    // embedding-space domain discovery: per-cluster census over the
    // SAME persisted IVF index the ANN path searches (one k-means fit
    // serves both). Rows-only: k-means is not SQL-expressible; planted-
    // cluster purity + determinism are ClusteringSpec-gated.
    "cluster_domains" -> { (s, dir) =>
      graft.operators.Clustering.clusterProfile(persistedIvf(s, dir))
    }
  )

  /** Build-once cache of the IVF index for a fixture dir (seeded k-means
    * → identical index whether freshly built or loaded). Lives under the
    * JVM tmpdir, like a real deployment's index directory next to its
    * table. The cache key fingerprints the corpus file (path + mtime +
    * length), so a regenerated fixture at the same path gets a fresh
    * index instead of silently serving stale data; the build is
    * serialized JVM-wide so concurrent specs can't race the
    * check-then-build. */
  def persistedIvf(s: SparkSession, dir: String, numClusters: Int = 16): Ann.IvfIndex = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|${src.lastModified}|${src.length}".getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
    val path = s"${sys.props("java.io.tmpdir")}/graft-ivf-$fp-k$numClusters"
    ivfBuildLock.synchronized {
      if (!new java.io.File(s"$path/corpus/_SUCCESS").exists())
        Ann.saveIvf(Ann.buildIvf(Tables.embeddings(s, dir), numClusters), path)
    }
    Ann.loadIvf(s, path)
  }
  private val ivfBuildLock = new Object

  // exact operator → literally the same oracle as the window formulation
  // (shared reference, so the two specs can never diverge)
  val oracle: Map[String, String] = Map(
    "batch_topk_partitioned" -> VectorQueries.oracle("batch_topk"))
}
