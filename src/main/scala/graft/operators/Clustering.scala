package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space domain discovery: profile a k-means clustering of
  * the corpus.
  *
  * Training pipelines cluster document embeddings to discover topical
  * domains, then weight/sample per cluster (cf. the temperature mixing
  * in [[Refresh.temperatureMix]], which consumes exactly this kind of
  * per-domain census). The clustering itself reuses [[Ann.buildIvf]] —
  * one seeded MLlib k-means fit, one narrow assignment map — so an
  * already-persisted IVF search index doubles as the domain model at
  * zero extra cost.
  *
  * Scale shape: the profile is two tiny-cardinality aggregations over
  * the assigned corpus — (cluster) and (cluster, label) hash-aggs,
  * both map-side combined to ~k and k·|labels| rows before any
  * shuffle; centroids ride in via a broadcast of k rows. Nothing here
  * moves corpus-sized data.
  */
object Clustering {

  /** Per-cluster census over an IVF-assigned corpus: size, mean
    * distance-to-centroid (cohesion), dominant value of `labelCol`
    * and its share. Output ordered by (n desc, cluster_id) — a stable
    * total order even though k-means cluster ids are arbitrary. */
  def clusterProfile(index: Ann.IvfIndex, labelCol: String = "label")
      : DataFrame = {
    val spark = index.assigned.sparkSession
    val centDf = Ann.centroidsDf(spark, index.centroids, "ivf_cluster")
      .withColumnRenamed("centroid", "__centroid")

    // ONE corpus pass: broadcast-join centroids, then a (cluster, label)
    // hash-agg carrying both the census counts and the distance sums;
    // the second-level agg runs over ~k·|labels| rows only. Distances
    // accumulate in [[Ann.fp]] fixed point (longs — exact, associative)
    // so mean_dist is bit-stable under any partitioning and DuckDB can
    // replay it from the same per-row f32 kernel values.
    val perLabel = index.assigned
      .join(broadcast(centDf), Seq("ivf_cluster"))
      .withColumn("dist", Ann.fp(
        graft.functions.VectorFunctions.l2DistF32(
          col(index.embCol), col("__centroid")).cast("double")))
      .groupBy(col("ivf_cluster"), col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("ln"), sum(col("dist")).as("sd"))

    perLabel.groupBy(col("ivf_cluster"))
      .agg(sum(col("ln")).as("n"),
        (sum(col("sd")).cast("double") /
          (sum(col("ln")) * Ann.FpScale).cast("double")).as("mean_dist"),
        max_by(col("lbl"), struct(col("ln"), col("lbl"))).as("majority_label"),
        max(struct(col("ln"), col("lbl"))).getField("ln").as("mn"))
      .select(col("ivf_cluster").cast("long").as("cluster_id"),
        col("n"), col("mean_dist"), col("majority_label"),
        (col("mn").cast("double") / col("n")).as("majority_frac"))
      .orderBy(col("n").desc, col("cluster_id"))
  }
}
