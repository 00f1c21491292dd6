package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.VectorSearch.{Euclidean, Metric}

/** Contrastive training-data mining: hard and semi-hard negatives.
  *
  * An embedding model trained with a triplet/contrastive objective
  * needs, per labeled anchor, negatives that are CLOSE in embedding
  * space but carry a DIFFERENT label — random negatives are too easy
  * and contribute no gradient (FaceNet, CVPR'15; sentence-embedding
  * mining in SBERT). The reference serves embeddings with labels but
  * has no mining surface (reference `vector_search_server/main.py`
  * stops at retrieval); this is the training-data-pipeline leg the
  * builder prompt asks for beyond the reference's own operators.
  *
  * Both miners are declarative: corpus ⨯ broadcast(anchors) with the
  * label predicate pushed below the rank window, so Spark plans a
  * map-side Partial WindowGroupLimit under the exchange — the shuffle
  * carries ≤ partitions·|anchors|·k rows, never |corpus|·|anchors|
  * (the batchTopK/batchMmr scale argument; the anchor set is the
  * small side by construction). Distances ride the f32 sequential
  * kernels ([[graft.functions.VectorExpressions]]) so every value is
  * bit-equal to DuckDB's `list_distance` and the gates hash exactly.
  *
  * Null hygiene, pinned in ContrastiveSpec and mirrored in the oracle
  * SQL: corpus rows with a null id, embedding or label never mine
  * (a label-less row is neither a positive nor a negative — its class
  * is unknown); anchors are required non-null by construction of the
  * anchor frame.
  */
object Contrastive {

  /** Per anchor, the k nearest corpus rows whose label differs from
    * the anchor's — the "hard negative" set.
    *
    * `anchors`: (query_id, query_embedding, query_label), the
    * broadcast side. Returns (query_id, idCol, neg_label, dist, rn)
    * ranked (dist asc, id) 1..k per anchor. The anchor itself can
    * never appear (its label equals itself). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                    metric: Metric = Euclidean,
                    embCol: String = "embedding", idCol: String = "vec_id",
                    labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = corpus
      .where(col(idCol).isNotNull && col(embCol).isNotNull &&
        col(labelCol).isNotNull)
      .crossJoin(broadcast(anchors))
      .where(col(labelCol) =!= col("query_label"))
      .withColumn("dist", metric.dist(col(embCol), col("query_embedding")).cast("double"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc_nulls_last, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col(idCol), col(labelCol).as("neg_label"),
        col("dist"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Per anchor, the distance to its nearest POSITIVE (same label,
    * self excluded) — the reference distance semi-hard mining
    * thresholds against. Anchors with no other same-label row emit no
    * row (and therefore mine nothing downstream). */
  def nearestPositive(corpus: DataFrame, anchors: DataFrame,
                      metric: Metric = Euclidean,
                      embCol: String = "embedding", idCol: String = "vec_id",
                      labelCol: String = "label"): DataFrame =
    corpus
      .where(col(idCol).isNotNull && col(embCol).isNotNull &&
        col(labelCol).isNotNull)
      .crossJoin(broadcast(anchors))
      .where(col(labelCol) === col("query_label") &&
        col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(min(metric.dist(col(embCol), col("query_embedding")).cast("double"))
        .as("pos_dist"))

  /** Semi-hard negatives (the FaceNet band): different-label rows with
    * `pos_dist < dist <= pos_dist + margin` — farther than the nearest
    * positive (so the triplet is not already violated) but within the
    * margin (so it still yields gradient). Ranked (dist asc, id),
    * top-k per anchor; anchors whose band is empty, or that have no
    * positive at all, emit no rows.
    *
    * Two corpus scans by construction (the band needs `pos_dist`
    * before it can filter); both are broadcast-join scans with no
    * corpus shuffle, and the second prunes with the same map-side
    * window limit as [[hardNegatives]]. The margin comparison is pure
    * IEEE double `+`/`<=` — identical in both engines, no fixed point
    * needed. */
  def semiHardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                        margin: Double,
                        metric: Metric = Euclidean,
                        embCol: String = "embedding", idCol: String = "vec_id",
                        labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(margin > 0.0 && !margin.isNaN && !margin.isInfinite,
      s"margin must be a positive finite double, got $margin")
    val pos = nearestPositive(corpus, anchors, metric, embCol, idCol, labelCol)
    val scored = corpus
      .where(col(idCol).isNotNull && col(embCol).isNotNull &&
        col(labelCol).isNotNull)
      .crossJoin(broadcast(anchors))
      .where(col(labelCol) =!= col("query_label"))
      .withColumn("dist", metric.dist(col(embCol), col("query_embedding")).cast("double"))
      .join(broadcast(pos), Seq("query_id"))
      .where(col("dist") > col("pos_dist") &&
        col("dist") <= col("pos_dist") + lit(margin))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc_nulls_last, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col(idCol), col("dist"), col("pos_dist"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }
}
