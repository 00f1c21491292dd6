package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance for training-data pipelines:
  * merge-by-key upsert (the parquet analog of Delta MERGE) and
  * stratified sampling.
  */
object Refresh {

  /** Upsert: incoming rows replace existing rows with the same key;
    * everything else unions through. Plan: one left-anti join (existing
    * minus incoming keys) + union — the keep-latest-by-key semantics of
    * a MERGE without a transactional table format. At scale the
    * anti-join broadcasts the incoming key set (incremental batches are
    * small relative to the corpus). */
  def upsertByKey(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.join(incoming.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(incoming)

  /** Keep-latest dedup: one row per key, the one with the max version.
    * `tieBreakCols` makes equal-version ties deterministic (ordered
    * ascending after version desc); without them, which duplicate of an
    * exactly-tied version survives is partitioning-dependent. */
  def latestByKey(df: DataFrame, key: String, versionCol: String,
                  tieBreakCols: Seq[String] = Nil): DataFrame = {
    val ordering = col(versionCol).desc +: tieBreakCols.map(col(_).asc)
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Stratified sample: per-stratum fractions with a fixed seed —
    * deterministic for a given (data, seed), the sampling contract a
    * reproducible training-data pipeline needs. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
