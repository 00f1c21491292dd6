package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (SURVEY §4 / the 100 TB design point: AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting is the deterministic
  * fallback and the only option for aggregation-free fan-in joins).
  *
  * `saltedJoin` equi-joins `left` and `right` on `key` with the LEFT
  * side's hot keys spread over `saltFactor` sub-keys:
  *  - left rows get salt = hash(whole row) % saltFactor (deterministic,
  *    no RNG — rerun-stable);
  *  - right rows are replicated saltFactor times (one per salt value),
  *  so every left sub-partition finds its match. Result is exactly the
  * plain join's row multiset; only the partitioning changes. Use when
  * the build side is too big to broadcast AND a few keys dominate.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right_outer/full_outer would surface every unmatched right-side
    // REPLICA as a spurious null-extended row — only left-anchored join
    // types preserve the plain join's row multiset under replication
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin supports left-anchored join types only, got '$joinType' " +
        "(replicating the right side breaks right/full outer semantics)")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation for extreme single-key skew where
    * even map-side partial aggregation leaves one hot reduce partition:
    * phase 1 aggregates (key, salt) partials, phase 2 merges per key.
    * For algebraic aggregates only — caller supplies both phases. */
  def saltedAggregate(df: DataFrame, key: String, saltFactor: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val phase1 = partial(salted.groupBy(col(key), col("__salt")))
    merge(phase1.groupBy(col(key)))
  }
}
