package graft.queries

import org.apache.spark.sql.DataFrame

/** Spark↔oracle handoff publication for gate queries: write the one
  * non-SQL artifact (hash buckets, centroids, candidate lists, sketch
  * outputs) to a fixed parquet path and re-read it, so the gate and
  * the DuckDB oracle consume byte-identical inputs (the pack_bpe
  * verify-THROUGH pattern).
  *
  * In BENCH mode (`graft.bench.mode` system property, set by
  * [[graft.Bench]]) the write + read-back are SKIPPED and the frame
  * passes through unchanged: the handoff is correctness-gate
  * plumbing, not operator work, and timing a serialized coalesce(1)
  * parquet write inside the measured window would make bench numbers
  * incomparable with the operator's actual cost. Results are
  * identical either way — the re-read consumes exactly what was
  * written.
  *
  * Paths are fixed per query within one JVM (the oracle SQL embeds
  * them — [[path]] interpolates the same constant into both the Spark
  * write and the SQL string), rooted at `graft.handoff.dir` (default
  * `/tmp`). Overriding the root scopes the artifacts per checkout, so
  * two checkouts can verify on one machine without clobbering each
  * other; within a single root the one-verify-at-a-time contract
  * still applies. */
object Handoff {

  def benchMode: Boolean = sys.props.get("graft.bench.mode").contains("true")

  /** Handoff root directory — `-Dgraft.handoff.dir=...` scopes all
    * handoff artifacts (and the oracle SQL that reads them) per
    * checkout. Read once at class init: the query closures and the
    * `oracleSql` strings must agree within a JVM, so a mid-session
    * property flip must not split them. */
  val root: String = sys.props.getOrElse("graft.handoff.dir", "/tmp")

  /** The one path scheme every handoff artifact uses. */
  def path(name: String): String = s"$root/graft_${name}_handoff.parquet"

  /** Publish `df` at `path` for the oracle and return the re-read
    * frame; in bench mode, return `df` untouched. */
  def publish(df: DataFrame, path: String): DataFrame =
    if (benchMode) df
    else {
      df.coalesce(1).write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
}
