package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE overflow-guarded exact-sum helper for fixed-point
  * aggregates (shared by [[CorpusModels]]' nll/llr reports and
  * [[Ann.ivfDriftReport]]): Spark's non-ANSI `sum(long)` WRAPS
  * silently, and the 1e9-scale fixed-point products these reports sum
  * are ~1e10 per row — a group with ≳1e9 rows (a few GB of text, a
  * large IVF cell) corrupts the report with no error. Summing in
  * decimal(38,0) is exact at any corpus size; the downcast fail-fasts
  * with an actionable message instead of serving wrapped garbage. */
private[graft] object ExactSums {

  def guardedLongSum(e: Column, name: String): Column = {
    val s = sum(e.cast("decimal(38,0)"))
    when(s.between(lit(Long.MinValue), lit(Long.MaxValue)), s.cast("long"))
      .otherwise(raise_error(lit(s"$name overflows int64 at this corpus " +
        "scale; shard the input and combine partial reports")).cast("long"))
      .as(name)
  }
}
