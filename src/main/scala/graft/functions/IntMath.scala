package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.functions._

/** Exact integer column math shared by the bucketing operators.
  * Column `/` detours through double — off-by-one beyond 2^53 — so
  * every bucket/quantize computation routes through SQL integral
  * division instead. */
object IntMath {

  /** SQL `DIV` (truncating integral division) as a Column. */
  def integralDivide(a: Column, b: Column): Column =
    GraftShim.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** floor(a / w) with floorDiv semantics, exact for any long:
    * subtract the positive remainder (`pmod`), then integral-divide
    * the exact multiple — correct for negative `a` where truncating
    * division would round toward zero. */
  def floorDiv(a: Column, w: Long): Column =
    integralDivide(a - pmod(a, lit(w)), lit(w))
}
