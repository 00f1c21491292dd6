package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point — registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `Graft.init(spark)` programmatically) makes them available to pure
  * SQL users: `SELECT cos_sim_f32(embedding, q) ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (es: Seq[Expression]) => build(es))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("dot_f32", es => DotProductF32(es(0), es(1))))
    ext.injectFunction(fn("l2_dist_f32", es => EuclideanDistF32(es(0), es(1))))
    ext.injectFunction(fn("l2sq_f32", es => L2SqF32(es(0), es(1))))
    ext.injectFunction(fn("cos_sim_f32", es => CosineSimF32(es(0), es(1))))
    ext.injectFunction(fn("sorted_intersect_size", es => SortedIntersectSize(es(0), es(1))))
    ext.injectFunction(fn("explode_zip", es => ExplodeZip(es(0))))
  }
}

/** Programmatic init for sessions created without the extensions conf. */
object Graft {
  def init(spark: SparkSession): Unit = {
    VectorFunctions.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size", es => SortedIntersectSize(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_zip", es => ExplodeZip(es(0)), "built-in")
  }
}
