package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection size of two SORTED, DISTINCT string arrays by merge-scan
  * — the EXACT set-intersection kernel, exposed to SQL as
  * `sorted_intersect_size` via GraftExtensions.
  *
  * `size(array_intersect(a, b))` builds a hash set per row pair; with
  * both sides sorted once per document the per-pair cost drops to one
  * O(n+m) pointer walk inside whole-stage codegen. Note:
  * `Dedup.jaccardPairs` defaults to an even faster 64-bit-token-hash
  * intersection (collision odds ~n²/2^65); this expression is the
  * collision-free alternative for callers that need provable exactness.
  * Caller contract: inputs sorted ascending and duplicate-free
  * (`array_sort(array_distinct(...))`); output then equals
  * `size(array_intersect(a, b))`.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0
    val n = a.numElements(); val m = b.numElements()
    // array_sort places null elements LAST: hitting one on either side
    // means no further non-null matches exist — stop, don't NPE
    var stop = false
    while (!stop && i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) stop = true
      else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt"); val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) break;
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object ArrayFunctions {
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectSize(GraftShim.expression(a), GraftShim.expression(b)))
}
