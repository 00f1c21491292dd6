package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection size of two SORTED arrays by merge-scan — the EXACT
  * set-intersection kernel, exposed to SQL as `sorted_intersect_size`
  * via GraftExtensions. Supports `array<string>` (token sets) and
  * `array<bigint>` (hashed token sets, the `Dedup.jaccardPairsPrefix`
  * verify step).
  *
  * `size(array_intersect(a, b))` builds a hash set per row pair; with
  * both sides sorted once per document the per-pair cost drops to one
  * O(n+m) pointer walk inside whole-stage codegen. Duplicate runs are
  * skipped after each match, so the result has SET semantics (equals
  * `size(array_intersect(a, b))`) even if a hash collision or caller
  * slip leaves duplicates. Caller contract: inputs sorted ascending
  * (`array_sort`); null elements sort last and end the scan.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(et @ (StringType | LongType), _) => Some(et)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0
    val n = a.numElements(); val m = b.numElements()
    val longs = elemType == LongType
    // array_sort places null elements LAST: hitting one on either side
    // means no further non-null matches exist — stop, don't NPE
    var stop = false
    while (!stop && i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) stop = true
      else {
        val c =
          if (longs) java.lang.Long.compare(a.getLong(i), b.getLong(j))
          else a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) {
          cnt += 1
          // skip duplicate runs of the matched value on both sides (set
          // semantics under duplicates)
          if (longs) {
            val v = a.getLong(i)
            while (i < n && !a.isNullAt(i) && a.getLong(i) == v) i += 1
            while (j < m && !b.isNullAt(j) && b.getLong(j) == v) j += 1
          } else {
            val v = a.getUTF8String(i)
            while (i < n && !a.isNullAt(i) && a.getUTF8String(i).equals(v)) i += 1
            while (j < m && !b.isNullAt(j) && b.getUTF8String(j).equals(v)) j += 1
          }
        }
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
      val v = ctx.freshName("v")
      val (cmp, skipDup) = elemType match {
        case LongType => (
          s"int $c = java.lang.Long.compare($a.getLong($i), $b.getLong($j));",
          s"""long $v = $a.getLong($i);
             |while ($i < $n && !$a.isNullAt($i) && $a.getLong($i) == $v) { $i++; }
             |while ($j < $m && !$b.isNullAt($j) && $b.getLong($j) == $v) { $j++; }""".stripMargin)
        case _ => (
          s"int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));",
          s"""org.apache.spark.unsafe.types.UTF8String $v = $a.getUTF8String($i);
             |while ($i < $n && !$a.isNullAt($i) && $a.getUTF8String($i).equals($v)) { $i++; }
             |while ($j < $m && !$b.isNullAt($j) && $b.getUTF8String($j).equals($v)) { $j++; }""".stripMargin)
      }
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) break;
         |  $cmp
         |  if ($c == 0) {
         |    $cnt++;
         |    $skipDup
         |  }
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
