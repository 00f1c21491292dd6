package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ZipIngest

/** SQL-callable zip explode (SURVEY §4.3.4: a `Generator`-based UDTF for
  * B2): `SELECT zip_path, explode_zip(content) FROM zips` yields one
  * (member_name, member_bytes) row per archive member, with the B3
  * name-decode chain applied. Generators run row-at-a-time over binary
  * payloads (no per-element codegen win to be had) → CodegenFallback.
  */
case class ExplodeZip(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("member_name", StringType, nullable = false),
    StructField("member_bytes", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"explode_zip requires a binary argument, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) Nil
    else ZipIngest.explodeZip(bytes).map { case (name, content) =>
      InternalRow(UTF8String.fromString(name), content)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}
