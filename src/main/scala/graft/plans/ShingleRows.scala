package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (the UDTF extension point, SURVEY.md
  * §2B-11): one output row per word n-gram shingle of a text column —
  * `explode(Shingles(text, n))` fused into a single generator, so the
  * intermediate shingle ARRAY is never materialized per row.
  *
  * Generators run through `GenerateExec` (not whole-stage codegen), so
  * this is the right shape when the per-row fan-out is large and the
  * array would bloat memory; for small fan-outs the Shingles expression
  * + explode composes the same result. CodegenFallback matches how
  * Spark's own collection generators behave outside codegen.
  */
case class ShingleRows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"shingle_rows: n must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_rows requires a string input, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) Nil
    else {
      val arr = Shingles.shingle(text, n)
      (0 until arr.numElements()).iterator
        .map(i => InternalRow(arr.get(i, StringType)))
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleRows =
    copy(child = c)
}

object ShingleRows {
  def apply(c: Column, n: Int): Column =
    SqlBridge.column(ShingleRows(SqlBridge.expression(c), n))
}
