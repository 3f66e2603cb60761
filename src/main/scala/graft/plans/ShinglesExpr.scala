package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column in one native pass — fused
  * split + sliding-window join, replacing the interpreted
  * `transform(sequence(0, size-n), i -> concat_ws(' ', w[i+1..i+n]))`
  * chain (higher-order lambdas don't codegen; the per-shingle lambda
  * dispatch and element_at calls dominate shingling cost).
  *
  * Semantics exactly match the composed form used by the DuckDB oracle:
  * split on a single space (Java split semantics, trailing empties
  * kept), and texts with fewer than n words yield [text] so short
  * documents still carry a signature.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingles: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Shingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.Shingles.shingle($s, $n)")

  override protected def withNewChildInternal(c: Expression): Shingles =
    copy(child = c)
}

object Shingles {

  private val Space = UTF8String.fromString(" ")

  def shingle(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.split(Space, -1)
    if (words.length < n) {
      new GenericArrayData(Array[Any](text))
    } else {
      val out = new Array[Any](words.length - n + 1)
      var i = 0
      while (i < out.length) {
        val slice = new Array[UTF8String](n)
        System.arraycopy(words, i, slice, 0, n)
        out(i) = UTF8String.concatWs(Space, slice: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(c: Column, n: Int): Column =
    SqlBridge.column(Shingles(SqlBridge.expression(c), n))
}
