package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two array<double> columns.
  *
  * Semantically identical to the higher-order formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,e) -> acc+e)` —
  * same strict left-to-right accumulation order, so results stay
  * bit-identical to the DuckDB `list_reduce` oracle mirror — but compiled
  * into a tight loop inside whole-stage codegen instead of interpreted
  * lambda dispatch. Measured ~10x on the pairwise-similarity queries
  * (200k-1.25M pairs x 64 dims at sf0.1), and the gap widens at cluster
  * scale where the pair count is billions.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. Inputs must already be array<double>. */
  def apply(a: Column, b: Column): Column =
    SqlBridge.column(
      DotProduct(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Expose as a SQL function (`dot_product(a, b)`) in the session's
    * function registry.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
