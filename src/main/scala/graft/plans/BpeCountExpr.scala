package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Bpe

/** BPE token count of a string column under a trained [[Bpe.Model]].
  *
  * The model rides the expression as a referenced object (the same way
  * Spark's own regexp expressions carry their compiled Pattern), so the
  * whole-stage-generated loop calls straight into the JVM kernel with
  * zero per-row setup — no UDF wrapping, no serialization per batch,
  * and the operator stays inside the codegen'd stage. The kernel's
  * per-word memo makes the per-row cost proportional to NEW word types
  * seen, not words scanned.
  */
case class BpeCount(child: Expression, model: Bpe.Model)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String].toString, model)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      classOf[Bpe.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.Bpe.countTokens($c.toString(), $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  /** Column-level entry point. */
  def apply(text: Column, model: Bpe.Model): Column =
    SqlBridge.column(BpeCount(SqlBridge.expression(text), model))
}
