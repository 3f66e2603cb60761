package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word count and distinct-word count of a space-separated text in ONE
  * native pass, packed into a long as `(n_words << 32) | n_distinct` —
  * replacing the `ws = split(norm, " ")` + `size(ws)` +
  * `size(array_distinct(ws))` chain: it skips array_distinct's dedup
  * set AND its second output array. Honest measurement: the isolated
  * gate stage is ~2x cheaper, but end-to-end q_llm_pipeline_batch only
  * moves ~3% (the gate pipelines with the scan) — kept for the
  * allocation win, not claimed as a headline. Consumers unpack with
  * `shiftright`/`bitwiseAND`, both codegen built-ins.
  *
  * Semantics exactly match the composed form (and the DuckDB oracle's
  * `string_split`): split on a single literal space with Java limit -1
  * (trailing empties kept — the empty string has one token, itself);
  * distinctness is exact UTF8String equality, never a hash that could
  * collide.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TokenStats.stats($s)")

  override protected def withNewChildInternal(c: Expression): TokenStats =
    copy(child = c)
}

object TokenStats {

  private val Space = UTF8String.fromString(" ")

  def stats(text: UTF8String): Long = {
    val words = text.split(Space, -1)
    val set = new java.util.HashSet[UTF8String](
      Math.max(16, words.length * 2))
    var i = 0
    while (i < words.length) {
      set.add(words(i))
      i += 1
    }
    (words.length.toLong << 32) | set.size.toLong
  }

  def apply(c: Column): Column =
    SqlBridge.column(TokenStats(SqlBridge.expression(c)))
}
