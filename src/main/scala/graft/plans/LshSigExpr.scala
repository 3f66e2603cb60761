package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The whole multi-plane LSH signature as ONE native expression:
  * bit b of the result = (v · planes(b) >= 0), for all planes in one
  * codegen loop, the plane matrix shipped as a plan REFERENCE OBJECT.
  *
  * Replaces the composed form `Σ_b when(dot(v, typedLit(plane_b)) >=
  * 0, 1L<<b, 0)` — which was semantically fine but carried nPlanes
  * 64-double array LITERALS per signature column through every
  * optimizer pass. That cost is invisible at plan-build and brutal
  * under AQE: each stage boundary RE-OPTIMIZES the remaining plan, so
  * a probe with 3 tables × 10 planes × (query + index sides) paid
  * ~300 ms of driver-side tree-walking per stage — measured as the
  * whole `q_llm_ann_lsh_persisted` floor (3.5 s wall, 0.43 s of which
  * was task time; PLANS.md r15). A reference object is one opaque
  * leaf: nothing to fold, nothing to re-serialize per task.
  *
  * Arithmetic is BIT-IDENTICAL to the composed form (the gated hashes
  * must not move): per-plane dot = ascending-index fold (the
  * [[DotProduct]] order, = the DuckDB mirror's list_reduce), bit set
  * iff dot >= 0, bits OR'd (≡ the old sum of disjoint powers of two).
  * Quirk mirrored deliberately: a NULL input vector (or a
  * plane-length mismatch) yields signature bits of 0 — the old
  * `when(NULL >= 0, …).otherwise(0)` path — NOT a NULL signature, so
  * rows with NULL vectors keep hashing to bucket 0 rather than
  * vanishing from the index.
  *
  * The raw-array field makes case-class equality reference equality
  * (no subexpression unification between two LshSig instances — each
  * signature column is built once, so nothing relies on it). */
case class LshSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lsh_sig requires array<double>, got ${t.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshSig.sig(planes, v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull}
        ? 0L : graft.plans.LshSig.sig($ref, ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshSig = copy(child = newChild)
}

object LshSig {
  def sig(planes: Array[Array[Double]], v: ArrayData): Long = {
    var out = 0L
    var b = 0
    while (b < planes.length) {
      val w = planes(b)
      if (v.numElements() == w.length) {
        var s = 0.0
        var i = 0
        while (i < w.length) { s += v.getDouble(i) * w(i); i += 1 }
        if (s >= 0) out |= 1L << b
      }
      b += 1
    }
    out
  }

  /** Column-level entry point. */
  def apply(v: Column, planes: Array[Array[Double]]): Column =
    SqlBridge.column(LshSig(SqlBridge.expression(v), planes))
}
