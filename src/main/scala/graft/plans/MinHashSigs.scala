package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All K MinHash signatures of a shingle array in ONE pass — a native
  * expression replacing the explode → h60 → groupBy(min×K) → join-back
  * pipeline (two shuffles, a second cache, and 530k exploded rows at
  * sf0.1) with a single narrow per-document projection.
  *
  * Signature j is `min over shingles x of (a_j * (h60(x) % modP) + b_j)
  * % modP` with the affine constants below — arithmetic chosen to stay
  * under 2^62 (overflow-free in both engines), mirrored verbatim by the
  * DuckDB oracle's `list_min(list_transform(...))`.
  *
  * Scale: the md5 per shingle dominates at any size; this form does the
  * same digest work with zero extra shuffles, and the signature state is
  * K longs per document instead of an exploded row per shingle.
  */
case class MinHashSigs(child: Expression, k: Int, modP: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.sigs(input.asInstanceOf[ArrayData], k, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.MinHashSigs.sigs($s, $k, ${modP}L)")

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

object MinHashSigs {

  /** Affine rehash constants (odd multiplier); shared with the oracle
    * SQL generators.
    */
  def affineA(j: Int): Long = 1103515245L + 2L * j
  def affineB(j: Int): Long = 12345L + 7919L * j

  def sigs(arr: ArrayData, k: Int, modP: Long): GenericArrayData = {
    val md = H60.localMd5.get()
    val acc = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    // Invariant: callers (Shingles) always emit >= 1 shingle. An empty
    // array would yield Long.MaxValue sentinels here but NULL from the
    // DuckDB oracle mirror (list_min of []) — fail loudly rather than
    // silently diverge cross-engine.
    require(n > 0, "minhash_sigs: empty shingle array (oracle mirror yields NULL)")
    var i = 0
    while (i < n) {
      val h = H60.first60Bits(md.digest(arr.getUTF8String(i).getBytes)) % modP
      var j = 0
      while (j < k) {
        val v = (affineA(j) * h + affineB(j)) % modP
        if (v < acc(j)) acc(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  def apply(c: Column, k: Int, modP: Long): Column =
    SqlBridge.column(MinHashSigs(SqlBridge.expression(c), k, modP))
}
