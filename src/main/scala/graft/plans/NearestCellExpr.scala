package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Per-row nearest-centroid argmin over a BROADCAST centroid array —
  * the assignment step of k-means / IVF cell building, fused into one
  * codegen expression so the corpus never leaves its scan.
  *
  * `left` = the row's vector (array<double>); `right` = the centroid
  * table collapsed to ONE array<struct<cid:int, cv:array<double>>>
  * value (a one-row crossJoin(broadcast(...)) operand). Returns the cid
  * minimizing squared L2 distance, ties to the SMALLEST cid — exactly
  * the `row_number() over (order by d2, cid) = 1` semantics of the
  * explode-then-window formulation it replaces, with bit-identical
  * arithmetic: d2 = (v·v - 2.0·(v·c)) + c·c, each dot accumulated
  * strictly left-to-right like [[DotProduct]]. Distances compare via
  * `java.lang.Double.compare`, so a NaN distance (NaN vector
  * components) sorts LAST — the window's sort order — rather than
  * freezing the first NaN candidate as IEEE `<` would; among all-NaN
  * candidates the cid tiebreak applies, again like the window.
  *
  * Why it exists: the old Lloyd-assignment plan
  * (corpus.crossJoin(broadcast(centroids)) → window(vec_id) → rn=1)
  * explodes N×nlist rows through a corpus-sized shuffle PER PASS — at
  * 64 cells that is a 64×-amplified exchange repeated every training
  * iteration and once more for the final assignment. This expression
  * makes assignment a map-only pass: at 100 TB of embeddings the
  * difference between 3 corpus×64 shuffles and zero. Centroid-count ×
  * dims stays KBs, so the one-row broadcast is free.
  *
  * Entries whose vector length differs from the row's — and entries
  * with a NULL cid or cv field, which only hand-written SQL against
  * the registered function can produce — are skipped (the composed
  * form yields NULL d2 there; no engine caller produces either); an
  * empty or all-skipped centroid array yields NULL.
  */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  // nullable even for non-null children: empty centroid array -> NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 =>
        fs(0).dataType == IntegerType && vecOk(fs(1).dataType)
      case _ => false
    }
    if (vecOk(left.dataType) && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cell requires (array<double>, " +
        "array<struct<cid:int, cv:array<double>>>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val vn = vec.numElements()
    var dvv = 0.0
    var i = 0
    while (i < vn) { val x = vec.getDouble(i); dvv += x * x; i += 1 }
    var best = -1
    var bestD = 0.0
    var found = false
    val n = cents.numElements()
    var c = 0
    while (c < n) {
      // skip null entries AND entries with a null cid/cv field (the
      // registered SQL function accepts arbitrary struct literals, so
      // the fields are nullable even though no engine caller produces
      // them — reading a null field would NPE interpreted and yield
      // garbage under codegen)
      if (!cents.isNullAt(c)) {
        val row = cents.getStruct(c, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val cv = row.getArray(1)
        if (cv.numElements() == vn) {
          val cid = row.getInt(0)
          var dvc = 0.0
          var dcc = 0.0
          var j = 0
          while (j < vn) {
            val y = cv.getDouble(j)
            dvc += vec.getDouble(j) * y
            dcc += y * y
            j += 1
          }
          val d2 = (dvv - 2.0 * dvc) + dcc
          // Double.compare, not <: a NaN distance (NaN vector
          // components) must rank LAST — Spark's sort order for the
          // row_number-over-(d2, cid) window this argmin replaces —
          // where IEEE < would freeze the first NaN candidate in
          // (every later comparison false). All-NaN ties fall through
          // to the cid tiebreak, again matching the window sort.
          val cmp = java.lang.Double.compare(d2, bestD)
          if (!found || cmp < 0 || (cmp == 0 && cid < best)) {
            found = true; bestD = d2; best = cid
          }
        }
        }
      }
      c += 1
    }
    if (!found) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val vn = ctx.freshName("vn")
      val dvv = ctx.freshName("dvv")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val cid = ctx.freshName("cid")
      val dvc = ctx.freshName("dvc")
      val dcc = ctx.freshName("dcc")
      val j = ctx.freshName("j")
      val y = ctx.freshName("y")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val found = ctx.freshName("found")
      val cmp = ctx.freshName("cmp")
      s"""
        int $vn = $a.numElements();
        double $dvv = 0.0;
        for (int $i = 0; $i < $vn; $i++) {
          double $y = $a.getDouble($i);
          $dvv += $y * $y;
        }
        int $best = -1;
        double $bestD = 0.0;
        boolean $found = false;
        int $n = $b.numElements();
        for (int $c = 0; $c < $n; $c++) {
          if ($b.isNullAt($c)) continue;
          org.apache.spark.sql.catalyst.InternalRow $row = $b.getStruct($c, 2);
          if ($row.isNullAt(0) || $row.isNullAt(1)) continue;
          org.apache.spark.sql.catalyst.util.ArrayData $cv = $row.getArray(1);
          if ($cv.numElements() != $vn) continue;
          int $cid = $row.getInt(0);
          double $dvc = 0.0;
          double $dcc = 0.0;
          for (int $j = 0; $j < $vn; $j++) {
            double $y = $cv.getDouble($j);
            $dvc += $a.getDouble($j) * $y;
            $dcc += $y * $y;
          }
          double $d2 = ($dvv - 2.0 * $dvc) + $dcc;
          // Double.compare ranks NaN last, matching the window sort
          // this argmin replaces (see nullSafeEval)
          int $cmp = java.lang.Double.compare($d2, $bestD);
          if (!$found || $cmp < 0 || ($cmp == 0 && $cid < $best)) {
            $found = true; $bestD = $d2; $best = $cid;
          }
        }
        if (!$found) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

object NearestCell {
  /** Column-level entry point: `v` array<double>, `cents`
    * array<struct<cid:int, cv:array<double>>>. */
  def apply(v: Column, cents: Column): Column =
    SqlBridge.column(
      NearestCell(SqlBridge.expression(v), SqlBridge.expression(cents)))
}
