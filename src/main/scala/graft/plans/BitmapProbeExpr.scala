package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/** Bit-probe of a driver-built bitmap shipped as a Spark BROADCAST —
  * the bitmap-frontier BFS's per-round frontier test
  * ([[graft.operators.Bfs.hopDistanceBitmap]]).
  *
  * The broadcast handle rides the expression as a referenced object
  * (the compiled-Pattern discipline of [[BpeCount]]), so the PLAN stays
  * bytes-constant however large the bitmap: a `typedLit` words array
  * would serialize the whole bitmap into the plan shipped with EVERY
  * task (32 MB at the 2^28-id cap — the r13-shipped form's hidden
  * cost), where a broadcast moves once per executor over the torrent
  * protocol and is shared by all of its tasks. `value()` resolves
  * lazily executor-side into a codegen mutable slot, and the generated
  * loop probes the long[] with native shift/mask ops.
  *
  * The domain guard is STRUCTURAL: an id outside [0, maxId) throws
  * from inside the probe itself — not from a sibling `assert_true`
  * conjunct whose left-to-right evaluation Catalyst is free to
  * reorder (a reordered And could let a negative id's word/bit
  * arithmetic silently alias another node's frontier bit). A NULL id
  * throws by the same rule (not null-safe NULL-out, which as a filter
  * predicate would SILENTLY drop the edge — the declared domain
  * [0, maxId) has no NULL member, so a NULL src is out of domain like
  * any other foreign id; pre-filter NULL edges if dropping is meant).
  */
case class BitmapContains(child: Expression,
                          bm: Broadcast[Array[Long]],
                          maxId: Long) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_contains requires a bigint id, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) BitmapContains.nullId()
    else BitmapContains.probe(bm.value, v.asInstanceOf[Long], maxId)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("frontierBc", bm,
      classOf[Broadcast[Array[Long]]].getName)
    val words = ctx.addMutableState("long[]", "bmWords",
      v => s"$v = (long[]) $ref.value();")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      if (${childGen.isNull}) graft.plans.BitmapContains.nullId();
      boolean ${ev.value} = graft.plans.BitmapContains.probe(
        $words, ${childGen.value}, ${maxId}L);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BitmapContains = copy(child = newChild)
}

object BitmapContains {
  def probe(words: Array[Long], id: Long, maxId: Long): Boolean = {
    if (id < 0L || id >= maxId)
      throw new IllegalArgumentException(
        s"bitmap BFS: id $id outside the declared domain [0, $maxId)")
    (words((id >> 6).toInt) & (1L << (id & 63))) != 0L
  }

  /** The NULL branch of the structural guard — a named method so the
    * generated code throws the same exception interpreted and
    * compiled. Return type Boolean keeps the call-site a plain
    * statement in the generated Java. */
  def nullId(): Boolean =
    throw new IllegalArgumentException(
      "bitmap BFS: NULL id — the declared domain has no NULL member; " +
        "filter NULL edges out before the probe")

  /** Column-level entry point. */
  def apply(id: Column, bm: Broadcast[Array[Long]], maxId: Long): Column =
    SqlBridge.column(BitmapContains(SqlBridge.expression(id), bm, maxId))
}

/** [[BitmapContains]] with the words array carried DIRECTLY as a plan
  * reference — for SMALL domains, where a torrent broadcast's
  * per-round create/destroy latency (~10 ms, measured as a 63-job
  * q_graph_bfs sitting moving 4.9→5.4 run-seconds when every round
  * broadcast a KB-sized frontier) costs more than shipping the raw
  * long[] with each task's plan. A raw primitive array serializes
  * compactly (no per-element boxing — the typedLit form this family
  * replaced boxed through GenericArrayData); past
  * [[graft.operators.Bfs.BitmapBroadcastWords]] the per-task bytes
  * dominate and the broadcast form takes over. Same structural
  * domain guard, including the NULL-id throw.
  *
  * The `words` field is a raw array, so two semantically identical
  * probes never compare equal (case-class equality is reference
  * equality on arrays) — canonicalization/subexpression elimination
  * will not unify them. Harmless here (one probe per BFS round) but
  * do NOT build anything that relies on two of these deduplicating. */
case class BitmapContainsLit(child: Expression,
                             words: Array[Long],
                             maxId: Long) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_contains requires a bigint id, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) BitmapContains.nullId()
    else BitmapContains.probe(words, v.asInstanceOf[Long], maxId)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bmWords", words, "long[]")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      if (${childGen.isNull}) graft.plans.BitmapContains.nullId();
      boolean ${ev.value} = graft.plans.BitmapContains.probe(
        $ref, ${childGen.value}, ${maxId}L);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BitmapContainsLit = copy(child = newChild)
}

object BitmapContainsLit {
  /** Column-level entry point. */
  def apply(id: Column, words: Array[Long], maxId: Long): Column =
    SqlBridge.column(BitmapContainsLit(SqlBridge.expression(id), words, maxId))
}

/** Index of the FIRST level bitmap holding an id, NULL when none does —
  * the bitmap BFS's distributed materialization (`d` = the hop whose
  * level bitmap first set the bit), probing all maxHops+1 levels from
  * ONE broadcast instead of a nested plan literal (which at the 2^28
  * cap would embed ~(maxHops+1)·32 MB into the plan and box every word
  * through Seq[Long] on the driver). Ids outside the broadcast's word
  * range throw rather than alias (the caller feeds `range(0, maxId)`,
  * in-domain by construction — the guard is belt-and-braces). */
case class BitmapFirstLevel(child: Expression,
                            levels: Broadcast[Array[Array[Long]]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_first_level requires a bigint id, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val r = BitmapFirstLevel.first(levels.value, input.asInstanceOf[Long])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("levelsBc", levels,
      classOf[Broadcast[Array[Array[Long]]]].getName)
    val lv = ctx.addMutableState("long[][]", "lvWords",
      v => s"$v = (long[][]) $ref.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("lvl")
      s"""
        int $r = graft.plans.BitmapFirstLevel.first($lv, $c);
        ${ev.isNull} = ($r < 0);
        ${ev.value} = $r;"""
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BitmapFirstLevel = copy(child = newChild)
}

object BitmapFirstLevel {
  def first(levels: Array[Array[Long]], id: Long): Int = {
    if (id < 0L || levels.length > 0 && (id >> 6) >= levels(0).length)
      throw new IllegalArgumentException(
        s"bitmap BFS: id $id outside the materialization domain")
    val w = (id >> 6).toInt
    val m = 1L << (id & 63)
    var l = 0
    while (l < levels.length) {
      if ((levels(l)(w) & m) != 0L) return l
      l += 1
    }
    -1
  }

  /** Column-level entry point. */
  def apply(id: Column, levels: Broadcast[Array[Array[Long]]]): Column =
    SqlBridge.column(BitmapFirstLevel(SqlBridge.expression(id), levels))
}

/** [[BitmapFirstLevel]] with the levels carried directly as a plan
  * reference — the small-domain twin of [[BitmapContainsLit]] (the
  * materialization is ONE job, so the only cost is its tasks' plan
  * bytes: ≤ (maxHops+1)·256 KB at the literal threshold). As there,
  * the raw-array field makes case-class equality reference equality —
  * two identical probes never unify under subexpression elimination
  * (harmless: one materialization per BFS call). */
case class BitmapFirstLevelLit(child: Expression,
                               levels: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_first_level requires a bigint id, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val r = BitmapFirstLevel.first(levels, input.asInstanceOf[Long])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lvWords", levels, "long[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("lvl")
      s"""
        int $r = graft.plans.BitmapFirstLevel.first($ref, $c);
        ${ev.isNull} = ($r < 0);
        ${ev.value} = $r;"""
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BitmapFirstLevelLit = copy(child = newChild)
}

object BitmapFirstLevelLit {
  /** Column-level entry point. */
  def apply(id: Column, levels: Array[Array[Long]]): Column =
    SqlBridge.column(BitmapFirstLevelLit(SqlBridge.expression(id), levels))
}
