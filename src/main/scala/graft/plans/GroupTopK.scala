package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Ascending, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SqlBridge

/** Whole-operator extension point (SURVEY.md §2B-11 / builder option (c)):
  * per-group top-k as a first-class operator — custom `LogicalPlan` node,
  * planner `SparkStrategy`, and a two-phase physical `SparkPlan`.
  *
  * Why not the window formulation (`row_number() OVER (PARTITION BY g
  * ORDER BY s) <= k`): that plans as shuffle → FULL SORT of every
  * partition → filter, i.e. O(n log n) over all rows with the whole
  * input materialized through the sort. This operator keeps a bounded
  * heap of k rows per group on each input partition (partial phase, at
  * most groups×k rows survive — the map-side-combine shape), shuffles
  * only those survivors by group key, and reduces again (final phase):
  * O(n log k) compute, O(groups × k) shuffle bytes and state. At 100 TB
  * with k=10 the shuffle shrinks by orders of magnitude versus sorting
  * the fact table.
  */
case class GroupTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupTopK: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): GroupTopKNode =
    copy(child = c)
}

/** Plans [[GroupTopKNode]] as partial→(exchange)→final [[GroupTopKExec]];
  * the exchange is inserted by EnsureRequirements from the final phase's
  * required clustering.
  */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(g, o, k, child) =>
      val partial = GroupTopKExec(g, o, k, finalPhase = false, planLater(child))
      GroupTopKExec(g, o, k, finalPhase = true, partial) :: Nil
    case _ => Nil
  }
}

/** One phase of grouped top-k: per input partition, a hash map of
  * group key → bounded heap of the k first rows in `order` (heap root =
  * worst kept row, so each new row costs one comparison and at most one
  * O(log k) replace). Same algorithm both phases; only the required
  * distribution differs.
  */
case class GroupTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs
    val o = order
    val kk = k
    val schema = child.output
    child.execute().mapPartitions { iter =>
      GroupTopKExec.partitionTopK(iter, g, o, kk, schema)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupTopKExec =
    copy(child = c)
}

object GroupTopKExec {

  private[plans] def partitionTopK(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      schema: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, schema)
    val rowProj = UnsafeProjection.create(schema, schema)
    val ordering = new LazilyGeneratedOrdering(order, schema)
    // heap root = the LAST row in sort order among the kept k
    val heapCmp = ordering.reverse
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k, heapCmp)
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) {
        heap.add(rowProj(row).copy())
      } else if (ordering.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(rowProj(row).copy())
      }
    }
    val out = Vector.newBuilder[InternalRow]
    heaps.values().forEach { h =>
      while (!h.isEmpty) out += h.poll()
    }
    out.result().iterator
  }
}

/** DataFrame-level entry point. */
object GroupTopK {

  /** First k rows per group in the given sort order (`ORDER BY ... LIMIT
    * k` within each group). `orderSpec` is (column, descending?) pairs
    * and should define a TOTAL order (include a unique tiebreaker) for
    * deterministic results. Catalyst SortOrder is built directly — the
    * public Column `.desc` AST node is not task-serializable inside a
    * custom exec's closure.
    *
    * Installs [[GroupTopKStrategy]] into the session's experimental
    * strategies (idempotent); sessions built with
    * `graft.GraftExtensions` already carry it.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"GroupTopK: no column '$n' in ${child.output.map(_.name)}"))
    val groupExprs: Seq[Expression] = groupCols.map(attr)
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    SqlBridge.ofRows(spark, GroupTopKNode(groupExprs, order, k, child))
  }
}
