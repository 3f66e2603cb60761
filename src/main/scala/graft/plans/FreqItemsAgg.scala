package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a TypedImperativeAggregate
  * (SURVEY.md §2B-4 "sketches", the third custom imperative aggregate
  * next to [[DistinctSetAgg]] and [[HllRegistersAgg]]): at most `k`
  * (item, counter) pairs per group, classic decrement-on-overflow
  * update and the standard mergeable-summaries merge (Agarwal et al.,
  * PODS 2012): sum counters, then subtract the (k+1)-th largest and
  * drop non-positives.
  *
  * Guarantees that hold under ANY partition/merge order (each round of
  * decrements removes equal mass from every surviving item and at most
  * n/(k+1) mass total per item over the whole run):
  *   - every item with true count > n/(k+1) is present in the result;
  *   - every reported estimate e satisfies true - n/(k+1) <= e <= true.
  * The exact register CONTENT is merge-order-dependent (like any MG
  * implementation), so queries oracle the GUARANTEES (booleans DuckDB
  * verifies against exact counts), not raw registers — the r5
  * assertion-oracle pattern.
  *
  * Scale: state is O(k) per group regardless of input size; partials
  * merge once per shuffle like any built-in aggregate — the frequent-
  * token / frequent-URL / hot-key detector at 100 TB.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 65536, s"freq_items: k must be in [1,65536], got $k")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_items expects a STRING input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // decrement all; drop zeros (the MG eviction step)
          val dead = scala.collection.mutable.ArrayBuffer[String]()
          buf.foreach { case (i, c) =>
            if (c == 1L) dead += i else buf.update(i, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter, drop non-positives
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = scala.collection.mutable.ArrayBuffer[String]()
      a.foreach { case (i, c) =>
        if (c - cut <= 0L) dead += i else a.update(i, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val entries = buf.toArray.sortBy { case (i, c) => (-c, i) }
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(_._2: Any))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val bytes = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqItemsAgg = copy(child = c.head)
}

object FreqItemsAgg {

  /** Column entry point: Misra-Gries top-k summary (map item -> count
    * estimate) over a string column. */
  def apply(c: Column, k: Int): Column =
    SqlBridge.column(
      FreqItemsAgg(SqlBridge.expression(c), k).toAggregateExpression())
}
