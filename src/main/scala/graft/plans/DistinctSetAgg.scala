package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** TypedImperativeAggregate (SURVEY.md §2B-4/11 "custom imperative agg"):
  * exact distinct-set collection over a long column with an imperative
  * mutable buffer (LongOpenHash-style via java HashSet) and explicit
  * binary serialization between partial and final aggregation — the
  * extension point a sketch operator (HLL/CMS/reservoir) would use.
  *
  * Output is the SORTED distinct array, so the result is deterministic
  * and oracle-checkable (DuckDB: list(DISTINCT x ORDER BY x)).
  *
  * Scale: partials accumulate per partition, merge once per shuffle —
  * the same two-phase shape as built-in aggregates.
  */
case class DistinctSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(
      buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    a.addAll(b); a
  }

  override def eval(buf: java.util.HashSet[Long]): Any = {
    val arr = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = new java.util.HashSet[Long](n)
    var i = 0
    while (i < n) { set.add(in.readLong()); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(o: Int): DistinctSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DistinctSetAgg = copy(child = c.head)
}

object DistinctSetAgg {
  /** Column entry point: exact sorted distinct set of a long column. */
  def apply(c: Column): Column =
    SqlBridge.column(
      DistinctSetAgg(SqlBridge.expression(c)).toAggregateExpression())
}
