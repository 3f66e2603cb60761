package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** EXACT membership bitmap over a bounded id domain as a
  * TypedImperativeAggregate (the [[BloomBuildAgg]] pattern, minus the
  * hashing — one bit per id, no false positives, which is what lets
  * the BFS frontier ride it: a Bloom filter's false positive would
  * silently DROP a node as already-settled and corrupt distances).
  * State is the bitmap itself — `bits/8` bytes per in-flight buffer,
  * OR-mergeable partials like any built-in agg — so a frontier of any
  * row count folds map-side into one fixed-size word array and the
  * driver receives exactly `bits/8` bytes per round, independent of
  * frontier cardinality.
  *
  * Inputs: `id` = the node id (LONG, must lie in [0, bits) — an
  * out-of-domain id fails LOUDLY rather than aliasing another node;
  * NULL ids contribute no bits); `bits` = the domain size rounded up
  * to a multiple of 64 (constant across the aggregation; rides each
  * row as a literal like BloomBuildAgg's size input). Output: the
  * bitmap as BIG-ENDIAN long words serialized to bytes; NULL when no
  * non-null `bits` row arrived.
  */
case class BitmapOrAgg(
    id: Expression,
    bits: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(id, bits)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && bits.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_or expects (LONG id, LONG domain bits), got " +
        s"${id.dataType.simpleString} and ${bits.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val b = bits.eval(input)
    if (b == null) return buf
    val m = b.asInstanceOf[Long]
    val words =
      if (buf.nonEmpty) buf
      else {
        require(m > 0 && (m & 63) == 0,
          s"bitmap_or: bits must be a positive multiple of 64, got $m")
        new Array[Long]((m / 64).toInt)
      }
    require(words.length.toLong * 64 == m,
      s"bitmap_or: domain size changed within the aggregation " +
        s"(${words.length * 64L} -> $m bits)")
    val iv = id.eval(input)
    if (iv != null) {
      val i = iv.asInstanceOf[Long]
      require(i >= 0 && i < m,
        s"bitmap_or: id $i outside the declared domain [0, $m)")
      words((i >> 6).toInt) |= 1L << (i & 63)
    }
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"bitmap_or: merging bitmaps of different domains " +
          s"(${a.length * 64L} vs ${b.length * 64L} bits)")
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else wordsToBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = wordsToBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
    words
  }

  private def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BitmapOrAgg =
    copy(id = c(0), bits = c(1))
}

object BitmapOrAgg {
  /** Column entry point: finished bitmap bytes over (id, domain-bits)
    * columns. */
  def apply(id: Column, bits: Column): Column =
    SqlBridge.column(
      BitmapOrAgg(SqlBridge.expression(id), SqlBridge.expression(bits))
        .toAggregateExpression())
}
