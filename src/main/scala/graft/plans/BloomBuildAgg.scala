package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Per-group Bloom filter BUILD as a TypedImperativeAggregate (the
  * [[DistinctSetAgg]]/[[HllRegistersAgg]] pattern): each group — one
  * data file in the TxLog write path — folds its rows' 60-bit h60
  * hashes into a word-array filter EXECUTOR-SIDE and returns only the
  * finished filter bytes.
  *
  * Why it exists: the pre-r10 build exploded the 4 probe positions per
  * row and `collect_set(pos)`-ed them into ONE driver row per file — a
  * driver allocation proportional to the filter's set-bit count
  * (4×NDV ints before dedup, set-bit-count after). This aggregate is
  * the production shape: state is the filter itself (m/8 bytes,
  * OR-mergeable partials like any built-in agg), the driver receives
  * exactly the bytes it will write to the log line or sidecar, and the
  * path stays bounded at ANY NDV — the last size-coupled driver
  * allocation in TxLog, gone.
  *
  * Inputs: `hash` = [[graft.functions.Fns.h60]] of the indexed column
  * (NULL values contribute no bits — matching collect_set's null drop);
  * `bits` = the file's filter size in bits (a power of two from
  * `TxLog.bloomBitsFor`, constant within a group; rides each row via
  * the NDV-pass map lookup so one aggregate instance serves any mix of
  * file sizes). Bit positions are the same Kirsch-Mitzenmacher double
  * hashing the read side (`TxLog.bloomPositions`) probes:
  * pos_i = ((h & 2^30-1) + i*((h >>> 30) | 1)) mod bits, i in 0..3 —
  * the filter bytes are bit-identical to the old explode build.
  * Output: the filter as BIG-ENDIAN long words serialized to bytes —
  * exactly the sidecar file encoding; NULL for a group whose every
  * row had a null `bits` (no size ever arrived, so there is no
  * well-formed empty filter to return).
  */
case class BloomBuildAgg(
    hash: Expression,
    bits: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hash, bits)
  // a group that never saw a non-null `bits` row has no filter SIZE,
  // so its result is NULL — not a zero-length byte array a reader
  // would take for a malformed filter (callers asserting
  // bytes.length*8 == bits crash on empty input either way, but a
  // null surfaces the "empty group" cause instead of a length lie)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && bits.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build expects (LONG h60 hash, LONG filter bits), got " +
        s"${hash.dataType.simpleString} and ${bits.dataType.simpleString}")

  // the size arrives with the first row (constant per group), so the
  // buffer allocates lazily — empty means "no row seen yet"
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val b = bits.eval(input)
    if (b == null) return buf
    val m = b.asInstanceOf[Long]
    val words =
      if (buf.nonEmpty) buf
      else {
        require(m > 0 && (m & 63) == 0 && (m & (m - 1)) == 0,
          s"bloom_build: bits must be a positive multiple-of-64 power " +
            s"of two, got $m")
        new Array[Long]((m / 64).toInt)
      }
    require(words.length.toLong * 64 == m,
      s"bloom_build: filter size changed within a group " +
        s"(${words.length * 64L} -> $m bits)")
    val hv = hash.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      val h1 = h & ((1L << 30) - 1)
      val h2 = (h >>> 30) | 1L
      var i = 0
      while (i < 4) {
        val pos = ((h1 + i * h2) % m).toInt
        words(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"bloom_build: merging filters of different sizes " +
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

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomBuildAgg =
    copy(hash = c(0), bits = c(1))
}

object BloomBuildAgg {
  /** Column entry point: finished Bloom filter bytes over (h60 hash,
    * per-row filter-bits) columns. */
  def apply(hash: Column, bits: Column): Column =
    SqlBridge.column(
      BloomBuildAgg(SqlBridge.expression(hash), SqlBridge.expression(bits))
        .toAggregateExpression())
}
