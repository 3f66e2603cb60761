package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register sketch as a TypedImperativeAggregate (SURVEY.md
  * §2B-4 "sketches" / §2B-11 custom imperative agg, the sibling of
  * [[DistinctSetAgg]]): fixed 2^p-byte buffer per group, elementwise-max
  * merge — the textbook mergeable-sketch shape (Flajolet et al., AofA
  * 2007).
  *
  * Input is a 60-bit [[graft.functions.Fns.h60]] hash (NOT raw values):
  * with the hash fixed, the register state is fully DETERMINISTIC and
  * partition-order-insensitive (max is commutative/associative), so
  * unlike `approx_count_distinct` the sketch itself is exactly
  * oracle-checkable — DuckDB recomputes every register from the same md5
  * arithmetic (`CASE WHEN rest=0 THEN w+1 ELSE w - length(bin(rest)) + 1
  * END`, max per bucket).
  *
  * Register j (top p hash bits) holds max over values of rho(lower
  * w=60-p bits) where rho = leading-zero count within the w-bit field
  * + 1 (rest=0 → w+1). [[HllRegistersAgg.estimate]] turns registers into
  * the bias-corrected cardinality estimate (accuracy ~1.04/sqrt(m),
  * asserted against exact counts in unit tests).
  *
  * Scale: state is 2^p bytes per group regardless of input size — the
  * whole point of a sketch at 100 TB; partials merge once per shuffle
  * like any built-in aggregate.
  */
case class HllRegistersAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4,16], got $p")
  private val m = 1 << p
  private val w = 60 - p // rho domain width in bits

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects a LONG (h60 hash) input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> w).toInt
      val rest = h & ((1L << w) - 1)
      // bit length of rest = 64 - nlz(rest); rho = w - bitlen + 1
      val rho =
        if (rest == 0L) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllRegistersAgg = copy(child = c.head)
}

object HllRegistersAgg {

  /** Column entry point: HLL registers (array of 2^p ints) over a 60-bit
    * h60 hash column.
    */
  def apply(c: Column, p: Int): Column =
    SqlBridge.column(
      HllRegistersAgg(SqlBridge.expression(c), p).toAggregateExpression())

  /** Bias-corrected HLL cardinality estimate from a register array
    * (standard small-range linear-counting correction; no large-range
    * correction needed for a 60-bit hash at any realistic cardinality).
    */
  def estimate(regs: Seq[Int]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    regs.foreach { r =>
      sum += math.pow(2.0, -r)
      if (r == 0) zeros += 1
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
