package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2B-11): element-wise mean of embedding vectors.
  *
  * Accumulates floor(x * 1e7) as Longs so the aggregation is EXACT integer
  * arithmetic — order-insensitive across partitions and bit-reproducible
  * in the DuckDB oracle (floor avoids the half-up/half-even divergence a
  * round() would introduce; the 1e-7 quantization is applied identically
  * in both engines).
  */
object VecMeanAgg extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Double]] {

  val Scale = 1e7

  def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    // null AND zero-length vectors are skipped and not counted: an empty
    // vector carries no elements, and counting it would skew the mean
    // denominator (an (empty, n>0) buffer is indistinguishable from zero
    // in merge, silently bypassing the mixed-length check).
    if (v == null || v.isEmpty) b
    else {
      val acc = if (b._1.isEmpty) new Array[Long](v.length) else b._1
      require(v.length == acc.length,
        s"vec_mean: mixed vector lengths (${v.length} vs ${acc.length})")
      var i = 0
      while (i < v.length) {
        acc(i) += math.floor(v(i).toDouble * Scale).toLong
        i += 1
      }
      (acc, b._2 + 1)
    }
  }

  def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    if (a._1.isEmpty) (b._1, a._2 + b._2) // counts always accumulate,
    else if (b._1.isEmpty) (a._1, a._2 + b._2) // even for empty sums
    else {
      require(a._1.length == b._1.length,
        s"vec_mean: mixed vector lengths (${a._1.length} vs ${b._1.length})")
      val out = new Array[Long](a._1.length)
      var i = 0
      while (i < out.length) { out(i) = a._1(i) + b._1(i); i += 1 }
      (out, a._2 + b._2)
    }
  }

  def finish(r: (Array[Long], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty
    else r._1.toSeq.map(s => s.toDouble / Scale / r._2.toDouble)

  def bufferEncoder: Encoder[(Array[Long], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Long]], Encoders.scalaLong)

  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
