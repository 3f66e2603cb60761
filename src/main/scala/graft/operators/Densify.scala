package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** ID DENSIFICATION — the standard preprocessing step of every
  * production graph engine's bitmap/array formulations: a
  * deterministic, order-preserving bijection from an arbitrary
  * (sparse-long or string) id space onto [0, N), so domain-bounded
  * operators like [[Bfs.hopDistanceBitmap]] (whose driver-held bitmaps
  * scale with the DOMAIN, capped at 2^28) can run on graphs whose raw
  * ids are hashes, UUIDs, or sparse keys. Before r15 the cap's escape
  * hatch was "densify ids first" — user homework; this is the
  * operator.
  *
  * The mapping is `dense_id` = rank of the id in ascending order —
  * a pure function of the id SET, independent of partitioning,
  * sampling, or cluster size, so it is reproducible across runs and
  * oracle-derivable (`row_number() OVER (ORDER BY id) - 1`). Computed
  * WITHOUT a global single-partition window: distinct ids are
  * range-repartitioned (partition i holds only ids ≤ partition i+1's
  * — boundaries may vary run to run, the resulting RANKS cannot),
  * sorted within partitions, and assigned by `zipWithIndex` (one
  * count job for per-partition offsets + one map — the RDD layer's
  * textbook two-pass dense rank; this is the genuinely imperative
  * per-partition step the DataFrame API has no shuffle-free
  * equivalent for, a window over ORDER BY id would funnel every id
  * through ONE task). O(N log N) total, no driver materialization —
  * at 100 TB the mapping is a distributed artifact the caller
  * persists bucketed on the join key and reuses across every BFS/
  * component/PageRank call on the same node set.
  */
object Densify {

  /** The (orig, dense_id) mapping for the distinct values of
    * `ids(idCol)` — `orig` keeps the input column's type, `dense_id`
    * is the value's ascending rank in [0, N). */
  def mapping(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    val src = ids.select(col(idCol).as("orig")).distinct()
    val par = spark.sparkContext.defaultParallelism
    val sorted = src.repartitionByRange(par, col("orig"))
      .sortWithinPartitions(col("orig"))
    val mapped = sorted.rdd.zipWithIndex().map { case (r, i) =>
      // fail-loudly NULL guard (the BitmapContains.nullId discipline):
      // the dense domain [0, N) has no NULL member, and silently
      // ranking NULL (ascending sort puts it FIRST, shifting every
      // real id's rank by one) would diverge from the documented
      // row_number() ORDER BY mirror, which sorts NULLS LAST. Checked
      // executor-side in the assignment pass — no extra job.
      require(!r.isNullAt(0),
        "Densify.mapping: NULL id — the dense domain [0, N) has no " +
          "NULL member; filter NULL ids (or fix the upstream outer " +
          "join) before densifying")
      Row(r.get(0), i)
    }
    spark.createDataFrame(mapped, StructType(Seq(
      src.schema.fields.head.copy(name = "orig"),
      StructField("dense_id", LongType, nullable = false))))
  }
}
