package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source (or multi-source) BFS hop distance by iterative
  * frontier expansion: round `i` joins the hop-(i-1) frontier against
  * the edge list and anti-joins the already-settled set, so every node
  * is settled exactly once at its minimum hop count — integer-exact,
  * no floating point anywhere. Each round's frontier is cut with
  * `localCheckpoint` (plans stay flat; the settled set is a
  * metadata-only union of the round frames, so every node's row is
  * cached exactly once), and the edge list is shuffled ONCE onto its
  * join key: `localCheckpoint` preserves physical partitioning, so
  * every subsequent round only moves the (small) frontier — at 100 TB
  * the edge relation never re-crosses the wire. Work per round is
  * O(frontier-adjacent edges), the textbook distributed-BFS bound.
  */
object Bfs {

  private def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.SqlBridge.checkpointRdd(df)
      .foreach(_.unpersist(blocking = false))

  /** Hop distances over the DIRECTED edge set `edges(src, dst)` from
    * the nodes of `sources(node)`; pass both directions for an
    * undirected graph. Returns `(node, d)` for every node reachable
    * within `maxHops` (sources at d=0). Stops early when the frontier
    * empties. */
  /** `adaptive = true` (default) keeps AQE on inside the round loop —
    * the r10 A/B at bench volume (stage tables, same HEAD): AQE-off
    * halves job submissions (63 vs 129) but forfeits runtime partition
    * coalescing on every per-round exchange, and the loop's many small
    * static-partition stages cost ~6× the task-seconds — a bad trade
    * whenever rounds carry real data. `adaptive = false` is the
    * measured micro-graph posture (one job per materialization action,
    * 20 vs 37 submissions on the unit-test graph) for workloads where
    * job-submit latency dominates and rounds are tiny. */
  def hopDistance(edges: DataFrame, sources: DataFrame,
                  maxHops: Int, adaptive: Boolean = true): DataFrame =
    if (adaptive) hopDistance0(edges, sources, maxHops)
    else {
      val spark = edges.sparkSession
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try hopDistance0(edges, sources, maxHops)
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }

  // private[graft] so the job-count test can run the loop under the
  // caller's AQE setting and measure the submission gap the wrapper
  // above exists to close
  private[graft] def hopDistance0(edges: DataFrame, sources: DataFrame,
                                  maxHops: Int): DataFrame = {
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e = edges.select(col("src"), col("dst"))
      .repartition(par * 2, col("src")).localCheckpoint()
    // LAZY checkpoints + count(): one action per round both
    // materializes the frontier's cache AND measures it, where the
    // eager checkpoint + isEmpty pair submitted two jobs per round —
    // at 8 rounds x (warmup + 3 timed runs) the per-round job-submit
    // overhead was a measured 23% scheduler-delay share of a
    // scheduling-bound query (bench_stages r9).
    //
    // r10: TWO hops per materialization round. Each iteration chains
    // hop i+1 and hop i+2 as ONE lazy plan and materializes both with
    // a single count over their (metadata-only) union — distances stay
    // integer-exact because hop-(i+2) candidates anti-join BOTH the
    // settled set and the hop-(i+1) frame, so every node still settles
    // at its minimum hop. Action count (and with it the per-round
    // job-submit latency that dominates this scheduling-bound shape)
    // halves at fixed diameter; the only tail cost is at most one
    // empty-expansion round when the frontier dies on an odd hop.
    var dist = sources.select(col("node")).distinct()
      .withColumn("d", lit(0)).localCheckpoint(false)
    var frontier = dist
    var frontierRows = dist.count() // materializes the lazy checkpoint
    var hop = 0
    // hop-(d) candidates: frontier's out-neighbors not yet settled
    // (minus `extra`, the in-flight sibling round, when given).
    // The FRONTIER side of the edge join carries an explicit broadcast
    // hint: a frontier is one level of the graph (node-sized, measured
    // by the round's own count), so the edge relation — the only
    // edge-SIZED operand — is streamed over its cached partitioned
    // blocks with no per-round exchange and, crucially, no per-round
    // SORT. Without the hint the AQE-off loop planned sort-merge joins
    // whose every round re-sorted the full edge list (measured 8x
    // task-seconds in the r10 stage table); with AQE on the runtime
    // stats reached the same broadcast decision, at one job per
    // exchange stage. The settled-set anti-joins stay shuffle joins:
    // `dist` grows toward the full node set, which is the side you
    // never broadcast.
    def expand(fr: DataFrame, settled: DataFrame, d: Int,
               extra: Option[DataFrame]): DataFrame = {
      val base = e.join(broadcast(fr), fr("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
      extra.fold(base)(x => base.join(x, Seq("node"), "left_anti"))
        .withColumn("d", lit(d))
        .localCheckpoint(false)
    }
    while (hop < maxHops && frontierRows > 0L) {
      // `dist` stays a plain union of the checkpointed rounds: the
      // union is metadata-only over materialized blocks, so each node's
      // row is cached exactly once across the whole run (one
      // materialization job per 1-2 hops, and no per-round re-caching
      // of the full settled set). The round frames are live pieces of
      // `dist` — nothing can be released until the result is consumed,
      // and total cached bytes equal the old design's single settled
      // frame.
      if (maxHops - hop >= 2) {
        val n1 = expand(frontier, dist, hop + 1, None)
        val n2 = expand(n1, dist, hop + 2, Some(n1))
        val both = n1.unionByName(n2)
        frontierRows = both.count() // ONE job settles two hops
        dist = dist.unionByName(both)
        frontier = n2
        hop += 2
      } else {
        val next = expand(frontier, dist, hop + 1, None)
        frontierRows = next.count()
        dist = dist.unionByName(next)
        frontier = next
        hop += 1
      }
    }
    release(e)
    dist
  }
}
