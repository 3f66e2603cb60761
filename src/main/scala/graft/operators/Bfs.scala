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
  def hopDistance(edges: DataFrame, sources: DataFrame,
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
    var dist = sources.select(col("node")).distinct()
      .withColumn("d", lit(0)).localCheckpoint(false)
    var frontier = dist
    var frontierRows = dist.count() // materializes the lazy checkpoint
    var hop = 0
    while (hop < maxHops && frontierRows > 0L) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("d", lit(hop))
        .localCheckpoint(false)
      frontierRows = next.count() // one job: materialize + measure
      // `dist` stays a plain union of the checkpointed rounds: the
      // union is metadata-only over materialized blocks, so each node's
      // row is cached exactly once across the whole run (one
      // materialization job per round, not two, and no per-round
      // re-caching of the full settled set). The round frames are live
      // pieces of `dist` — nothing can be released until the result is
      // consumed, and total cached bytes equal the old design's single
      // settled frame.
      dist = dist.unionByName(next)
      frontier = next
    }
    release(e)
    dist
  }
}
