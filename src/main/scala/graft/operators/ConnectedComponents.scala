package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation:
  * every node's label converges to the minimum node id reachable in its
  * component. Each round is one join + one min aggregation (two
  * shuffles) with the lineage cut by `localCheckpoint`, so the plan
  * stays flat across rounds; rounds needed ≈ graph diameter. Near-dup
  * graphs are dense blobs with tiny diameter, so 2-4 rounds in
  * practice; the round cap fails loudly rather than returning a
  * half-propagated labeling. At 100 TB the identical fixpoint runs with
  * large-star/small-star edge rewrites to bound per-round skew
  * (the loop and convergence check are unchanged).
  */
object ConnectedComponents {

  /** Label the undirected graph given as one-directional `(a, b)` pairs.
    * Returns `(id, lab)` for every node incident to at least one pair.
    */
  def label(
      pairs: DataFrame,
      a: String,
      b: String,
      maxRounds: Int = 25): DataFrame = {
    val p = pairs.select(col(a).as("pa"), col(b).as("pb")).localCheckpoint()
    val edges = p.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(p.select(col("pb").as("src"), col("pa").as("dst")))
    var labels = p.select(col("pa").as("id"))
      .unionByName(p.select(col("pb").as("id")))
      .distinct().withColumn("lab", col("id")).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbr = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("lab")).as("nlab"))
      val next = labels.join(nbr, labels("id") === nbr("src"), "left")
        .select(labels("id"),
          least(labels("lab"), coalesce(col("nlab"), labels("lab")))
            .as("lab"),
          labels("lab").as("prev"))
        .localCheckpoint()
      converged = next.filter(col("lab") < col("prev")).isEmpty
      labels = next.select(col("id"), col("lab"))
      round += 1
    }
    require(converged,
      s"label propagation did not converge in $round rounds")
    labels
  }
}
