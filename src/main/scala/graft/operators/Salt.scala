package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 / builder scale
  * notes): salt the skewed (big) side into `factor` sub-keys and
  * replicate the small side once per salt value, so a hot key's rows
  * spread over `factor` reducers instead of one.
  *
  * The salt is DETERMINISTIC (hash of the full row modulo factor), so
  * results are reproducible run-to-run. AQE's skew-join split handles
  * moderate skew automatically; explicit salting is for the pathological
  * keys AQE can't split (single-key hot spots in aggregations feeding
  * joins).
  */
object Salt {

  /** Inner equi-join `big ⋈ small` on `keys`, with the big side salted
    * `factor` ways. Result equals the unsalted join (asserted in tests).
    *
    * The salt mixes a row-local id into the hash so even FULL-DUPLICATE
    * rows of a hot key spread across buckets (a pure row-content hash
    * would send every copy to one reducer — exactly the pathological
    * case salting exists for). The salt value is not deterministic
    * run-to-run, but the JOIN RESULT is: the small side is replicated
    * across all salt values, so every row matches regardless of which
    * bucket it landed in.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    val saltCol = "_graft_salt"
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()
        +: big.columns.map(col): _*), lit(factor)))
    val salts = small.sparkSession.range(factor)
      .select(col("id").cast("int").as(saltCol))
    val smallReplicated = small.crossJoin(broadcast(salts))
    bigSalted.join(smallReplicated,
        keys.map(k => bigSalted(k) === smallReplicated(k))
          .reduce(_ && _) && bigSalted(saltCol) === smallReplicated(saltCol))
      .drop(saltCol)
      .drop(keys.map(smallReplicated(_)).head,
        keys.map(smallReplicated(_)).tail: _*)
  }
}
