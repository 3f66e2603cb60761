package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 / builder scale
  * notes): salt the skewed (big) side into `factor` sub-keys and
  * replicate the small side once per salt value, so a hot key's rows
  * spread over `factor` reducers instead of one.
  *
  * The salt is DETERMINISTIC: a hash of caller-supplied stable columns.
  * A nondeterministic salt (row id, rand) would feed the join's shuffle
  * key, and on a real cluster a partially retried map stage (fetch
  * failure) recomputes rows with different salts — duplicating or losing
  * rows across reducers (the SPARK-23207 failure class, invisible on
  * local mode). AQE's skew-join split handles moderate skew
  * automatically; explicit salting is for the pathological keys AQE
  * can't split.
  */
object Salt {

  /** Inner equi-join `big ⋈ small` on `keys`, with the big side salted
    * `factor` ways. Result equals the unsalted join (asserted in tests).
    *
    * `saltCols` names DETERMINISTIC columns of `big` whose values vary
    * within a hot key — ideally a unique row id (e.g. a primary key),
    * but any stable high-cardinality columns work. The salt is
    * `pmod(xxhash64(saltCols...), factor)`: recomputed identically on
    * task retry, so shuffle-consistent at cluster scale. Note that rows
    * fully duplicated across `saltCols` hash to the same bucket — pass a
    * genuinely unique id to spread even full-duplicate rows.
    *
    * Correctness does not depend on the salt's distribution (the small
    * side is replicated across ALL salt values, so every row matches
    * regardless of bucket) — only skew mitigation quality does.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, saltCols: Seq[String]): DataFrame = {
    require(saltCols.nonEmpty, "saltedJoin: saltCols must be non-empty")
    val saltCol = "_graft_salt"
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(saltCols.map(col): _*), lit(factor)))
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
