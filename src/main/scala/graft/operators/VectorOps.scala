package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns, shared by the similarity
  * operators (SURVEY.md §2B-10). All built from higher-order functions
  * (zip_with + left-to-right aggregate folds), which are codegen'd and —
  * critically for the oracle — fold in the same order as DuckDB's
  * list_reduce, so doubles match bit-for-bit cross-engine.
  *
  * A custom codegen Expression is the §7 perf option if the fold shows up
  * hot at bench time; semantics here are the contract.
  */
object VectorOps {

  /** Cast float array -> double array (floats are exactly representable). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right dot product fold. Mirrors DuckDB:
    * list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),
    *   p -> p[1]*p[2])), (x,y) -> x+y)
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, e) => acc + e)

  def norm2(v: Column): Column = dot(v, v)

  def l2(v: Column): Column = sqrt(norm2(v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  // ---- DuckDB SQL mirrors (string builders used by oracle queries) ----

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), p -> p[1] * p[2])), (x, y) -> x + y)"

  def l2Sql(v: String): String = s"sqrt(${dotSql(v, v)})"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${l2Sql(a)} * ${l2Sql(b)}))"
}
