package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns, shared by the similarity
  * operators (SURVEY.md §2B-10). The dot product is the native codegen
  * expression [[graft.plans.DotProduct]] (measured ~10x over the
  * interpreted zip_with/aggregate lambda formulation on pairwise
  * similarity at sf0.1); its strict left-to-right accumulation matches
  * DuckDB's list_reduce, so doubles stay bit-identical cross-engine.
  */
object VectorOps {

  /** Cast float array -> double array (floats are exactly representable;
    * native Cast — stays inside whole-stage codegen).
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right dot product (native codegen). Mirrors DuckDB:
    * list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),
    *   p -> p[1]*p[2])), (x,y) -> x+y)
    */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

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
