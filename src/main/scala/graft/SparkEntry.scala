package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query corpus lives in graft.queries.* modules; each query pairs a
  * Spark DataFrame program with (when SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  private val modules: Vector[QueryModule] = Vector(
    q.Aggregates,
    q.Joins,
    q.RowOps,
    q.Windows,
    q.SetOps,
    q.Scalars,
    q.Streaming,
    q.SubjectOps,
    q.LlmText,
    q.LlmSim,
    q.Sources,
    q.Extras,
    q.Tpch)

  /** All declared queries, in module order. Names must be unique. */
  lazy val all: Vector[(String, QueryDef)] = {
    val v = modules.flatMap(_.defs)
    require(v.map(_._1).distinct.size == v.size, "duplicate query names")
    v
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, d) => n -> d.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, QueryDef(_, Some(sql), _)) => n -> sql.stripMargin.trim }.toMap

  /** Subset used by Bench as the headline set. */
  def headlines: Vector[String] = all.collect { case (n, d) if d.headline => n }
}
