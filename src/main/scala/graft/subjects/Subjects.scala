package graft.subjects

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Typed publish/subscribe subject layer — the Spark-native analog of the
  * reference's subject library (SURVEY.md §2A A2/A6/A7/A8): a subject is
  * a named, schema-fixed Dataset registered in the session catalog (the
  * catalog replaces the ZooKeeper registry; no coordination service is
  * needed driver-side).
  *
  * Records published to a subject carry two metadata columns, mirroring
  * the reference's record model:
  *   - `_action`: "add" | "remove" (bag/retraction semantics, A7);
  *   - `_trail`:  struct(source, key) provenance (A8) — `key` is a
  *     60-bit md5-derived hash of the declared key columns, so trails
  *     are reproducible cross-engine and flow through joins as data.
  */
final class SubjectRegistry(spark: SparkSession) {

  private val known = scala.collection.concurrent.TrieMap[String, Seq[String]]()

  /** Publish a DataFrame as subject `name` keyed by `keyCols`; returns the
    * trailed view (also registered as a temp view for SQL access).
    */
  def publish(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val trailed = Trail.attach(df, name, keyCols)
    trailed.createOrReplaceTempView(name)
    known.put(name, keyCols)
    trailed
  }

  /** Typed publish (case-class subject, reference A1/A6 analog). */
  def publishTyped[T <: Product: Encoder](
      name: String, ds: Dataset[T], keyCols: Seq[String]): DataFrame =
    publish(name, ds.toDF(), keyCols)

  /** Look up a registered subject. */
  def subject(name: String): DataFrame = spark.table(name)

  def exists(name: String): Boolean = known.contains(name)
  def remove(name: String): Unit = {
    known.remove(name); spark.catalog.dropTempView(name): Unit
  }
}

object Trail {

  /** Attach `_action`/`_trail` metadata (A7/A8). */
  def attach(df: DataFrame, source: String, keyCols: Seq[String]): DataFrame =
    df.withColumn("_action", lit("add"))
      .withColumn("_trail", struct(
        lit(source).as("source"),
        Fns.h60(concat_ws("", keyCols.map(col): _*)).as("key")))

  /** Compose two trails across a join (reference ComposedSource analog):
    * source concatenation + hash-combined key.
    */
  def combine(left: Column, right: Column): Column = struct(
    concat_ws("*", left.getField("source"), right.getField("source")).as("source"),
    Fns.h60(concat_ws(":",
      left.getField("key").cast("string"),
      right.getField("key").cast("string"))).as("key"))
}
