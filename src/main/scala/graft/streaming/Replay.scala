package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Batch -> stream replay harness (SURVEY.md §2B-9, FIXTURES.md pattern):
  * materialize a batch DataFrame as a multi-file parquet directory, then
  * read it back with readStream + AvailableNow so a real incremental
  * MicroBatchExecution (with state, watermarks, and multiple triggers via
  * maxFilesPerTrigger) drives the query to completion synchronously.
  *
  * This is how the engine's streaming operators are made t2-checkable:
  * the drained sink table is an ordinary DataFrame the DuckDB oracle can
  * hash-match.
  */
object Replay {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Replay `input` as a stream through `build`, drain with AvailableNow,
    * return the sink contents. `mode` is the sink output mode
    * ("complete" for windowed aggs, "append" for joins/dedup/fMGWS).
    */
  def run(
      spark: SparkSession,
      input: DataFrame,
      mode: String,
      filesPerTrigger: Int = 2,
      nFiles: Int = 8)(build: DataFrame => DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft_replay").toFile.getAbsolutePath
    // Range-partition by the first column set ordered upstream (callers
    // pass time-ordered data) so files arrive roughly in event-time order
    // and watermarks advance realistically across micro-batches.
    input.repartition(nFiles).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(s"$dir/in")
    val qname = s"graft_sink_${counter.incrementAndGet()}"
    val q = build(stream).writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(qname).cache()
    out.count() // materialize before the temp dir could be cleaned
    out
  }

  /** Time-ordered replay of the events table. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    graft.Engine.events(spark, sfDir).orderBy(col("ts"))
}
