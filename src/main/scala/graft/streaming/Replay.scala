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
  // Materialized replay inputs (dir + schema), keyed by caller tag
  // (bench reruns the same streaming query several times; the input
  // parquet is identical, so both the write and the footer read are
  // paid once per key per JVM).
  private val inputCache = scala.collection.concurrent.TrieMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** Replay `input` as a stream through `build`, drain with AvailableNow,
    * return the sink contents. `mode` is the sink output mode
    * ("complete" for windowed aggs, "append" for joins/dedup/fMGWS).
    * `cacheKey`, when set, reuses the materialized input across calls.
    */
  def run(
      spark: SparkSession,
      input: DataFrame,
      mode: String,
      filesPerTrigger: Int = 2,
      nFiles: Int = 4,
      cacheKey: String = "")(build: DataFrame => DataFrame): DataFrame = {
    val key = if (cacheKey.isEmpty) s"anon_${counter.incrementAndGet()}"
      else s"$cacheKey/$nFiles"
    val (dir, schema) = inputCache.getOrElseUpdate(key, {
      val d = graft.Engine.scratchDir("graft_replay")
      input.repartition(nFiles).write.mode("overwrite").parquet(s"$d/in")
      (d, spark.read.parquet(s"$d/in").schema)
    })
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(s"$dir/in")
    val qname = s"graft_sink_${counter.incrementAndGet()}"
    // Stateful streaming ops create one state-store partition per shuffle
    // partition PER MICRO-BATCH; at replay scale 4 is plenty (a cluster
    // deployment would size this to executor count instead).
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try build(stream).writeStream
        .format("memory")
        .queryName(qname)
        .outputMode(mode)
        // fresh per-run scratch checkpoint (tmpfs when available): this
        // replay drains once and discards; restart-durable checkpoints
        // are exercised by q_stream_restart with an explicit location
        .option("checkpointLocation", graft.Engine.scratchDir("ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    q.awaitTermination()
    // Perf forensics (r19, env-guarded): per-micro-batch duration
    // breakdown — where a replayed query's fixed floor actually goes
    // (planning vs state commit vs sink add). Stderr only.
    if (sys.env.contains("GRAFT_STREAM_DEBUG"))
      q.recentProgress.foreach(p => System.err.println(
        s"[replay] $qname batch=${p.batchId} rows=${p.numInputRows} " +
          p.durationMs))
    // spark.table analyzes eagerly, so the returned frame's plan holds a
    // direct reference to the memory sink's rows; dropping the temp view
    // immediately after removes the session-lifetime catalog pin without
    // copying the data. The sink stays readable for as long as the caller
    // references the frame and becomes GC-able afterwards — bench runs
    // every streaming query 3x, so without this each run leaked one
    // driver-resident sink for the life of the session.
    val out = spark.table(qname)
    spark.catalog.dropTempView(qname)
    out
  }

  /** Time-ordered replay of the events table. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    graft.Engine.events(spark, sfDir).orderBy(col("ts"))
}
