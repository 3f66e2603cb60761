package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.api.GraftJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics not expressible through the DuckDB gate:
  * append-mode window closure by watermark, dedup-within-watermark,
  * foreachBatch, and the A16 job lifecycle.
  */
class StreamingExtrasSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  case class Ev(ts: Timestamp, k: String, v: Double)

  test("append mode emits only watermark-closed windows") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("append_wm")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Ev(ts(1), "a", 1.0), Ev(ts(5), "a", 2.0))
      q.processAllAvailable()
      assert(spark.table("append_wm").count() === 0) // window still open
      mem.addData(Ev(ts(31), "a", 3.0)) // watermark -> 10:26, closes 10:00-10
      q.processAllAvailable()
      val closed = spark.table("append_wm").collect()
      assert(closed.length === 1 && closed.head.getAs[Long]("n") === 2L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes in-window duplicates") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("k"))
      .writeStream.format("memory").queryName("ddww")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Ev(ts(1), "a", 1.0), Ev(ts(2), "a", 2.0), Ev(ts(3), "b", 3.0))
      q.processAllAvailable()
      val rows = spark.table("ddww").collect()
      assert(rows.map(_.getAs[String]("k")).sorted.toSeq === Seq("a", "b"))
    } finally q.stop()
  }

  test("foreachBatch sink receives every micro-batch exactly once") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        seen.put(id, batch.count()); ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(Ev(ts(1), "a", 1.0), Ev(ts(2), "b", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(3), "c", 3.0))
      q.processAllAvailable()
      val total = seen.values().stream().mapToLong(_.longValue()).sum()
      assert(total === 3L)
      assert(seen.size() >= 2)
    } finally q.stop()
  }

  test("GraftJob lifecycle: setup, compose, batch and streaming runs") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_job").toFile.getAbsolutePath
    var setupRan = false
    val job = new GraftJob {
      def name = "revenue_by_flag"
      override def setup(s: SparkSession, d: String): Unit = { setupRan = true }
      def compose(s: SparkSession, d: String): DataFrame =
        Engine.table(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .agg(sum($"l_quantity").as("q"))
    }
    GraftJob.runBatch(job, spark, sf, out)
    assert(setupRan)
    assert(spark.read.parquet(s"$out/revenue_by_flag").count() === 3)

    val streamJob = new GraftJob {
      def name = "events_passthrough"
      def compose(s: SparkSession, d: String): DataFrame = {
        val input = Engine.events(s, d)
        val inDir = s"$out/in"
        input.limit(100).write.mode("overwrite").parquet(inDir)
        s.readStream.schema(s.read.parquet(inDir).schema).parquet(inDir)
          .select($"event_id", $"event_type")
      }
    }
    val q = GraftJob.runStream(streamJob, spark, sf, out)
    q.awaitTermination()
    assert(spark.read.parquet(s"$out/events_passthrough").count() === 100)
  }

  test("checkpoint restart resumes state without reprocessing old files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_restart").toFile.getAbsolutePath
    val inDir = s"$root/in"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }
    run()
    Seq(("a", 4.0), ("c", 5.0)).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(inDir)
    val q2 = run()
    // exactly-once resumption: the restarted query reads ONLY the new
    // file's 2 rows (offsets recovered), yet key "a" continues from the
    // recovered state-store count, not from zero.
    val run2Rows = q2.recentProgress.map(_.numInputRows).sum
    assert(run2Rows === 2L, s"wave-1 files were reprocessed: $run2Rows rows")
    val fin = spark.read.parquet(sink).groupBy($"k").agg(max($"n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fin === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("transformWithState restarts from checkpointed RocksDB state") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft_tws").toFile.getAbsolutePath
      val inDir = s"$root/in"
      val sink = s"$root/sink"
      val ckpt = s"$root/ckpt"
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
        .repartition(2).write.mode("overwrite").parquet(inDir)
      val schema = spark.read.parquet(inDir).schema
      def run(): org.apache.spark.sql.streaming.StreamingQuery = {
        val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir)
          .as[(String, Double)]
          .groupByKey(_._1)
          .transformWithState(new TwsCountProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF("k", "n")
          .writeStream.outputMode("update")
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        q
      }
      run()
      Seq(("a", 4.0), ("c", 5.0)).toDF("k", "v")
        .repartition(1).write.mode("append").parquet(inDir)
      val q2 = run()
      // exactly-once resumption through the NEW stateful API: run 2
      // reads only the appended file, and key "a" continues from the
      // RocksDB-recovered ValueState count.
      val run2Rows = q2.recentProgress.map(_.numInputRows).sum
      assert(run2Rows === 2L, s"wave-1 files were reprocessed: $run2Rows rows")
      val fin = spark.read.parquet(sink).groupBy($"k").agg(max($"n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fin === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    } finally prev match {
      case Some(p) => spark.conf.set(confKey, p)
      case None    => spark.conf.unset(confKey)
    }
  }

  test("bigSink parquet replay equals the memory-sink replay row-for-row") {
    import spark.implicits._
    // r19: the stream-stream joins drain through a parquet sink
    // (executor-parallel) instead of the memory sink's driver
    // collect. Append mode emits each result row exactly once in both
    // sinks, so the drained sets must be identical — pinned here on a
    // replayed stateless append (the sink swap is orthogonal to what
    // the query computes).
    def drained(big: Boolean) = graft.streaming.Replay.run(
        spark, graft.streaming.Replay.events(spark, sf)
          .select(col("event_id"), col("event_type"), col("value")),
        mode = "append", bigSink = big) { st =>
        st.filter(col("event_type") =!= "click")
          .withColumn("v2", col("value") * 2)
      }.select(col("event_id"), col("event_type"), col("v2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val viaParquet = drained(big = true)
    val viaMemory = drained(big = false)
    assert(viaParquet.nonEmpty)
    assert(viaParquet === viaMemory)
  }
}

/** Per-key running count through the Spark-4 arbitrary-state API (test
  * companion to graft.streaming.RunningStatsProcessor).
  */
class TwsCountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    String, (String, Double), (String, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var st: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Double)],
      timers: TimerValues): Iterator[(String, Long)] = {
    val n = (if (st.exists()) st.get() else 0L) + rows.size
    st.update(n)
    Iterator.single((key, n))
  }
}
