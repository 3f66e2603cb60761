package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Job abstraction (reference A16 analog: AbstractPlugin's
  * setup/compose/execute lifecycle). A job declares its composition as a
  * DataFrame; the runner decides batch vs streaming execution — the same
  * split the reference delegated to env.execute().
  */
trait GraftJob {
  def name: String

  /** Register/prepare subjects (A16 setup step). Default: nothing. */
  def setup(spark: SparkSession, sfDir: String): Unit = ()

  /** Declare the job's output (A16 compose step). */
  def compose(spark: SparkSession, sfDir: String): DataFrame
}

object GraftJob {

  /** Batch execution: materialize to parquet. */
  def runBatch(job: GraftJob, spark: SparkSession, sfDir: String, outDir: String): Unit = {
    job.setup(spark, sfDir)
    job.compose(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/${job.name}")
  }

  /** Streaming execution: drain a streaming composition into parquet
    * with AvailableNow (checkpointed, restartable).
    */
  def runStream(job: GraftJob, spark: SparkSession, sfDir: String, outDir: String): StreamingQuery = {
    job.setup(spark, sfDir)
    job.compose(spark, sfDir).writeStream
      .format("parquet")
      .option("path", s"$outDir/${job.name}")
      .option("checkpointLocation", s"$outDir/${job.name}_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
