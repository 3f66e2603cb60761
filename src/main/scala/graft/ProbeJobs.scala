package graft

/** Perf probe: after settling the estate, count Spark jobs triggered
  * by each committed lifecycle READ individually (job-group scoped).
  * Usage: graft.ProbeJobs <sfDir> */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val spark = Engine.session("graft-probe-jobs")
    import graft.queries.LlmSim
    SparkEntry.queries("q_llm_index_health")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null && g.startsWith("probe_"))
          counts.merge(g, 1L, (a, b) => a + b): Unit
      }
    }
    spark.sparkContext.addSparkListener(l)
    def run(tag: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobGroup(s"probe_$tag", tag)
      try f finally spark.sparkContext.clearJobGroup()
    }
    run("fold4")(LlmSim.persistedSegFold4(spark, sf): Unit)
    run("fold4cent")(LlmSim.segFold4Centroids(spark, sf): Unit)
    run("fold4codes")(LlmSim.segFold4RpqCodes(spark, sf): Unit)
    run("rn3")(LlmSim.renumberedEstateGen(spark, sf, 3): Unit)
    run("fold3codes")(LlmSim.segFold3RpqCodes(spark, sf): Unit)
    run("fold2codes")(LlmSim.segFold2RpqCodes(spark, sf): Unit)
    run("retrain")(LlmSim.retrainRpqCodebooks(spark, sf))
    org.apache.spark.sql.graftbridge.SqlBridge.waitListenerBus(spark)
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"[jobs] $k=$v") }
    println("[jobs] done")
    spark.stop()
  }
}
