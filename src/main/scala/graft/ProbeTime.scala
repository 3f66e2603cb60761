package graft

/** Perf probe: split a query's wall time into DataFrame construction
  * (query fn call — catalog checks, pointer reads, lifecycle forcing)
  * vs noop-sink execution (analysis+planning+codegen+jobs), per run.
  * Usage: graft.ProbeTime <sfDir> <n_runs> <queryName> [more...]
  * (Performance tooling for the optimization rounds — not a contract
  * surface; Bench remains the timing record.)
  */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val spark = Engine.session("graft-probe")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(): Unit }
      })
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    args.drop(2).foreach { name =>
      (1 to n).foreach { i =>
        val j0 = jobs.get()
        val (df, tBuild) = t(SparkEntry.queries(name)(spark, sfDir))
        val jBuild = jobs.get() - j0
        val (_, tExec) = t {
          df.write.format("noop").mode("overwrite").save()
        }
        val jExec = jobs.get() - j0 - jBuild
        println(f"[probe] $name run$i build=$tBuild%.2fs exec=$tExec%.2fs" +
          s" jobs=$jBuild+$jExec")
      }
    }
    spark.stop()
  }
}
