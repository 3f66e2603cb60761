package graft

/** Plan inspector: prints the formatted physical plan of named queries.
  * Usage: graft.Explain [-x] <sfDir> <queryName> [queryName ...]
  * With -x the query is first executed (noop sink) so the printed plan
  * is the FINAL adaptive plan — AQE join strategy switches, runtime
  * exchange/stage reuse, and coalesced partitions all resolved — rather
  * than the static `isFinalPlan=false` initial plan.
  * (Performance tooling — used to audit pushdown/broadcast/codegen.)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val execute = args.head == "-x"
    val rest = if (execute) args.tail else args
    val sfDir = rest.head
    val spark = Engine.session("graft-explain")
    rest.tail.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (execute) {
        // Materialize through df's OWN QueryExecution (a write would
        // clone the plan and leave df.queryExecution un-executed).
        val n = df.collect().length
        println(s"-- rows: $n")
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
