package graft

/** Plan inspector: prints the formatted physical plan of named queries.
  * Usage: graft.Explain <sfDir> <queryName> [queryName ...]
  * (Performance tooling — used to audit pushdown/broadcast/codegen.)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Engine.session("graft-explain")
    args.tail.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
