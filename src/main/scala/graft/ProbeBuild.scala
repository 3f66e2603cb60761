package graft

/** Perf probe: run the write-once artifact builds exactly as Bench
  * does (fresh JVM = fresh catalog = full build) and print each build
  * line's wall — with the ivf_estate per-stage stderr breakdown.
  * Usage: graft.ProbeBuild <sfDir>
  * (Performance tooling for the optimization rounds.) */
object ProbeBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Engine.session("graft-probe-build")
    graft.queries.LlmSim.annArtifactBuilds(spark, sfDir).foreach {
      case (n, f) =>
        val t0 = System.nanoTime(); f()
        println(f"[build] $n total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
