package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line.
  *
  * Methodology (BASELINE.md protocol): EVERY query gets 3 timed runs ->
  * median (headlines get one extra discarded warmup first). Single runs
  * proved too noisy to compare across machines (round-2 driver runs
  * contradicted local runs by 3-8x on a contiguous cluster); the median
  * absorbs one bad run per query. Results are materialized through the
  * noop sink so the full projection executes (a count() would let
  * Catalyst prune the columns being benchmarked).
  */
object Bench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Engine.session("graft-bench")

    def runOnce(name: String): Double = {
      // job-group tag: when the driver box runs with event logs, every
      // stage in the log carries the query name — an inflation window
      // (see PLANS.md r8) becomes attributable without re-measurement
      spark.sparkContext.setJobGroup(name, name)
      val t =
        try time {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        } finally spark.sparkContext.clearJobGroup()
      spark.catalog.clearCache() // streaming replays cache their sinks
      t
    }

    // JVM/codegen/file-listing warmup on the flagship.
    runOnce("q1_agg")

    // optional args: bench only the named queries (local fast loop; the
    // driver always runs with no args = full corpus)
    val only = args.toSet
    val headlines = SparkEntry.headlines.toSet
    val results = SparkEntry.all
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, _) =>
      val t =
        try {
          if (headlines(name)) runOnce(name) // extra warmup
          val ts = Seq.fill(3)(runOnce(name)).sorted
          ts(1)
        } catch {
          case e: Throwable =>
            // Never swallow: a silent -1 cost round 6 its bench. The
            // driver captures stderr, so the stack trace is auditable.
            System.err.println(s"[bench] $name FAILED: $e")
            e.printStackTrace()
            -1.0
        }
      name -> t
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // A query that threw is recorded as -1 in `queries`; surface it
    // explicitly so a failure can't silently shrink the headline total.
    val failed = results.collect { case (n, v) if v < 0 => "\"" + n + "\"" }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":${failed.mkString("[", ",", "]")},""" +
        s""""n_failed":${failed.size},"ok":${failed.isEmpty},"sf":"$sfDir"}"""
    println(line)
    // Sidecar with ALL per-query times: the driver's BENCH_rN.json stores
    // stdout as a truncated string, which silently drops most of the
    // corpus from the auditable record. Full-corpus runs (no arg filter)
    // also persist the complete JSON to a committable file.
    if (only.isEmpty) {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
