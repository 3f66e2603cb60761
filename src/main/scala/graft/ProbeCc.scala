package graft

import org.apache.spark.sql.functions._

/** Perf probe (r20): per-phase wall breakdown of the connected-components
  * fixpoint as q_llm_dedup_clusters drives it — pair generation, per-round
  * materialization, convergence check — plus job counts per phase.
  * Usage: graft.ProbeCc <sfDir> [nRuns]
  * (Performance tooling for the optimization rounds — not a contract
  * surface.)
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nRuns = if (args.length > 1) args(1).toInt else 2
    val spark = Engine.session("graft-probe-cc")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(): Unit }
      })
    def t[A](tag: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cc] $tag%-28s ${dt}%6.3fs jobs=${jobs.get() - j0}")
      a
    }
    (1 to nRuns).foreach { run =>
      println(s"[cc] ---- run $run ----")
      val d = graft.queries.LlmText.withNearDups(spark, sfDir)
        .select($"doc_id",
          array_distinct(transform(split($"text", " "),
            x => xxhash64(x, $"source"))).as("hs"))
        .withColumn("nw", size($"hs"))
      val tok = d.select($"doc_id", $"nw", explode($"hs").as("wh"))
        .repartition(spark.sparkContext.defaultParallelism * 2, $"wh")
      val pairs = tok.as("a").join(tok.as("b"),
        $"a.wh" === $"b.wh" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
          $"a.nw".as("na"), $"b.nw".as("nb"))
        .agg(count(lit(1)).as("inter"))
        .filter($"inter".cast("double")
          / ($"na" + $"nb" - $"inter") >= 0.7)
        .select($"doc_a", $"doc_b")
      // inline copy of ConnectedComponents.label with per-phase timing
      val p = t("pairs.localCheckpoint")(
        pairs.select($"doc_a".as("pa"), $"doc_b".as("pb")).localCheckpoint())
      val edges = p.select($"pa".as("src"), $"pb".as("dst"))
        .unionByName(p.select($"pb".as("src"), $"pa".as("dst")))
      var labels = t("init labels checkpoint")(
        p.select($"pa".as("id")).unionByName(p.select($"pb".as("id")))
          .distinct().withColumn("lab", $"id").localCheckpoint())
      var round = 0
      var converged = false
      while (!converged && round < 25) {
        val nbr = edges.join(labels, edges("dst") === labels("id"))
          .groupBy($"src").agg(min($"lab").as("nlab"))
        val next = t(s"round $round materialize")(
          labels.join(nbr, labels("id") === nbr("src"), "left")
            .select(labels("id"),
              least(labels("lab"), coalesce($"nlab", labels("lab")))
                .as("lab"),
              labels("lab").as("prev"))
            .localCheckpoint())
        converged = t(s"round $round isEmpty")(
          next.filter($"lab" < $"prev").isEmpty)
        labels = next.select($"id", $"lab")
        round += 1
      }
      println(s"[cc] converged after $round rounds")
    }
    spark.stop()
  }
}
