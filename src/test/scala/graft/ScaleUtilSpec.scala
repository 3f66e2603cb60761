package graft

import java.nio.file.Files
import graft.operators.Salt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale utilities: salted joins (skew) and bucketed co-located joins
  * (shuffle elimination) — plan- and result-verified.
  */
class ScaleUtilSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals unsalted join on skewed data") {
    import spark.implicits._
    // heavily skewed: 90% of fact rows share one key
    val big = spark.range(20000)
      .select((when($"id" % 10 === 0, $"id" % 50).otherwise(lit(7L)))
        .as("k"), ($"id" * 2).as("v"))
    val small = spark.range(50).select($"id".as("k"), ($"id" + 100).as("w"))
    val expected = big.join(small, "k")
      .agg(count(lit(1)), sum($"v" + $"w")).head
    val salted = Salt.saltedJoin(big, small, Seq("k"), factor = 8,
        saltCols = Seq("v"))
      .agg(count(lit(1)), sum($"v" + $"w")).head
    assert(salted === expected)
  }

  test("bucketed tables join without an exchange on the bucketed key") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_wh").toFile.getAbsolutePath
    val prev = spark.conf.getOption("spark.sql.sources.bucketing.enabled")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      Engine.table(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Engine.table(spark, sf, "customer")
        .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")
      val j = spark.table("orders_b").join(spark.table("customer_b"),
        $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle either bucketed side
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
        !joinSection.contains("Exchange hashpartitioning(c_custkey"), plan)
      // and results match the plain join
      val expected = Engine.table(spark, sf, "orders")
        .join(Engine.table(spark, sf, "customer"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      prev.foreach(spark.conf.set("spark.sql.sources.bucketing.enabled", _))
    }
  }

  test("BenchStages.distill folds an event log into per-group metrics") {
    // a synthetic 3-event log: one tagged job with one task, plus an
    // untagged job and a truncated garbage line (must not throw)
    val log = Files.createTempFile("graft_evlog", ".json").toFile
    val lines = Seq(
      """{"Event":"SparkListenerJobStart","Job ID":0,"Submission Time":1000,"Stage IDs":[0],"Properties":{"spark.jobGroup.id":"q_test"}}""",
      """{"Event":"SparkListenerTaskEnd","Stage ID":0,"Task Info":{"Launch Time":1100,"Finish Time":2100},"Task Metrics":{"Executor Run Time":700,"Executor Deserialize Time":50,"Result Serialization Time":10,"JVM GC Time":80,"Input Metrics":{"Bytes Read":1048576},"Shuffle Read Metrics":{"Fetch Wait Time":20,"Local Bytes Read":2097152,"Remote Bytes Read":0},"Shuffle Write Metrics":{"Shuffle Bytes Written":3145728,"Shuffle Write Time":40000000}}}""",
      """{"Event":"SparkListenerJobEnd","Job ID":0,"Completion Time":2500}""",
      """{"Event":"SparkListenerJobStart","Job ID":1,"Submission Time":3000,"Stage IDs":[1]}""",
      """{"Event":"SparkListenerTaskEnd","Stage ID":1,"Task Info":{"Launch Time":3000,"Finish Time":3200},"Task Metrics":{"Executor Run Time":150,"Executor Deserialize Time":0,"Result Serialization Time":0,"JVM GC Time":0}}""",
      """{"Event":"SparkListenerJobEnd","Job ID":1,"Completion""")
    Files.write(log.toPath, lines.mkString("\n").getBytes("UTF-8"))
    val out = Files.createTempFile("graft_stages", ".json").toFile
    val n = BenchStages.distill(log, out)
    assert(n === 2)
    val body = new String(Files.readAllBytes(out.toPath), "UTF-8")
    // tagged group: wall 1.0s, run 0.7, gc 0.08, fetch-wait 0.02,
    // sched delay 1000-700-50-10-40 = 0.2, 1 MiB in / 2 MiB shuffle
    // read / 3 MiB written; untagged lands in "ungrouped" with its
    // truncated JobEnd ignored (job_wall 0)
    assert(body.contains(
      """"q_test":{"jobs":1,"job_wall_s":1.50,"tasks":1,"task_s":1.00,""" +
        """"run_s":0.70,"gc_s":0.08,"fetch_wait_s":0.02,""" +
        """"sched_delay_s":0.20,"input_mb":1.0,"sh_read_mb":2.0,""" +
        """"sh_write_mb":3.0}"""), body)
    assert(body.contains(""""ungrouped":{"jobs":1,"job_wall_s":0.00"""))
    log.delete(); out.delete()
  }
}
