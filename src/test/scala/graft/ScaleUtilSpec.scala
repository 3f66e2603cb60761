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
}
