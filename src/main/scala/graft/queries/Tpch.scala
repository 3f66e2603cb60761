package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import graft.functions.Fns._
import org.apache.spark.sql.functions._

/** Multi-join analytical headliners in TPC-H Q3/Q5 shape: the plans that
  * exercise Catalyst's join ordering, broadcast selection, and partial
  * aggregation across 3- and 5-way joins — the backbone shapes of a
  * 100 TB warehouse workload.
  */
object Tpch extends QueryModule {

  def defs: Vector[(String, QueryDef)] = Vector(

    // Q3 shape: shipping priority — 3-way join, filtered both ends,
    // revenue top-10.
    "q3_shipping" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .filter($"c_mktsegment" === "BUILDING")
        val o = Engine.table(s, dir, "orders")
          .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
        val l = Engine.table(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1996-03-15").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      oracle = Some(s"""
        SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
          o_orderpriority,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      headline = true),

    // Q5 shape: local supplier volume — 5-way join through the full
    // star (dims broadcast, facts shuffled on keys).
    "q5_local_supplier" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val r = Engine.table(s, dir, "region")
        val n = Engine.table(s, dir, "nation")
        val c = Engine.table(s, dir, "customer")
        val o = Engine.table(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
            && $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        val l = Engine.table(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy($"r_name", $"n_name")
          .agg(
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      oracle = Some(s"""
        SELECT r_name, n_name,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
          count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY r_name, n_name"""),
      headline = true),

    // The custom DotProduct expression through the SQL surface: register
    // it in the function registry, call it from SQL text (B-11 row:
    // custom Expression exposed as a SQL function).
    "q_sql_dot_product" -> QueryDef(
      fn = (s, dir) => {
        graft.plans.DotProduct.register(s)
        Engine.table(s, dir, "embeddings").createOrReplaceTempView("emb_v")
        s.sql("""
          SELECT vec_id, label,
            dot_product(CAST(embedding AS ARRAY<DOUBLE>),
                        CAST(embedding AS ARRAY<DOUBLE>)) AS norm2
          FROM emb_v""")
      },
      oracle = Some("""
        SELECT vec_id, label,
          list_reduce(list_prepend(0.0, list_transform(
            list_transform(embedding, x -> CAST(x AS DOUBLE)),
            x -> x * x)), (a, b) -> a + b) AS norm2
        FROM embeddings""")),

    // Custom TypedImperativeAggregate: exact sorted distinct-set per
    // group (the imperative-buffer extension point for sketches).
    "q_agg_imperative_set" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(graft.plans.DistinctSetAgg($"l_suppkey").as("supp_set"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT l_returnflag, list(DISTINCT l_suppkey ORDER BY l_suppkey)
          AS supp_set, count(*) AS n
        FROM lineitem GROUP BY l_returnflag"""))
  )
}
