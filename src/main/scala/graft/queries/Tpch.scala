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
          .agg(dsumGate($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      oracle = Some(s"""
        SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
          o_orderpriority,
          ${dsumGateSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
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
            dsumGate($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      oracle = Some(s"""
        SELECT r_name, n_name,
          ${dsumGateSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
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

    // Q7 shape: volume between customer-nation pairs through the full
    // order chain, yearly buckets.
    "q7_nation_volume" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val n1 = Engine.table(s, dir, "nation")
          .select($"n_nationkey".as("cust_nk"), $"n_name".as("cust_nation"))
        val n2 = Engine.table(s, dir, "nation")
          .select($"n_nationkey".as("supp_nk"), $"n_name".as("supp_nation"))
        val c = Engine.table(s, dir, "customer")
        val sup = Engine.table(s, dir, "supplier")
        val o = Engine.table(s, dir, "orders")
        val l = Engine.table(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
            && $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n1), c("c_nationkey") === $"cust_nk")
          .join(broadcast(n2), sup("s_nationkey") === $"supp_nk")
          .filter($"cust_nation" < $"supp_nation")
          .groupBy($"cust_nation", $"supp_nation",
            year($"l_shipdate").as("ship_year"))
          .agg(dsumGate($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("volume"),
            count(lit(1)).as("n_lines"))
      },
      oracle = Some(s"""
        SELECT cust_nation, supp_nation, ship_year,
          ${dsumGateSql("l_extendedprice * (1.0 - l_discount)")} AS volume,
          count(*) AS n_lines
        FROM (
          SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
            CAST(year(l_shipdate) AS INT) AS ship_year,
            l_extendedprice, l_discount
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            AND n1.n_name < n2.n_name)
        GROUP BY cust_nation, supp_nation, ship_year""")),

    // Q20 shape: nested correlated subqueries — suppliers whose stockable
    // parts saw above-average shipped quantity (exercises two levels of
    // decorrelation through the SQL entry path).
    "q20_excess_suppliers" -> QueryDef(
      fn = (s, dir) => {
        Engine.registerAll(s, dir)
        s.sql("""
          SELECT s_suppkey, s_name
          FROM supplier
          WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            GROUP BY l_suppkey, l_partkey
            HAVING sum(l_quantity) > (
              SELECT 4.0 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey))""")
      },
      oracle = Some("""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > (
            SELECT 4.0 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey))""")),

    // Custom TypedImperativeAggregate: exact sorted distinct-set per
    // group (the imperative-buffer extension point for sketches).
    // Gate output is the ','-joined set (raw arrays crash the external
    // comparator); the raw-array form is covered in OperatorSpec.
    "q_agg_imperative_set" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(graft.plans.DistinctSetAgg($"l_suppkey").as("raw_set"),
            count(lit(1)).as("n"))
          .select($"l_returnflag",
            array_join(transform($"raw_set", _.cast("string")), ",").as("supp_set"),
            $"n")
      },
      oracle = Some("""
        SELECT l_returnflag,
          array_to_string(list_transform(
            list(DISTINCT l_suppkey ORDER BY l_suppkey),
            x -> CAST(x AS VARCHAR)), ',') AS supp_set,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag"""))
  )
}
