package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import graft.functions.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Join surface (SURVEY.md §2B-3): every join type, plus range and as-of
  * joins composed from built-ins (reference centerpiece A9's batch analog).
  *
  * Scale notes:
  *   - fact⋈fact joins (lineitem⋈orders) shuffle on the join key —
  *     correct at 100 TB; AQE handles skew splits.
  *   - dim joins (part, nation) use explicit broadcast() so no shuffle
  *     of the fact side is wasted.
  *   - the as-of join is the union+running-last trick: ONE shuffle by
  *     user_id, no range explosion, no cross product — this is the
  *     formulation that survives scale (a naive join+filter+argmax is
  *     quadratic per key).
  */
object Joins extends QueryModule {

  def defs: Vector[(String, QueryDef)] = Vector(

    // Inner equi join of the two fact tables (shuffle join at scale).
    "q_join_inner" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
        val o = Engine.table(s, dir, "orders")
        // revenue on quantized longs (see q1_agg): exact integer units
        // cents x (100-d) summed in int64, reconstituted once per group
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy($"o_orderpriority")
          .agg(
            (sum(floor($"l_extendedprice" * 100.0 + 0.5).cast(LongType)
              * (lit(100L) - floor($"l_discount" * 100.0 + 0.5).cast(LongType)))
              .cast(DoubleType) / 10000.0).as("revenue"),
            count(lit(1)).as("n"))
      },
      oracle = Some(s"""
        SELECT o_orderpriority,
          CAST(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
            * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) AS DOUBLE)
            / 10000.0 AS revenue,
          count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority"""),
      headline = true),

    // Left outer: customers keep rows with no orders (count skips nulls).
    "q_join_left" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
        val o = Engine.table(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy($"c_mktsegment")
          .agg(count($"o_orderkey").as("n_orders"), count(lit(1)).as("n_rows"))
      },
      oracle = Some("""
        SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment""")),

    // Right outer (symmetric form).
    "q_join_right" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val o = Engine.table(s, dir, "orders")
        val c = Engine.table(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy($"c_mktsegment")
          .agg(count($"o_orderkey").as("n_orders"), count(lit(1)).as("n_rows"))
      },
      oracle = Some("""
        SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // Full outer over per-nation aggregates (nulls on both sides).
    "q_join_full" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .groupBy($"c_nationkey").agg(count(lit(1)).as("c_cnt"))
        val sup = Engine.table(s, dir, "supplier")
          .groupBy($"s_nationkey").agg(count(lit(1)).as("s_cnt"))
        c.join(sup, $"c_nationkey" === $"s_nationkey", "full")
          .select(
            coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
            $"c_cnt", $"s_cnt")
      },
      oracle = Some("""
        SELECT coalesce(c_nationkey, s_nationkey) AS nationkey, c_cnt, s_cnt
        FROM (SELECT c_nationkey, count(*) AS c_cnt FROM customer GROUP BY 1) cc
        FULL JOIN (SELECT s_nationkey, count(*) AS s_cnt FROM supplier GROUP BY 1) ss
          ON c_nationkey = s_nationkey""")),

    // Left semi: EXISTS.
    "q_join_semi" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
        val o = Engine.table(s, dir, "orders")
          .filter($"o_totalprice" > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
      },
      oracle = Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""")),

    // Left anti: NOT EXISTS.
    "q_join_anti" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
        val o = Engine.table(s, dir, "orders")
          .filter($"o_orderpriority" === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name")
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')""")),

    // Cross join (small dims only — BNLJ is fine for 5x25).
    "q_join_cross" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val r = Engine.table(s, dir, "region")
        val n = Engine.table(s, dir, "nation")
        r.crossJoin(n).select($"r_name", $"n_name", $"n_regionkey", $"r_regionkey")
      },
      oracle = Some("""
        SELECT r_name, n_name, n_regionkey, r_regionkey FROM region CROSS JOIN nation""")),

    // Broadcast hint: fact ⋈ broadcast(dim) — no shuffle of lineitem.
    "q_join_broadcast" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
        val p = Engine.table(s, dir, "part")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy($"p_brand")
          .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand"""),
      headline = true),

    // SHUFFLE_HASH hint: force a shuffled hash join where the planner
    // would default to sort-merge — the right strategy when one side is
    // far smaller than the other but above the broadcast threshold (the
    // hash build skips BOTH sort passes). Plan-asserted in OperatorSpec;
    // semantics identical to the plain join, which is what the oracle
    // checks.
    "q_join_hash_hint" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
        val o = Engine.table(s, dir, "orders")
          .filter($"o_orderpriority" === "1-URGENT").hint("shuffle_hash")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      },
      oracle = Some("""
        SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus""")),

    // NULL-SAFE equality join (<=>): NULL keys match each other instead
    // of disappearing — the semantics a dedup/reconciliation join needs
    // when the key is legitimately nullable. Nullable keys are derived
    // deterministically (every 1000th key nulled on both sides — kept
    // SPARSE on purpose: NULL <=> NULL matches every null-null pair, so
    // a dense null column is a self-inflicted hot key; at scale you
    // pre-filter or salt the null stripe). DuckDB mirror is IS NOT
    // DISTINCT FROM. Still a hash join: <=> is an equi comparison, not
    // a residual.
    "q_join_nullsafe" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select(when($"c_custkey" % 1000 === 0, lit(null).cast("bigint"))
            .otherwise($"c_custkey").as("k"), $"c_acctbal")
        val o = Engine.table(s, dir, "orders")
          .select(when($"o_custkey" % 1000 === 0, lit(null).cast("bigint"))
            .otherwise($"o_custkey").as("k"), $"o_totalprice")
        c.join(o, c("k") <=> o("k"))
          .groupBy(c("k").isNull.as("null_key"))
          .agg(count(lit(1)).as("n"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT CASE WHEN c_custkey % 1000 = 0 THEN NULL
                      ELSE c_custkey END AS k, c_acctbal
          FROM customer),
        o AS (
          SELECT CASE WHEN o_custkey % 1000 = 0 THEN NULL
                      ELSE o_custkey END AS k, o_totalprice
          FROM orders)
        SELECT c.k IS NULL AS null_key, count(*) AS n
        FROM c JOIN o ON c.k IS NOT DISTINCT FROM o.k
        GROUP BY c.k IS NULL""")),

    // Theta residual on an equi backbone: same nation, acctbal ordering.
    // (Equi key keeps it a hash/SMJ join at scale; the inequality is a
    // post-join residual, not a BNLJ.)
    "q_join_theta" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val sup = Engine.table(s, dir, "supplier")
        val c = Engine.table(s, dir, "customer")
        sup.join(c, sup("s_nationkey") === c("c_nationkey")
            && sup("s_acctbal") > c("c_acctbal"))
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), dsumGate($"s_acctbal" - $"c_acctbal").as("sum_gap"))
      },
      oracle = Some(s"""
        SELECT s_nationkey, count(*) AS n,
          ${dsumGateSql("s_acctbal - c_acctbal")} AS sum_gap
        FROM supplier JOIN customer
          ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        GROUP BY s_nationkey""")),

    // Skew-salted join through the gate: the big side's hot keys are
    // spread over 8 salt buckets (deterministic salt from the row's
    // stable id columns), the small side replicated per salt — result
    // identical to the plain join, shuffle balanced under key skew.
    "q_join_salted" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
        graft.operators.Salt.saltedJoin(li, sup, Seq("l_suppkey"),
          factor = 8, saltCols = Seq("l_orderkey", "l_linenumber"))
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"),
            dsumGate($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      },
      oracle = Some(s"""
        SELECT s_nationkey, count(*) AS n,
          ${dsumGateSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey""")),

    // Pure non-equi theta join (no equi backbone): plans as a broadcast
    // nested-loop join — only acceptable when one side is tiny (here
    // region x nation); large-scale theta joins must use the equi-residual
    // form above.
    "q_join_theta_pure" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val r = Engine.table(s, dir, "region")
        val n = Engine.table(s, dir, "nation")
        r.join(n, r("r_regionkey") < n("n_regionkey"))
          .select($"r_name", $"n_name", $"r_regionkey", $"n_regionkey")
      },
      oracle = Some("""
        SELECT r_name, n_name, r_regionkey, n_regionkey
        FROM region JOIN nation ON r_regionkey < n_regionkey""")),

    // Range join: equi key + time-band residual.
    "q_join_range" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
        val o = Engine.table(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey")
            && li("l_shipdate") >= o("o_orderdate")
            && li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .groupBy(date_trunc("month", $"o_orderdate").as("order_month"))
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      },
      oracle = Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
          count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        GROUP BY 1""")),

    // As-of join (nearest purchase at ts <= click ts per user), composed
    // scale-safely: union both sides, one shuffle by user_id, running
    // last_value(ignore nulls) — vs DuckDB's native ASOF LEFT JOIN.
    "q_join_asof" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val e = Engine.table(s, dir, "events")
        // collapse same-(user,ts) purchases deterministically
        val purch = e.filter($"event_type" === "purchase")
          .groupBy($"user_id", $"ts").agg(max($"value").as("p_value"))
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id")
        val u = purch.select($"user_id", $"ts", lit(0).as("tag"),
            $"ts".as("p_ts"), $"p_value", lit(null).cast("long").as("event_id"))
          .unionByName(clicks.select($"user_id", $"ts", lit(1).as("tag"),
            lit(null).cast("timestamp").as("p_ts"),
            lit(null).cast("double").as("p_value"), $"event_id"))
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"tag")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("last_p_ts", last($"p_ts", ignoreNulls = true).over(w))
          .withColumn("last_p_value", last($"p_value", ignoreNulls = true).over(w))
          .filter($"tag" === 1)
          .select($"user_id", $"event_id", $"ts", $"last_p_ts", $"last_p_value")
      },
      oracle = Some("""
        SELECT c.user_id, c.event_id, CAST(c.ts AS TIMESTAMP) AS ts,
          CAST(p.ts AS TIMESTAMP) AS last_p_ts, p.p_value AS last_p_value
        FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (
          SELECT user_id, ts, max(value) AS p_value FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts) p
          ON c.user_id = p.user_id AND c.ts >= p.ts"""))
  )
}
