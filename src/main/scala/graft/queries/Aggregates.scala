package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import graft.functions.Fns._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation surface (SURVEY.md §2B-4): hash agg with partial/final
  * phases (Catalyst plans map-side combine automatically), count distinct,
  * grouping sets/rollup/cube, deterministic statistics.
  *
  * Scale: every query here is a single shuffle on the group keys with
  * partial aggregation before the exchange — the canonical
  * scales-to-100TB shape. No collect, no driver loops.
  */
object Aggregates extends QueryModule {

  def defs: Vector[(String, QueryDef)] = Vector(

    // Observation API (CollectMetrics): per-pass dataset metrics
    // gathered as a SIDE CHANNEL of a real query — zero extra scans, the
    // accumulator pattern a 100 TB pipeline uses for row-count /
    // quality-gate telemetry instead of re-running audits. The observed
    // values are returned AS the result frame so the oracle can check
    // them; the observed query itself is forced through a noop sink.
    "q_agg_observe" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val obs = new org.apache.spark.sql.Observation()
        Engine.table(s, dir, "lineitem")
          .observe(obs,
            count(lit(1)).as("n_rows"),
            sum(when($"l_returnflag" === "R", 1L).otherwise(0L))
              .as("n_returned"),
            max($"l_quantity").as("max_qty"))
          .filter($"l_quantity" > 0) // the "real" downstream query
          .write.format("noop").mode("overwrite").save()
        val m = obs.get
        Seq((m("n_rows").asInstanceOf[Long],
          m("n_returned").asInstanceOf[Long],
          m("max_qty").asInstanceOf[Double]))
          .toDF("n_rows", "n_returned", "max_qty")
      },
      oracle = Some("""
        SELECT count(*) AS n_rows,
          CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
          max(l_quantity) AS max_qty
        FROM lineitem""")),

    // count_if / filtered aggregation — the conditional-count shorthand
    // (DuckDB mirrors with FILTER clauses).
    "q_agg_count_if" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(count_if($"o_totalprice" > 200000.0).as("n_big"),
            count_if($"o_orderstatus" === "F").as("n_finished"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT o_orderpriority,
          count(*) FILTER (o_totalprice > 200000.0) AS n_big,
          count(*) FILTER (o_orderstatus = 'F') AS n_finished,
          count(*) AS n
        FROM orders GROUP BY o_orderpriority""")),

    // Fixed-width HISTOGRAM of order totals: bucket = floor(x / width)
    // (identical single IEEE divide + floor in both engines) — the
    // distribution profile an ingest monitor computes per batch. One
    // scan, one tiny shuffle on bucket ids.
    "q_agg_histogram" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders")
          .select(floor($"o_totalprice" / 25000.0).cast("long").as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"))
          .withColumn("lo", $"bucket" * 25000.0)
      },
      oracle = Some("""
        SELECT bucket, count(*) AS n,
          bucket * CAST(25000.0 AS DOUBLE) AS lo
        FROM (SELECT CAST(floor(o_totalprice / CAST(25000.0 AS DOUBLE))
                AS BIGINT) AS bucket FROM orders)
        GROUP BY bucket""")),

    // TPC-H Q1 shape: the flagship scan->filter->agg pipeline.
    //
    // Money columns are exact 2-dp decimals stored as doubles, so the
    // aggregation runs on QUANTIZED LONGS (the q_agg_stats pattern):
    // cents/discount/tax become int64, every per-row product and every
    // sum is exact integer arithmetic that stays in whole-stage codegen —
    // ~4x faster than decimal(28,10) sums, same exact-arithmetic
    // guarantee, mirrored term-for-term by the oracle. sum_charge's
    // units (cents x (100-d) x (100+t), <= ~1.1e11/row) are split into
    // >>20 / &0xFFFFF halves so the long sum cannot overflow below
    // ~10^5 x sf100; the halves recombine in double space identically in
    // both engines.
    "q1_agg" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("2000-12-01").cast(TimestampType))
          .select($"l_returnflag", $"l_linestatus", $"l_quantity",
            $"l_quantity".cast(LongType).as("qty"),
            floor($"l_extendedprice" * 100.0 + 0.5).cast(LongType).as("c"),
            floor($"l_discount" * 100.0 + 0.5).cast(LongType).as("d"),
            floor($"l_tax" * 100.0 + 0.5).cast(LongType).as("t"))
        val disc = $"c" * (lit(100L) - $"d")
        val charge = disc * (lit(100L) + $"t")
        li.groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            (sum($"c").cast(DoubleType) / 100.0).as("sum_base_price"),
            (sum(disc).cast(DoubleType) / 10000.0).as("sum_disc_price"),
            ((sum(shiftright(charge, 20)).cast(DoubleType) * 1048576.0
              + sum(charge.bitwiseAND(1048575L)).cast(DoubleType))
              / 1000000.0).as("sum_charge"),
            (sum($"qty").cast(DoubleType) / count(lit(1))).as("avg_qty"),
            (sum($"c").cast(DoubleType) / 100.0 / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
      },
      oracle = Some("""
        WITH q AS (
          SELECT l_returnflag, l_linestatus, l_quantity,
            CAST(l_quantity AS BIGINT) AS qty,
            CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c,
            CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d,
            CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS t
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00')
        SELECT l_returnflag, l_linestatus,
          sum(l_quantity) AS sum_qty,
          CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
          CAST(CAST(sum(c * (100 - d)) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
          (CAST(CAST(sum((c * (100 - d) * (100 + t)) >> 20) AS BIGINT) AS DOUBLE) * 1048576.0
            + CAST(CAST(sum((c * (100 - d) * (100 + t)) & 1048575) AS BIGINT) AS DOUBLE))
            / 1000000.0 AS sum_charge,
          CAST(CAST(sum(qty) AS BIGINT) AS DOUBLE) / count(*) AS avg_qty,
          CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100.0 / count(*) AS avg_price,
          count(*) AS count_order
        FROM q GROUP BY l_returnflag, l_linestatus"""),
      headline = true),

    // count(distinct): Catalyst expands to a two-phase distinct aggregate
    // (Expand multiplies each row per distinct column, then two hash-agg
    // phases with map-side partial dedup). That Expand costs ~Nx the scan
    // locally — the worst compute-bound vs-DuckDB ratio in this corpus —
    // but it is the RIGHT trade at cluster scale: partial dedup runs
    // before the shuffle, so network volume is the distinct value count,
    // not the row count, and the two distinct columns process in one pass.
    // The alternatives are worse where it matters: one
    // dropDuplicates+count per column shuffles FULL rows once per column;
    // approx_count_distinct (q_agg_approx_distinct) is the knob when
    // exactness is negotiable.
    "q_agg_countd" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("nd_part"),
            countDistinct($"l_suppkey").as("nd_supp"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT l_returnflag,
          count(DISTINCT l_partkey) AS nd_part,
          count(DISTINCT l_suppkey) AS nd_supp,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // min/max/min_by-style extremes, all on deterministic integer/date cols.
    "q_agg_minmax" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            min($"o_totalprice").as("min_price"),
            max($"o_totalprice").as("max_price"),
            min($"o_orderdate").as("min_date"),
            max($"o_orderdate").as("max_date"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT o_orderpriority,
          min(o_totalprice) AS min_price,
          max(o_totalprice) AS max_price,
          CAST(min(o_orderdate) AS TIMESTAMP) AS min_date,
          CAST(max(o_orderdate) AS TIMESTAMP) AS max_date,
          count(*) AS n
        FROM orders GROUP BY o_orderpriority""")),

    // rollup + grouping_id (B-4 grouping sets row).
    "q_agg_rollup" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
        val n = Engine.table(s, dir, "nation")
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .rollup($"n_name", $"c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            dsumGate($"c_acctbal").as("sum_bal"),
            grouping_id().as("gid"))
      },
      oracle = Some("""
        SELECT n_name, c_mktsegment,
          count(*) AS n,
          CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_bal,
          CAST(grouping(n_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)""")),

    // explicit GROUPING SETS through the SQL surface (rollup/cube above
    // cover the shorthand forms).
    "q_agg_grouping_sets" -> QueryDef(
      fn = (s, dir) => {
        Engine.table(s, dir, "customer").createOrReplaceTempView("customer_gs")
        Engine.table(s, dir, "nation").createOrReplaceTempView("nation_gs")
        s.sql("""
          SELECT n_name, c_mktsegment, count(*) AS n,
            CAST(grouping(n_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid
          FROM customer_gs JOIN nation_gs ON c_nationkey = n_nationkey
          GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())""")
      },
      oracle = Some("""
        SELECT n_name, c_mktsegment, count(*) AS n,
          CAST(grouping(n_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())""")),

    // cube over two low-cardinality dims.
    "q_agg_cube" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),

    // Deterministic second-moment statistics: var/stddev/corr over EXACT
    // integer-quantized sums — order-insensitive long arithmetic instead
    // of decimal sums (2.5x faster; long sums stay fully codegen'd).
    // qty is integral (exact as long); price is 2-dp (exact as cents via
    // floor(x*100+0.5), IEEE-identical per row in both engines); the
    // cents² sum is split into (>>20, &0xFFFFF) halves so int64 never
    // overflows (headroom to ~sf1000) and recombined exactly in double
    // space (the 2^20 rescale is a pure exponent shift). corr is
    // computed in cents space — correlation is scale-invariant, and the
    // oracle mirrors the identical arithmetic. Built-in stddev/corr are
    // demonstrated in unit tests; their cross-engine bitwise equality is
    // not guaranteed, hence the algebraic form here.
    "q_agg_stats" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val li = Engine.table(s, dir, "lineitem")
          .select($"l_returnflag",
            $"l_quantity".cast(LongType).as("qty"),
            floor($"l_extendedprice" * 100.0 + 0.5).cast(LongType).as("c"))
        li.groupBy($"l_returnflag")
          .agg(
            count(lit(1)).cast(DoubleType).as("n"),
            sum($"qty").cast(DoubleType).as("sx"),
            sum($"qty" * $"qty").cast(DoubleType).as("sxx"),
            sum($"c").cast(DoubleType).as("syc"),
            sum($"qty" * $"c").cast(DoubleType).as("sxyc"),
            (sum(shiftright($"c" * $"c", 20)).cast(DoubleType) * 1048576.0
              + sum(($"c" * $"c").bitwiseAND(1048575L)).cast(DoubleType)).as("syy"))
          .select($"l_returnflag",
            (($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1.0)).as("var_qty"),
            sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1.0)).as("std_qty"),
            (($"sxyc" - $"sx" * $"syc" / $"n")
              / sqrt(($"sxx" - $"sx" * $"sx" / $"n")
                * ($"syy" - $"syc" * $"syc" / $"n"))).as("corr_qty_price"))
      },
      oracle = Some("""
        WITH q AS (
          SELECT l_returnflag,
            CAST(l_quantity AS BIGINT) AS qty,
            CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
          FROM lineitem),
        m AS (
          SELECT l_returnflag,
            CAST(count(*) AS DOUBLE) AS n,
            CAST(CAST(sum(qty) AS BIGINT) AS DOUBLE) AS sx,
            CAST(CAST(sum(qty * qty) AS BIGINT) AS DOUBLE) AS sxx,
            CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS syc,
            CAST(CAST(sum(qty * c) AS BIGINT) AS DOUBLE) AS sxyc,
            CAST(CAST(sum((c * c) >> 20) AS BIGINT) AS DOUBLE) * 1048576.0
              + CAST(CAST(sum((c * c) & 1048575) AS BIGINT) AS DOUBLE) AS syy
          FROM q GROUP BY l_returnflag)
        SELECT l_returnflag,
          (sxx - sx * sx / n) / (n - 1.0) AS var_qty,
          sqrt((sxx - sx * sx / n) / (n - 1.0)) AS std_qty,
          (sxyc - sx * syc / n)
            / sqrt((sxx - sx * sx / n) * (syy - syc * syc / n)) AS corr_qty_price
        FROM m""")),

    // Exact percentiles / median over integral-valued doubles (linear
    // interpolation on exact values — identical in both engines).
    "q_agg_percentile" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.95)").as("p95"),
            median($"l_quantity").as("med"))
      },
      oracle = Some("""
        SELECT l_returnflag,
          quantile_cont(l_quantity, 0.5) AS p50,
          quantile_cont(l_quantity, 0.25) AS p25,
          quantile_cont(l_quantity, 0.95) AS p95,
          quantile_cont(l_quantity, 0.5) AS med
        FROM lineitem GROUP BY l_returnflag""")),

    // approx sketches beyond HLL: percentile_approx (KLL-style quantile
    // sketch) and count_min_sketch (binary CMS). The sketch LAYOUTS are
    // engine-specific (no DuckDB twin), so the gated output carries the
    // accuracy ASSERTIONS instead: DuckDB recomputes the exact anchors
    // (true median, true key-1 frequency) and expects TRUE for each
    // bound check — a hash-matchable oracle instead of rows-only.
    // Bounds: |approx_p50 - exact_p50| <= 2 (accuracy=1000 => rank error
    // ~n/1000 on a 1..50-valued column); CMS is never-underestimate plus
    // overestimate <= 2*eps*n (eps = 0.01, fixed seed => deterministic).
    // The CMS decode is a 3-row driver-grain UDF (one call per group) —
    // Spark ships no SQL estimator for its own CMS binary; this is not a
    // per-row hot path.
    "q_agg_sketches" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val cmsEst = udf((bytes: Array[Byte], key: Long) =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .estimateCount(key))
        Engine.table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("p50_approx"),
            percentile($"l_quantity", lit(0.5)).as("p50_exact"),
            expr("count_min_sketch(l_suppkey, 0.01d, 0.99d, 42)").as("cms"),
            count(when($"l_suppkey" === 1L, 1)).as("k1_exact"),
            count(lit(1)).as("n"))
          .select($"l_returnflag",
            $"p50_exact",
            (abs($"p50_approx" - $"p50_exact") <= lit(2.0)).as("p50_ok"),
            $"k1_exact",
            (cmsEst($"cms", lit(1L)) >= $"k1_exact" &&
              cmsEst($"cms", lit(1L)) <= $"k1_exact" + $"n" * 2.0 / 100.0)
              .as("cms_ok"))
      },
      oracle = Some("""
        SELECT l_returnflag,
          quantile_cont(l_quantity, 0.5) AS p50_exact,
          TRUE AS p50_ok,
          CAST(sum(CASE WHEN l_suppkey = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS k1_exact,
          TRUE AS cms_ok
        FROM lineitem GROUP BY l_returnflag""")),

    // collect_list sorted (order-insensitive via explicit array_sort).
    // Gate output joins the sorted lists to strings (raw arrays crash the
    // external comparator); raw-array behavior is unit-tested.
    "q_agg_collect" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "nation")
          .groupBy($"n_regionkey")
          .agg(
            concat_ws("|", array_sort(collect_list($"n_name"))).as("nations"),
            concat_ws("|", array_sort(collect_set($"n_name"))).as("nation_set"))
      },
      oracle = Some("""
        SELECT n_regionkey,
          array_to_string(list(n_name ORDER BY n_name), '|') AS nations,
          array_to_string(list(DISTINCT n_name ORDER BY n_name), '|') AS nation_set
        FROM nation GROUP BY n_regionkey""")),

    // approx_count_distinct (HLL): the estimate itself has no DuckDB
    // twin, so the gated output is the error-bound ASSERTION — DuckDB
    // computes the exact distinct count and expects TRUE. Bound is
    // 5*rsd (rsd = 0.01): HLL++ at that precision lands well inside it,
    // and the estimate is deterministic given the data, so the boolean
    // is stable. max(..., 1) keeps tiny groups from demanding 0 error.
    // The exact and approx sides run as SEPARATE passes joined on the
    // 3-row result: mixed distinct+non-distinct planning would carry the
    // 1639-word HLL partial buffer through every (flag, orderkey) group
    // of the distinct expansion — ~13 KB of state per distinct pair,
    // measured 9 s at sf0.1 vs ~0.5 s for the two-pass shape.
    "q_agg_approx_distinct" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val t = Engine.table(s, dir, "lineitem")
        val exact = t.groupBy($"l_returnflag")
          .agg(countDistinct($"l_orderkey").as("exact_orders"))
        val approx = t.groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_orderkey", 0.01).as("approx"))
        exact.join(approx, "l_returnflag")
          .select($"l_returnflag", $"exact_orders",
            (abs($"approx" - $"exact_orders") <=
              greatest($"exact_orders" * 0.05, lit(1.0))).as("within_5x_rsd"))
      },
      oracle = Some("""
        SELECT l_returnflag,
          count(DISTINCT l_orderkey) AS exact_orders,
          TRUE AS within_5x_rsd
        FROM lineitem GROUP BY l_returnflag""")),

    // Custom HLL sketch (TypedImperativeAggregate over the shared h60
    // hash): unlike approx_count_distinct, the register STATE is
    // deterministic given the hash, so the sketch itself gets an exact
    // cross-engine oracle — DuckDB recomputes every register (bucket =
    // top 8 hash bits, rho = leading-zero rank of the low 52 via
    // length(bin(x)), max per bucket). Estimate accuracy is asserted in
    // unit tests (AggPropertySpec).
    // MISRA-GRIES heavy hitters (FreqItemsAgg): the O(k)-state frequent-
    // token detector. Register content is merge-order-dependent (true
    // of any MG sketch), so the query oracles the GUARANTEES, which
    // hold under every merge order: every item with true count >
    // n/(k+1) is present, every estimate e obeys true - n/(k+1) <= e
    // <= true, and the summary never exceeds k entries. All three are
    // integer-exact inequalities ((k+1)-scaled, no division) verified
    // against exact counts; DuckDB recomputes n_heavy and expects the
    // booleans to be true. A hot key is injected deterministically
    // (40x 'grafthh' per doc) so a guaranteed heavy hitter exists at
    // every SF, and vocab > k keeps the eviction path load-bearing.
    "q_agg_freq_items" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val K = 8
        val items = Engine.table(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(concat(split($"text", " "),
            array_repeat(lit("grafthh"), 40))).as("item"))
        // TWO corpus passes total (r7 ran five): one for the exact
        // per-item counts, one for the sketch — the operator under test
        // must see the raw stream so the eviction path stays
        // load-bearing. Every derived quantity (n, the three guarantee
        // booleans) folds into ONE aggregate over the vocab-sized
        // exact⋈sketch join; n comes from summing exact's counts above
        // the same exchange the join reads (ReusedExchange, not a
        // rescan).
        val exact = items.groupBy($"item").agg(count(lit(1)).as("cnt"))
        val entries = items
          .agg(graft.plans.FreqItemsAgg($"item", K).as("mg"))
          .select(explode($"mg").as(Seq("item", "est")))
        val tot = exact.agg(sum($"cnt").as("n"))
        // every sketch item was observed in the stream, so a left join
        // keeps all sketch entries: est != null marks sketch membership
        exact.join(entries, Seq("item"), "left")
          .crossJoin(tot)
          .agg(
            sum(when($"cnt" * (K + 1) > $"n", 1L).otherwise(0L))
              .as("n_heavy"),
            (sum(when($"cnt" * (K + 1) > $"n" && $"est".isNull, 1L)
              .otherwise(0L)) === 0L).as("all_heavy_present"),
            (sum(when($"est".isNotNull && ($"est" > $"cnt" ||
                $"est" * (K + 1) < $"cnt" * (K + 1) - $"n"), 1L)
              .otherwise(0L)) === 0L).as("bounds_ok"),
            (sum(when($"est".isNotNull, 1L).otherwise(0L)) <= K)
              .as("size_ok"))
      },
      oracle = Some("""
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS item FROM documents
          UNION ALL
          SELECT 'grafthh' FROM documents, range(40)),
        c AS (SELECT item, count(*) AS cnt FROM w GROUP BY item),
        t AS (SELECT count(*) AS n FROM w)
        SELECT (SELECT count(*) FROM c, t WHERE cnt * 9 > n) AS n_heavy,
          true AS all_heavy_present, true AS bounds_ok,
          true AS size_ok""")),

    "q_agg_hll_registers" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(graft.plans.HllRegistersAgg(h60($"o_custkey"), 8).as("regs"))
          .select($"o_orderpriority", posexplode($"regs").as(Seq("bucket", "rho")))
      },
      oracle = Some(s"""
        WITH h AS (
          SELECT o_orderpriority, ${h60Sql("o_custkey")} AS h FROM orders
        ), rho AS (
          SELECT o_orderpriority,
                 CAST(h // 4503599627370496 AS INT) AS bucket,
                 CASE WHEN h % 4503599627370496 = 0 THEN 53
                      ELSE 52 - length(bin(h % 4503599627370496)) + 1 END AS rho
          FROM h
        ), maxr AS (
          SELECT o_orderpriority, bucket, max(rho) AS rho
          FROM rho GROUP BY o_orderpriority, bucket
        )
        SELECT p.o_orderpriority, b.bucket, CAST(coalesce(m.rho, 0) AS INT) AS rho
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p
        CROSS JOIN (SELECT CAST(range AS INT) AS bucket FROM range(0, 256)) b
        LEFT JOIN maxr m
          ON m.o_orderpriority = p.o_orderpriority AND m.bucket = b.bucket"""))
  )
}
