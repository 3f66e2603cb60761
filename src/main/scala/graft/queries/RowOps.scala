package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import graft.functions.Fns._
import org.apache.spark.sql.functions._

/** Row-level surface (SURVEY.md §2B-2): projection, computed columns,
  * predicate families, distinct, explode/posexplode (UDTF shape), typed
  * Dataset map (reference A7 record-transformer analog), sampling.
  * All narrow transformations — no shuffle except the final aggregates.
  */
object RowOps extends QueryModule {

  /** Typed view of lineitem for the Dataset API demonstration. */
  final case class LineSlim(
      l_orderkey: Long, l_linenumber: Int,
      l_extendedprice: Double, l_discount: Double)
  final case class LineRev(l_orderkey: Long, revenue: Double)

  def defs: Vector[(String, QueryDef)] = Vector(

    // DataFrameNaFunctions surface — the null-cleaning pass of an ingest
    // pipeline: na.fill (defaults), na.replace (sentinel remap), na.drop
    // (required-field gate). Nulls are injected deterministically so the
    // cleaners are load-bearing; the oracle mirrors them with
    // coalesce/CASE/IS NOT NULL.
    "q_row_na_clean" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val dirty = Engine.table(s, dir, "customer")
          .select($"c_custkey",
            when($"c_custkey" % 11 === 0, lit(null).cast("string"))
              .otherwise($"c_mktsegment").as("seg"),
            when($"c_custkey" % 13 === 0, lit(null).cast("double"))
              .otherwise($"c_acctbal").as("bal"),
            when($"c_custkey" % 17 === 0, lit(null).cast("bigint"))
              .otherwise($"c_nationkey").as("nk"))
        dirty
          .na.fill(Map("seg" -> "UNKNOWN", "bal" -> 0.0))
          .na.replace("seg", Map("MACHINERY" -> "MACH"))
          .na.drop(Seq("nk")) // required field: no default, gate it
      },
      oracle = Some("""
        SELECT c_custkey,
          CASE coalesce(CASE WHEN c_custkey % 11 = 0 THEN NULL
                             ELSE c_mktsegment END, 'UNKNOWN')
            WHEN 'MACHINERY' THEN 'MACH'
            ELSE coalesce(CASE WHEN c_custkey % 11 = 0 THEN NULL
                               ELSE c_mktsegment END, 'UNKNOWN')
          END AS seg,
          coalesce(CASE WHEN c_custkey % 13 = 0 THEN NULL
                        ELSE c_acctbal END, 0.0) AS bal,
          c_nationkey AS nk
        FROM customer
        WHERE c_custkey % 17 <> 0""")),

    // Projection + computed columns + rename; row-level double arithmetic
    // is IEEE-identical cross-engine so raw values are oracle-safe.
    "q_row_project" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .select(
            $"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"),
            when($"l_discount" >= 0.05, lit("HIGH")).otherwise(lit("LOW")).as("disc_band"),
            concat_ws("|", $"l_returnflag", $"l_linestatus").as("flag_status"))
          .withColumnRenamed("net_price", "revenue")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1.0 - l_discount) AS revenue,
          CASE WHEN l_discount >= 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band,
          concat_ws('|', l_returnflag, l_linestatus) AS flag_status
        FROM lineitem""")),

    // Predicate families: IN, BETWEEN, LIKE, RLIKE, NOT, IS NULL, <=>.
    "q_row_filter" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders")
          .filter(
            $"o_orderstatus".isin("F", "P")
              && $"o_totalprice".between(100000.0, 300000.0)
              && ($"o_orderpriority".like("1-%") || $"o_orderpriority".rlike("^[23]-"))
              && !($"o_orderpriority" === "3-MEDIUM")
              && $"o_custkey".isNotNull
              && ($"o_orderstatus" <=> "F" || $"o_orderstatus" <=> "P"))
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('F','P')
          AND o_totalprice BETWEEN 100000.0 AND 300000.0
          AND (o_orderpriority LIKE '1-%' OR regexp_matches(o_orderpriority, '^[23]-'))
          AND NOT (o_orderpriority = '3-MEDIUM')
          AND o_custkey IS NOT NULL
          AND (o_orderstatus IS NOT DISTINCT FROM 'F'
               OR o_orderstatus IS NOT DISTINCT FROM 'P')""")),

    // Distinct over a projection.
    "q_row_distinct" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus").distinct()
      },
      oracle = Some(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // Explode (UDTF shape): word frequencies over documents.
    "q_row_explode" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .select(explode(split($"text", " ")).as("word"))
          .groupBy($"word").agg(count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word""")),

    // posexplode: positional flattening (0-based in Spark).
    "q_row_posexplode" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .filter($"doc_id" < 20)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
      },
      oracle = Some("""
        SELECT d.doc_id, u.i - 1 AS pos, u.w AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS words
              FROM documents WHERE doc_id < 20) d,
          LATERAL (SELECT unnest(d.words) AS w,
                          generate_subscripts(d.words, 1) AS i) u""")),

    // Typed Dataset map (A7 analog): case-class in, case-class out, then
    // relational agg on the typed result.
    // Perf note: the typed API IS the operator under test here — each row
    // round-trips Tungsten->JVM object->Tungsten through the encoder,
    // which costs ~5x the equivalent columnar expression and breaks
    // whole-stage codegen across the map. The DataFrame formulation
    // (select($"l_extendedprice" * (1 - $"l_discount"))) is the perf path
    // for anything expressible as Columns; reach for typed map/flatMap
    // only when the per-row logic genuinely needs arbitrary JVM code.
    "q_row_typed_map" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
          .as[LineSlim]
          .map(r => LineRev(r.l_orderkey, r.l_extendedprice * (1.0 - r.l_discount)))
          .groupBy($"l_orderkey")
          .agg(dsumGate($"revenue").as("order_revenue"), count(lit(1)).as("n_lines"))
      },
      oracle = Some(s"""
        SELECT l_orderkey,
          ${dsumGateSql("l_extendedprice * (1.0 - l_discount)")} AS order_revenue,
          count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey""")),

    // Custom Catalyst Generator (UDTF extension point): one row per word
    // 3-gram, fused split+shingle+explode with no intermediate array.
    "q_row_shingle_gen" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .filter($"doc_id" < 20)
          .select($"doc_id",
            graft.plans.ShingleRows($"text", 3).as("shingle"))
      },
      oracle = Some("""
        SELECT doc_id, unnest(
          CASE WHEN len(words) >= 3
            THEN [concat_ws(' ', words[i+1], words[i+2], words[i+3])
                  FOR i IN generate_series(0, len(words)-3)]
            ELSE [text] END) AS shingle
        FROM (SELECT doc_id, text, string_split(text, ' ') AS words
              FROM documents WHERE doc_id < 20)""")),

    // Typed Dataset flatMap (A7 analog, 1->N): each order line expands to
    // one record per whole quantity unit... bounded to 3 to keep the
    // expansion small; then a relational agg over the typed output.
    // Same encoder-cost note as q_row_typed_map: explode(sequence(...))
    // is the codegen'd perf path for 1->N expansion; typed flatMap is the
    // escape hatch for arbitrary JVM expansion logic.
    "q_row_typed_flatmap" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
          // typed flatMap pays per-row encoder+object cost: spread the
          // narrow projection across the cluster first (a small file
          // scans as few splits, serializing the compute)
          .repartition(s.sparkContext.defaultParallelism)
          .as[LineSlim]
          .flatMap { r =>
            // each unit carries the full line revenue (no pre-sum
            // division: a full-precision quotient's double→decimal cast
            // is 1-ulp engine-dependent; 4-dp products are exact)
            val n = math.min(3, r.l_linenumber)
            (1 to n).map(_ =>
              LineRev(r.l_orderkey, r.l_extendedprice * (1.0 - r.l_discount)))
          }
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("n_units"),
            dsumGate($"revenue").as("replicated_revenue"))
      },
      oracle = Some(s"""
        WITH expanded AS (
          SELECT l_orderkey,
            l_extendedprice * (1.0 - l_discount) AS revenue
          FROM lineitem, LATERAL (
            SELECT unnest(generate_series(1, least(3, l_linenumber))) AS u))
        SELECT l_orderkey, count(*) AS n_units,
          ${dsumGateSql("revenue")} AS replicated_revenue
        FROM expanded GROUP BY l_orderkey""")),

    // Seeded sampling: not cross-engine reproducible — rows-only gate.
    // Seeded Bernoulli sampling. The sample itself has no cross-engine
    // twin (Spark's RNG), so the gate is the r5 assertion pattern made
    // as strong as the data allows: the oracle RECOMPUTES the source
    // count and the 6-sigma binomial bounds from the same table (the
    // arithmetic is hash-matched, not just a constant TRUE), and the
    // sample's properties — every row drawn from the source (anti-join),
    // no row drawn more often than it occurs (multiplicity join), size
    // inside the bounds — are verified distributedly in Spark and
    // surface as the 0/TRUE columns DuckDB expects.
    "q_row_sample" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val f = 0.1
        val li = Engine.table(s, dir, "lineitem")
        val src = li.select($"l_orderkey", $"l_linenumber")
        val samp = li.sample(withReplacement = false, fraction = f, seed = 42L)
          .select($"l_orderkey", $"l_linenumber")
        // All four audit quantities from ONE full-outer join of the
        // per-key counts (r20, guide §2.3: the old form ran four
        // separate corpus passes — two bare counts, an anti-join, and
        // a groupBy⋈groupBy — chained through three
        // BroadcastNestedLoopJoins, 12 jobs/run). Equivalences, key =
        // (l_orderkey, l_linenumber), ct/cs = per-key src/sample
        // multiplicities: n_total = Σct; n_samp = Σcs; the anti-join's
        // row count = Σcs over keys absent from src (ct null);
        // over_mult's inner join + filter = keys present in both with
        // cs > ct (a null ct fails the > predicate, exactly the inner
        // join's exclusion). Same single row, same columns and types —
        // oracle-gated hash-identical.
        val ct = src.groupBy($"l_orderkey", $"l_linenumber")
          .agg(count(lit(1)).as("ct"))
        val cs = samp.groupBy($"l_orderkey", $"l_linenumber")
          .agg(count(lit(1)).as("cs"))
        val one = ct.join(cs, Seq("l_orderkey", "l_linenumber"),
            "full_outer")
          .agg(
            coalesce(sum($"ct"), lit(0L)).as("n_total"),
            coalesce(sum($"cs"), lit(0L)).as("n_samp"),
            coalesce(sum(when($"ct".isNull, $"cs").otherwise(0L)),
              lit(0L)).as("not_in_src"),
            coalesce(sum(when($"cs" > $"ct", 1L).otherwise(0L)),
              lit(0L)).as("over_mult"))
        val lo = col("n_total") * f - lit(6.0) * sqrt(col("n_total") * f * (1 - f))
        val hi = col("n_total") * f + lit(6.0) * sqrt(col("n_total") * f * (1 - f))
        one.select(
          $"n_total", lo.as("lo"), hi.as("hi"),
          ($"n_samp" >= lo && $"n_samp" <= hi).as("in_bounds"),
          $"not_in_src", $"over_mult")
      },
      oracle = Some("""
        SELECT count(*) AS n_total,
          count(*) * CAST(0.1 AS DOUBLE)
            - 6.0 * sqrt(count(*) * CAST(0.1 AS DOUBLE)
                         * (1 - CAST(0.1 AS DOUBLE))) AS lo,
          count(*) * CAST(0.1 AS DOUBLE)
            + 6.0 * sqrt(count(*) * CAST(0.1 AS DOUBLE)
                         * (1 - CAST(0.1 AS DOUBLE))) AS hi,
          TRUE AS in_bounds,
          CAST(0 AS BIGINT) AS not_in_src,
          CAST(0 AS BIGINT) AS over_mult
        FROM lineitem"""))
  )
}
