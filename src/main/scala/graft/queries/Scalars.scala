package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY.md §2B-8): string, date/time, math,
  * conditional/null, array (incl. higher-order), map, JSON, hash.
  *
  * Cross-engine notes baked into the oracles:
  *   - Spark dayofweek is 1-based (Sun=1), DuckDB 0-based -> +1 shift;
  *   - Spark round(double) rounds the SHORTEST DECIMAL STRING (BigDecimal
  *     .valueOf) while DuckDB rounds the binary value — so round() is only
  *     used at precisions where the operand has no decimal ties (full-
  *     precision quotients, never 2-dp money at 1 dp);
  *   - DuckDB map[key] yields a LIST -> extract with [1];
  *   - DuckDB sign() is TINYINT -> cast; Spark signum is double.
  */
object Scalars extends QueryModule {

  def defs: Vector[(String, QueryDef)] = Vector(

    "q_fn_string" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "part").select(
          $"p_partkey",
          lower($"p_name").as("lo"),
          upper($"p_brand").as("up"),
          substring($"p_type", 1, 6).as("sub"),
          concat($"p_brand", lit("/"), $"p_type").as("cat"),
          concat_ws("-", $"p_brand", $"p_type", $"p_name").as("catws"),
          length($"p_name").as("len"),
          size(split($"p_type", " ")).as("n_words"),
          lpad($"p_brand", 12, "*").as("lp"),
          rpad($"p_brand", 12, "*").as("rp"),
          regexp_replace($"p_name", "[aeiou]", "_").as("devowel"),
          regexp_extract($"p_brand", "Brand#(\\d+)", 1).as("brand_num"),
          instr($"p_name", "a").as("pos_a"),
          translate($"p_name", "ab", "xy").as("tr"),
          reverse($"p_name").as("rev"),
          trim(lit("  pad  ")).as("trimmed"),
          $"p_type".startsWith("ECONOMY").as("is_econ"),
          $"p_type".endsWith("STEEL").as("is_steel"),
          $"p_type".contains("PROMO").as("has_promo"),
          levenshtein($"p_brand", lit("Brand#10")).as("lev"))
      },
      oracle = Some("""
        SELECT p_partkey,
          lower(p_name) AS lo,
          upper(p_brand) AS up,
          substring(p_type, 1, 6) AS sub,
          concat(p_brand, '/', p_type) AS cat,
          concat_ws('-', p_brand, p_type, p_name) AS catws,
          CAST(length(p_name) AS INT) AS len,
          CAST(len(string_split(p_type, ' ')) AS INT) AS n_words,
          lpad(p_brand, 12, '*') AS lp,
          rpad(p_brand, 12, '*') AS rp,
          regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
          coalesce(regexp_extract(p_brand, 'Brand#(\d+)', 1), '') AS brand_num,
          CAST(instr(p_name, 'a') AS INT) AS pos_a,
          translate(p_name, 'ab', 'xy') AS tr,
          reverse(p_name) AS rev,
          trim('  pad  ') AS trimmed,
          starts_with(p_type, 'ECONOMY') AS is_econ,
          ends_with(p_type, 'STEEL') AS is_steel,
          contains(p_type, 'PROMO') AS has_promo,
          CAST(levenshtein(p_brand, 'Brand#10') AS INT) AS lev
        FROM part""")),

    "q_fn_date" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders").select(
          $"o_orderkey",
          year($"o_orderdate").as("y"),
          quarter($"o_orderdate").as("q"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          dayofweek($"o_orderdate").as("dow"),
          dayofyear($"o_orderdate").as("doy"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          to_date($"o_orderdate").as("as_date"),
          datediff($"o_orderdate", lit("1995-01-01").cast(TimestampType)).as("days_since"),
          date_add(to_date($"o_orderdate"), 30).as("plus30"),
          last_day($"o_orderdate").as("eom"),
          unix_timestamp($"o_orderdate").as("epoch_s"),
          make_timestamp(year($"o_orderdate"), month($"o_orderdate"),
            dayofmonth($"o_orderdate"), lit(12), lit(30), lit(0)).as("noonish"))
      },
      oracle = Some("""
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS INT) AS y,
          CAST(quarter(o_orderdate) AS INT) AS q,
          CAST(month(o_orderdate) AS INT) AS m,
          CAST(day(o_orderdate) AS INT) AS d,
          CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
          CAST(dayofyear(o_orderdate) AS INT) AS doy,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
          CAST(o_orderdate AS DATE) AS as_date,
          CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
          CAST(o_orderdate AS DATE) + 30 AS plus30,
          CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
          CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
          make_timestamp(CAST(year(o_orderdate) AS BIGINT),
            CAST(month(o_orderdate) AS BIGINT), CAST(day(o_orderdate) AS BIGINT),
            12, 30, 0.0) AS noonish
        FROM orders""")),

    // Time parts on real (non-midnight) event timestamps.
    "q_fn_time" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "events").select(
          $"event_id",
          hour($"ts").as("h"),
          minute($"ts").as("mi"),
          second($"ts").as("sec"),
          date_trunc("hour", $"ts").as("hour_start"),
          date_trunc("day", $"ts").as("day_start"),
          unix_timestamp($"ts").as("epoch_s"),
          from_unixtime(unix_timestamp($"ts")).cast(TimestampType).as("roundtrip"))
      },
      oracle = Some("""
        SELECT event_id,
          CAST(hour(ts) AS INT) AS h,
          CAST(minute(ts) AS INT) AS mi,
          CAST(second(ts) AS INT) AS sec,
          CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
          CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
          CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
          CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS roundtrip
        FROM events""")),

    "q_fn_math" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem").select(
          $"l_orderkey", $"l_linenumber",
          abs($"l_discount" - 0.05).as("abs_d"),
          round($"l_extendedprice" / 7.0, 3).as("rounded"),
          floor($"l_extendedprice" / 1000.0).as("flr"),
          ceil($"l_extendedprice" / 1000.0).as("cl"),
          exp($"l_discount").as("e_d"),
          log($"l_extendedprice").as("ln_p"),
          log10($"l_extendedprice").as("log10_p"),
          log2($"l_quantity").as("log2_q"),
          pow($"l_quantity", 2.0).as("q2"),
          sqrt($"l_extendedprice").as("sqrt_p"),
          signum($"l_discount" - 0.05).as("sgn"),
          pmod($"l_orderkey" - lit(10L), lit(7L)).as("pm"),
          greatest($"l_quantity", $"l_discount" * 100).as("gr"),
          least($"l_quantity", $"l_discount" * 100).as("ls"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
          abs(l_discount - 0.05) AS abs_d,
          round(l_extendedprice / 7.0, 3) AS rounded,
          CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS flr,
          CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS cl,
          exp(l_discount) AS e_d,
          ln(l_extendedprice) AS ln_p,
          log10(l_extendedprice) AS log10_p,
          log2(l_quantity) AS log2_q,
          pow(l_quantity, 2.0) AS q2,
          sqrt(l_extendedprice) AS sqrt_p,
          CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
          ((l_orderkey - 10) % 7 + 7) % 7 AS pm,
          greatest(l_quantity, l_discount * 100) AS gr,
          least(l_quantity, l_discount * 100) AS ls
        FROM lineitem""")),

    "q_fn_cond" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "customer").select(
          $"c_custkey",
          when($"c_acctbal" < 0, "NEG")
            .when($"c_acctbal" < 5000, "LOW")
            .otherwise("HIGH").as("bal_band"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
          nullif($"c_mktsegment", lit("MACHINERY")).as("seg_nullable"),
          nvl2(nullif($"c_mktsegment", lit("MACHINERY")), lit("kept"), lit("nulled")).as("nv2"),
          isnull(nullif($"c_mktsegment", lit("MACHINERY"))).as("is_mach"))
      },
      oracle = Some("""
        SELECT c_custkey,
          CASE WHEN c_acctbal < 0 THEN 'NEG'
               WHEN c_acctbal < 5000 THEN 'LOW' ELSE 'HIGH' END AS bal_band,
          coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
          nullif(c_mktsegment, 'MACHINERY') AS seg_nullable,
          CASE WHEN nullif(c_mktsegment, 'MACHINERY') IS NOT NULL
               THEN 'kept' ELSE 'nulled' END AS nv2,
          nullif(c_mktsegment, 'MACHINERY') IS NULL AS is_mach
        FROM customer""")),

    // Array ops over word lists (incl. higher-order transform/filter/
    // exists/forall).
    "q_fn_array_str" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .withColumn("words", split($"text", " "))
          .select(
            $"doc_id",
            size($"words").as("n_words"),
            array_contains($"words", "spark").as("has_spark"),
            size(array_distinct($"words")).as("n_distinct"),
            concat_ws("|", slice(array_sort($"words"), 1, 5)).as("first5_sorted"),
            concat_ws("|", transform(slice($"words", 1, 3), w => upper(w))).as("up3"),
            size(filter($"words", w => length(w) > 4)).as("n_long"),
            exists($"words", w => w === "data").as("has_data"),
            forall($"words", w => length(w) > 0).as("all_nonempty"),
            array_position($"words", "table").as("pos_table"))
      },
      oracle = Some("""
        SELECT doc_id,
          CAST(len(words) AS INT) AS n_words,
          list_contains(words, 'spark') AS has_spark,
          CAST(len(list_distinct(words)) AS INT) AS n_distinct,
          array_to_string(list_sort(words)[1:5], '|') AS first5_sorted,
          array_to_string(list_transform(words[1:3], w -> upper(w)), '|') AS up3,
          CAST(len(list_filter(words, w -> length(w) > 4)) AS INT) AS n_long,
          len(list_filter(words, w -> w = 'data')) > 0 AS has_data,
          len(list_filter(words, w -> length(w) = 0)) = 0 AS all_nonempty,
          CAST(coalesce(list_position(words, 'table'), 0) AS BIGINT) AS pos_table
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)""")),

    // Array set algebra + zip (B-8 rows not covered elsewhere):
    // union/intersect/except/remove/sort/zip against a fixed stopword
    // set. Set-op results are sorted then joined to strings (Spark and
    // DuckDB produce different element orders; sorted-set equality is the
    // defined semantics).
    "q_fn_array_set" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
        Engine.table(s, dir, "documents")
          .filter($"doc_id" < 100)
          .withColumn("ws", split($"text", " "))
          .select(
            $"doc_id",
            concat_ws("|", array_sort(array_union($"ws", stop))).as("au"),
            concat_ws("|", array_sort(array_intersect($"ws", stop))).as("ai"),
            concat_ws("|", array_sort(array_except($"ws", stop))).as("ax"),
            concat_ws("|", slice(array_remove($"ws", "the"), 1, 8)).as("ar"),
            concat_ws("|", transform(
              arrays_zip(slice($"ws", 1, 3), slice(reverse($"ws"), 1, 3)),
              p => concat(p.getField("0"), lit("~"), p.getField("1")))).as("az"),
            concat_ws("|", slice(sort_array($"ws", asc = false), 1, 4)).as("sd"))
      },
      oracle = Some("""
        SELECT doc_id,
          array_to_string(list_sort(list_distinct(
            list_concat(ws, ['the','a','of','and','to']))), '|') AS au,
          coalesce(array_to_string(list_sort(list_distinct(
            list_filter(ws, w -> w IN ('the','a','of','and','to')))), '|'),
            '') AS ai,
          array_to_string(list_sort(list_distinct(
            list_filter(ws, w -> w NOT IN ('the','a','of','and','to')))), '|') AS ax,
          array_to_string(list_filter(ws, w -> w != 'the')[1:8], '|') AS ar,
          array_to_string([ws[i] || '~' || list_reverse(ws)[i]
            FOR i IN [1, 2, 3]], '|') AS az,
          array_to_string(list_reverse(list_sort(ws))[1:4], '|') AS sd
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents WHERE doc_id < 100)""")),

    // Date arithmetic + NaN handling + banker's rounding (B-8 rows not
    // covered elsewhere): months_between on month-truncated dates (whole
    // months — cross-engine exact), date_sub, bround on full-precision
    // quotients (no representable ties at 2 dp), isnan/nanvl on an
    // injected NaN (outputs themselves are NaN-free).
    "q_fn_datetime2" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "orders")
          .withColumn("v", when($"o_orderkey" % 7 === 0, lit(Double.NaN))
            .otherwise($"o_totalprice"))
          .select(
            $"o_orderkey",
            months_between(date_trunc("month", $"o_orderdate"),
              lit("1995-01-01").cast("timestamp")).as("mb"),
            date_sub($"o_orderdate".cast("date"), 30).cast("timestamp").as("ds"),
            bround($"o_totalprice" / lit(7.0), 2).as("br"),
            isnan($"v").as("is_nan"),
            nanvl($"v", lit(-1.0)).as("nn"))
      },
      oracle = Some("""
        SELECT o_orderkey,
          CAST(date_diff('month', DATE '1995-01-01',
            CAST(date_trunc('month', o_orderdate) AS DATE)) AS DOUBLE) AS mb,
          CAST(CAST(o_orderdate AS DATE) - 30 AS TIMESTAMP) AS ds,
          round(o_totalprice / 7.0, 2) AS br,
          isnan(v) AS is_nan,
          CASE WHEN isnan(v) THEN -1.0 ELSE v END AS nn
        FROM (SELECT *,
                CASE WHEN o_orderkey % 7 = 0 THEN 'NaN'::DOUBLE
                     ELSE o_totalprice END AS v
              FROM orders)""")),

    // Vector math via higher-order functions: dot/norm with left-to-right
    // folds (aggregate in Spark, list_reduce in DuckDB) — deterministic
    // without a custom Expression.
    "q_fn_array_vec" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "embeddings")
          .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
          .select(
            $"vec_id", $"label",
            expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, e) -> acc + e)")
              .as("norm2"),
            expr("aggregate(zip_with(v, reverse(v), (x, y) -> x * y), 0D, (acc, e) -> acc + e)")
              .as("dot_rev"),
            sqrt(expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
              .as("l2"))
      },
      oracle = Some("""
        SELECT vec_id, label,
          list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
            (a, b) -> a + b) AS norm2,
          list_reduce(list_prepend(0.0,
              list_transform(list_zip(v, list_reverse(v)),
                p -> p[1] * p[2])), (a, b) -> a + b) AS dot_rev,
          sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
            (a, b) -> a + b)) AS l2
        FROM (SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings)""")),

    "q_fn_json" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "events").select(
          $"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          from_json($"props", StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k_int"),
          to_json(struct($"user_id", $"event_type")).as("as_json"),
          // schema inference on a representative literal (foldable arg
          // required); constant output, mirrored as a literal
          schema_of_json(lit("""{"k": 87}""")).as("props_schema"))
      },
      oracle = Some("""
        SELECT event_id,
          json_extract_string(props, '$.k') AS k_str,
          CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
          CAST(to_json(struct_pack(user_id := user_id,
            event_type := event_type)) AS VARCHAR) AS as_json,
          'STRUCT<k: BIGINT>' AS props_schema
        FROM events""")),

    // Nested-array builders (B-8 remainder): flatten, array_compact,
    // arrays_overlap, array_append — outputs joined to strings (the
    // external comparator takes scalars; the array ops are the subject).
    "q_fn_array_nest" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val ws = split($"text", " ")
        Engine.table(s, dir, "documents")
          .select($"doc_id", $"text", $"lang", $"source")
          .select($"doc_id",
            array_join(flatten(array(slice(ws, 1, 2), slice(ws, 3, 2))),
              ",").as("flat4"),
            array_join(array_compact(array($"lang",
              lit(null).cast("string"), $"source")), ",").as("compacted"),
            arrays_overlap(slice(ws, 1, 5), slice(reverse(ws), 1, 5))
              .as("ends_share"),
            array_join(array_append(slice(ws, 1, 2), $"lang"), ",")
              .as("appended"))
      },
      oracle = Some("""
        SELECT doc_id,
          array_to_string(flatten([words[1:2], words[3:4]]), ',') AS flat4,
          array_to_string(list_filter([lang, NULL, source],
            x -> x IS NOT NULL), ',') AS compacted,
          len(list_intersect(words[1:5], list_reverse(words)[1:5])) > 0
            AS ends_share,
          array_to_string(list_append(words[1:2], lang), ',') AS appended
        FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS words
              FROM documents)""")),

    // Error-safe TRY family (B-8, ANSI-mode companions): malformed casts,
    // zero divides, and out-of-range array reads yield NULL instead of
    // failing the job — the semantics a 100 TB ingest wants for dirty
    // fields (fail the ROW, not the pipeline). Dirt injected
    // deterministically; DuckDB mirrors via TRY_CAST / NULLIF / native
    // NULL-on-OOB list indexing.
    "q_fn_try" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .select($"doc_id",
            expr("""try_cast(CASE WHEN doc_id % 3 = 0
                      THEN concat('x', CAST(doc_id AS STRING))
                      ELSE CAST(doc_id AS STRING) END AS BIGINT)""")
              .as("safe_int"),
            expr("try_divide(n_chars, CAST(doc_id % 5 AS DOUBLE))")
              .as("safe_div"),
            expr("try_element_at(split(text, ' '), CAST(doc_id % 50 AS INT) + 1)")
              .as("safe_at"))
      },
      oracle = Some("""
        SELECT doc_id,
          TRY_CAST(CASE WHEN doc_id % 3 = 0
                     THEN concat('x', CAST(doc_id AS VARCHAR))
                     ELSE CAST(doc_id AS VARCHAR) END AS BIGINT)
            AS safe_int,
          n_chars / nullif(CAST(doc_id % 5 AS DOUBLE), 0.0) AS safe_div,
          string_split(text, ' ')[CAST(doc_id % 50 AS INT) + 1] AS safe_at
        FROM documents""")),

    // Boolean aggregates (bool_and / bool_or): the per-group invariant
    // check (every row passes the gate / any row trips the flag).
    "q_agg_bool" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .groupBy($"source")
          .agg(bool_and($"n_chars" > 100).as("all_long"),
            bool_or($"lang" === "en").as("has_en"),
            count(lit(1)).as("n"))
      },
      oracle = Some("""
        SELECT source, bool_and(n_chars > 100) AS all_long,
          bool_or(lang = 'en') AS has_en, count(*) AS n
        FROM documents GROUP BY source""")),

    // Bitwise function family (B-8): and/or/xor/not, shifts, popcount —
    // exact integer semantics, identical in any engine. The inputs are
    // the raw key columns, so this is one codegen'd projection pass.
    "q_fn_bitwise" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "lineitem")
          .filter($"l_orderkey" <= 1000)
          .select($"l_orderkey", $"l_linenumber",
            ($"l_orderkey".bitwiseAND($"l_linenumber")).as("b_and"),
            ($"l_orderkey".bitwiseOR($"l_linenumber")).as("b_or"),
            ($"l_orderkey".bitwiseXOR($"l_linenumber")).as("b_xor"),
            bitwise_not($"l_orderkey").as("b_not"),
            shiftleft($"l_linenumber".cast("int"), 4).as("b_shl"),
            shiftright($"l_orderkey".cast("int"), 2).as("b_shr"),
            bit_count($"l_orderkey").as("b_pop"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
          l_orderkey & l_linenumber AS b_and,
          l_orderkey | l_linenumber AS b_or,
          xor(l_orderkey, l_linenumber) AS b_xor,
          ~l_orderkey AS b_not,
          CAST(CAST(l_linenumber AS INTEGER) << 4 AS INTEGER) AS b_shl,
          CAST(CAST(l_orderkey AS INTEGER) >> 2 AS INTEGER) AS b_shr,
          CAST(bit_count(l_orderkey) AS INTEGER) AS b_pop
        FROM lineitem WHERE l_orderkey <= 1000""")),

    // Cross-engine digests.
    "q_fn_hash" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents").select(
          $"doc_id",
          md5($"text".cast(BinaryType)).as("md5_hex"),
          sha2($"text".cast(BinaryType), 256).as("sha256_hex"))
      },
      oracle = Some("""
        SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        FROM documents""")),

    // Spark-native hashes (xxhash64 / murmur hash / crc32): the hash
    // VALUES have no DuckDB counterpart, so the gated output asserts the
    // properties a consumer depends on — xxhash64 injective on this
    // corpus (64-bit: collision odds ~1e-8 at 1M docs), murmur (32-bit,
    // collisions expected at scale) spreading over >= 99% of distinct
    // inputs, crc32 inside its unsigned-32 range — anchored to DuckDB's
    // exact row/distinct-text counts. Per-value stability stays covered
    // in unit tests.
    "q_fn_hash_spark" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "documents")
          .select(
            $"text",
            xxhash64($"text").as("xx64"),
            hash($"text").as("murmur"),
            crc32($"text".cast(BinaryType)).as("crc"))
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct($"text").as("n_texts"),
            (countDistinct($"xx64") === countDistinct($"text"))
              .as("xx64_injective"),
            (countDistinct($"murmur") >= countDistinct($"text") * 0.99)
              .as("murmur_spread_ok"),
            (min($"crc") >= 0L && max($"crc") <= 4294967295L)
              .as("crc_in_range"))
      },
      oracle = Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(DISTINCT text) AS BIGINT) AS n_texts,
          TRUE AS xx64_injective,
          TRUE AS murmur_spread_ok,
          TRUE AS crc_in_range
        FROM documents""")),

    // Map construction + key/value ops (DuckDB map[k] yields LIST -> [1]).
    "q_fn_map" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        Engine.table(s, dir, "events")
          .withColumn("m", map(lit("type"), $"event_type",
            lit("id"), $"user_id".cast(StringType)))
          .select(
            $"event_id",
            element_at($"m", "type").as("m_type"),
            element_at($"m", "id").as("m_id"),
            concat_ws(",", array_sort(map_keys($"m"))).as("keys_sorted"),
            size($"m").as("m_size"))
      },
      oracle = Some("""
        SELECT event_id,
          m['type'][1] AS m_type,
          m['id'][1] AS m_id,
          array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
          CAST(cardinality(m) AS INT) AS m_size
        FROM (SELECT event_id,
                MAP{'type': event_type, 'id': CAST(user_id AS VARCHAR)} AS m
              FROM events)"""))
  )
}
