package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import graft.streaming.{Replay, RetractionJoin}
import graft.subjects.{SubjectRegistry, Trail}
import org.apache.spark.sql.functions._

/** Reference-parity subject/provenance/retraction surface (SURVEY.md
  * §2A A2/A6/A7/A8/A9): trailed subjects, composed join trails, and the
  * streaming add/remove bag join checked against a batch oracle.
  */
object SubjectOps extends QueryModule {

  def defs: Vector[(String, QueryDef)] = Vector(

    // Publish two subjects with provenance trails, join them, emit the
    // composed trail key — trails are md5-derived, so DuckDB recomputes
    // the identical provenance hashes.
    "q_subject_trail" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val reg = new SubjectRegistry(s)
        val o = reg.publish("subj_orders",
          Engine.table(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          Seq("o_orderkey"))
          .select($"o_orderkey", $"o_custkey", $"_trail".as("l_trail"))
        val c = reg.publish("subj_customer",
          Engine.table(s, dir, "customer").select($"c_custkey", $"c_mktsegment"),
          Seq("c_custkey"))
          .select($"c_custkey", $"c_mktsegment", $"_trail".as("r_trail"))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(
            $"o_orderkey", $"c_custkey", $"c_mktsegment",
            $"l_trail".getField("key").as("l_key"),
            $"r_trail".getField("key").as("r_key"),
            Trail.combine($"l_trail", $"r_trail").getField("key").as("trail_key"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT o_orderkey, c_custkey, c_mktsegment,
            CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS l_key,
            CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS r_key
          FROM orders JOIN customer ON o_custkey = c_custkey)
        SELECT o_orderkey, c_custkey, c_mktsegment, l_key, r_key,
          CAST(('0x' || substr(md5(concat(CAST(l_key AS VARCHAR), ':',
            CAST(r_key AS VARCHAR))), 1, 15)) AS BIGINT) AS trail_key
        FROM t""")),

    // The A9 centerpiece: orders stream (adds for all, retractions for
    // status F) bag-joined with a customer add stream, across multiple
    // real micro-batches. Summed deltas must equal the batch join of the
    // FINAL bags — which is exactly the DuckDB oracle.
    "q_retraction_bag" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val orders = Engine.table(s, dir, "orders")
        val cust = Engine.table(s, dir, "customer")
        val addO = orders.select($"o_custkey".as("key"), lit("L").as("side"),
          $"o_orderkey".as("id"), $"o_totalprice".as("payload"), lit(1).as("action"))
        val remO = orders.filter($"o_orderstatus" === "F")
          .select($"o_custkey".as("key"), lit("L").as("side"),
            $"o_orderkey".as("id"), $"o_totalprice".as("payload"), lit(-1).as("action"))
        val addC = cust.select($"c_custkey".as("key"), lit("R").as("side"),
          $"c_custkey".as("id"), $"c_acctbal".as("payload"), lit(1).as("action"))
        val updates = addO.unionByName(addC).unionByName(remO)
        Replay.run(s, updates, mode = "append", cacheKey = s"updates:$dir") { st =>
          RetractionJoin(st.as[RetractionJoin.Upd]).toDF()
        }
          .groupBy($"leftId", $"rightId", $"combined")
          .agg(sum($"action").as("net"))
          .filter($"net" =!= 0)
          .select($"leftId".as("left_id"), $"rightId".as("right_id"),
            $"combined", $"net")
      },
      oracle = Some("""
        SELECT o_orderkey AS left_id, c_custkey AS right_id,
          o_totalprice + c_acctbal AS combined, CAST(1 AS BIGINT) AS net
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus <> 'F'"""))
  )
}
