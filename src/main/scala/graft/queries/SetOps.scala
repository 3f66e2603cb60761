package graft.queries

import graft.{Engine, QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2B-7): UNION ALL / UNION / union-by-name
  * (incl. missing columns), INTERSECT [ALL], EXCEPT [ALL].
  * Bag semantics (ALL variants) mirror the reference's add/remove bag
  * model in the batch world.
  */
object SetOps extends QueryModule {

  def defs: Vector[(String, QueryDef)] = Vector(

    "q_set_union_all" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"))
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_nationkey".cast("int").as("nationkey"))
        c.union(sup)
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier""")),

    "q_set_union_distinct" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"))
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_nationkey".cast("int").as("nationkey"))
        c.union(sup).distinct()
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier""")),

    // Column-name-based union with missing-column fill.
    "q_set_union_byname" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"),
            $"c_acctbal".as("acctbal"), $"c_mktsegment".as("segment"))
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_acctbal".as("acctbal"),
            $"s_nationkey".cast("int").as("nationkey")) // reordered, no segment
        c.unionByName(sup, allowMissingColumns = true)
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey, c_acctbal AS acctbal,
               c_mktsegment AS segment FROM customer
        UNION ALL BY NAME
        SELECT s_acctbal AS acctbal, s_nationkey AS nationkey FROM supplier""")),

    "q_set_intersect" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"))
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_nationkey".cast("int").as("nationkey"))
        c.intersect(sup)
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier""")),

    "q_set_intersect_all" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"))
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_nationkey".cast("int").as("nationkey"))
        c.intersectAll(sup)
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier""")),

    "q_set_except" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"))
        val sup = Engine.table(s, dir, "supplier")
          .filter($"s_acctbal" > 5000.0)
          .select($"s_nationkey".cast("int").as("nationkey"))
        c.except(sup)
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000.0""")),

    "q_set_except_all" -> QueryDef(
      fn = (s, dir) => {
        import s.implicits._
        val c = Engine.table(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"))
        val sup = Engine.table(s, dir, "supplier")
          .select($"s_nationkey".cast("int").as("nationkey"))
        c.exceptAll(sup)
      },
      oracle = Some("""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier"""))
  )
}
