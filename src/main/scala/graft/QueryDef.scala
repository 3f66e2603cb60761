package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over a scale-factor dir,
  * plus (when SQL-expressible) the DuckDB oracle that must hash-match it.
  *
  * Oracle determinism contract (cross-engine bit-equality policy):
  *   - integer/string/date outputs: naturally deterministic;
  *   - per-row double arithmetic: IEEE-754, identical in both engines;
  *   - aggregated doubles: routed through exact DECIMAL sums
  *     (see [[graft.functions.Fns.dsum]]) then cast back to double;
  *   - collected lists: sorted before output;
  *   - anything seeded/nondeterministic: no oracle (rows-only check).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QueryModule {
  /** Ordered (name -> def) pairs; names must be globally unique. */
  def defs: Vector[(String, QueryDef)]
}
