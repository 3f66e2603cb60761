#!/root/.pyenv/versions/3.11.7/bin/python
"""Compare engine bench JSON against DuckDB running the same oracle SQL.

Usage: tools/bench_cmp.py <sfDir> <bench_json_file_or_->
Times each oracle query in DuckDB (1 warmup + 3 runs, median), joins with
the engine times, prints per-query ratio (engine/duck) sorted worst-first.
"""
import sys, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1]
    bench = json.load(open(sys.argv[2])) if sys.argv[2] != "-" else json.load(sys.stdin)
    engine = bench["queries"]
    # oracle sql comes from the last Verify dump
    oracle = json.load(open(sys.argv[3] if len(sys.argv) > 3 else "/tmp/v1/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    rows = []
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warmup
            ts = []
            for _ in range(3):
                t0 = time.time()
                con.execute(sql).fetchall()
                ts.append(time.time() - t0)
            duck = statistics.median(ts)
        except Exception as e:
            duck = None
        e_t = engine.get(name)
        ratio = (e_t / duck) if (duck and e_t and e_t > 0) else None
        rows.append((name, e_t, duck, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"{'query':28s} {'engine':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name, e_t, duck, ratio in rows:
        print(f"{name:28s} {e_t if e_t is not None else -1:8.3f} "
              f"{duck if duck is not None else -1:8.3f} "
              f"{ratio if ratio is not None else float('nan'):7.2f}")
    tot_e = sum(e for _, e, _, _ in rows if e and e > 0)
    tot_d = sum(d for _, _, d, _ in rows if d)
    print(f"{'TOTAL':28s} {tot_e:8.3f} {tot_d:8.3f} {tot_e/tot_d:7.2f}")


if __name__ == "__main__":
    main()
