#!/root/.pyenv/versions/3.11.7/bin/python
"""Local replica of the driver's t2 correctness gate.

Usage: tools/t2.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, then
compares: columns sorted by name, floats rounded to 6 dp, rows sorted,
value-by-value equality.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    # sort columns by name
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(6)
        elif s.dtype.kind == "M":
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            s = s.map(lambda v: canon_val(v))
        out[c] = s
    df = pd.DataFrame(out)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def driver_unsafe_cols(df):
    """Columns the DRIVER's comparator cannot hash-compare, even when our
    lenient canon() would: decimal.Decimal objects (Spark parquet decimals
    vs DuckDB float64 -> categorical hash mismatch) and nested
    ndarray/list/dict values (pandas lexsort crashes on them)."""
    import decimal
    import numpy as np
    bad = []
    unsafe = (decimal.Decimal, np.ndarray, list, tuple, dict)
    for c in df.columns:
        if df[c].dtype == object:
            # scan EVERY value: a Decimal/array first appearing past the
            # head would slip a sampled check and still crash the driver
            hit = next(
                (v for v in df[c].dropna() if isinstance(v, unsafe)), None)
            if hit is not None:
                bad.append(f"{c}:{type(hit).__name__}")
    return bad


def canon_val(v):
    import numpy as np
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_val(x) for x in v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_val(x)) for k, x in v.items()))
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pq.read_table(files).to_pandas()
            duck_df = con.execute(sql).fetch_arrow_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        unsafe = [f"spark[{x}]" for x in driver_unsafe_cols(spark_df)] + \
                 [f"duck[{x}]" for x in driver_unsafe_cols(duck_df)]
        if unsafe:
            print(f"FAIL {name}: driver-unsafe output types {unsafe}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        diff_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    ok = ((av.isna() & bv.isna()) |
                          (av.fillna(0.0) - bv.fillna(0.0)).abs().le(0)).all()
                else:
                    ok = (av.astype(str) == bv.astype(str)).all()
            except Exception:
                ok = False
            if not ok:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = a[c].astype(str) != b[c].astype(str)
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   [{c}] row{i}: spark={a[c][i]!r} duck={b[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    for name in sorted(set(d.split('/')[-1] for d in glob.glob(f"{outdir}/*") if not d.endswith(".json"))):
        if name not in oracle:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            nrows = sum(pq.read_table([f]).num_rows for f in files) if files else 0
            status = "PASS" if nrows > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {nrows})")
            if nrows > 0: n_pass += 1
            else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
