#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each query's parquet
dump from Verify, run the matching oracle SQL in DuckDB over the same
scale-factor tables, sort columns by name + rows by all columns, compare."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.read_parquet(d)
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)}"
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE-FAIL: {str(e)[:200]}"
        continue
    # physical dtypes must match as well as values (DuckDB SUM(BIGINT)
    # widens to HUGEINT->float64; Spark row_number/size emit int32)
    dtype_bad = [
        c for c in sorted(set(spark_df.columns) & set(duck_df.columns))
        if str(spark_df[c].dtype) != str(duck_df[c].dtype)
    ]
    if dtype_bad:
        results[name] = "DTYPE-MISMATCH: " + ", ".join(
            f"{c}(spark={spark_df[c].dtype},duck={duck_df[c].dtype})" for c in dtype_bad)
        continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA-MISMATCH: spark={list(a.columns)} duck={list(b.columns)}"
    elif len(a) != len(b):
        results[name] = f"ROWCOUNT-MISMATCH: spark={len(a)} duck={len(b)}"
    else:
        ok = True
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                same = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
            else:
                same = (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all()
            if not same:
                ok = False
                results[name] = f"VALUE-MISMATCH in {c}"
                break
        if ok:
            results[name] = f"OK ({len(a)} rows)"
fails = {k: v for k, v in results.items() if not v.startswith(("OK", "rows-only"))}
for k in sorted(results): print(f"{k:28s} {results[k]}")
print(f"\n{len(results)-len(fails)}/{len(results)} pass")
sys.exit(1 if fails else 0)
