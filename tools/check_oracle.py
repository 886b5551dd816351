#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet, compare with the Spark dump written by
graft.Verify (columns sorted by name, values compared row-wise)."""
import sys, json, glob, math
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)]
    def norm(v):
        try:
            if pd.isna(v):
                return None  # NaN/NaT are not self-equal in tuple compare
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return round(v, 6)
        return v
    rows = [tuple(norm(x) for x in r) for r in df.itertuples(index=False)]
    return rows

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    s, d = canon(spark_df), canon(duck_df)
    if len(s) != len(d):
        fails.append((name, f"row count {len(s)} vs {len(d)}")); continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    if bad:
        i, a, b = bad[0]
        fails.append((name, f"{len(bad)} rows differ; first at {i}: spark={a} duck={b}"))
    else:
        print(f"OK   {name} ({len(s)} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
