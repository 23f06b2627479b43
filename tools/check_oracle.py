#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool, not library code).

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
  2. registers the sfdir parquet tables as DuckDB views
  3. runs each oracle_sql.json entry and compares (columns sorted by name,
     rows sorted) against the Spark parquet dump
"""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output"))
        continue
    try:
        o = con.sql(sql).df()
        s = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"query error: {e}"))
        continue
    o = o[sorted(o.columns)]
    s = s[sorted(s.columns)]
    if list(o.columns) != list(s.columns):
        fails.append((name, f"schema: oracle={list(o.columns)} spark={list(s.columns)}"))
        continue
    if len(o) != len(s):
        fails.append((name, f"rows: oracle={len(o)} spark={len(s)}"))
        continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        # The driver hashes python values, so integer WIDTH is invisible to it
        # (int32 row_number == int64 rank) but KIND is not: DuckDB's HUGEINT
        # (sum of BIGINTs) lands as float64/object and diverges from int64.
        # Mirror that: widen all int dtypes to int64, then compare dtypes.
        for df in (o, s):
            for c in df.columns:
                if df[c].dtype.kind in "iu":
                    df[c] = df[c].astype("int64")
        pd.testing.assert_frame_equal(o, s, check_dtype=True, check_exact=True)
        passes.append(name)
    except AssertionError as e:
        fails.append((name, str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:4])))

for n in passes:
    print(f"PASS {n}")
for n, why in fails:
    print(f"FAIL {n}: {why[:500]}")
print(f"\n{len(passes)}/{len(passes)+len(fails)} green")
sys.exit(1 if fails else 0)
