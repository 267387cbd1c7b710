#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB against the sf dir
tables, compare row counts, sorted column names, and value hashes
(values sorted by columns-sorted-by-name, like the driver)."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fail += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"[COLS] {name}: spark={gcols} oracle={ecols}"); fail += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"[ROWS] {name}: spark={len(g)} oracle={len(e)}"); fail += 1; continue
    try:
        import pandas as pd
        eq = g.astype(str).equals(e.astype(str))
    except Exception as ex:
        print(f"[CMPE] {name}: {ex}"); fail += 1; continue
    if eq:
        print(f"[ OK ] {name}: {len(g)} rows"); ok += 1
    else:
        diff = (g.astype(str) != e.astype(str)).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"[DIFF] {name}: {diff.sum()}/{len(g)} rows differ; first:")
        for i in idx:
            print(f"   spark : {g.loc[i].to_dict()}")
            print(f"   oracle: {e.loc[i].to_dict()}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
