#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first,
then this script replays every oracle_sql.json query in DuckDB against the
same parquet tables and compares rows/schema/values per query.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
bad = []
for name in sorted(oracle):
    spark_dir = os.path.join(out, name)
    try:
        sdf = pd.read_parquet(spark_dir)
        odf = con.execute(oracle[name]).fetchdf()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        if list(sdf.columns) != list(odf.columns):
            bad.append((name, f"schema {list(sdf.columns)} vs {list(odf.columns)}"))
            continue
        if len(sdf) != len(odf):
            bad.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            continue
        s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True).astype(str)
        o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True).astype(str)
        if not s.equals(o):
            neq = (s != o)
            cells = int(neq.values.sum())
            first = neq.any(axis=1).idxmax()
            bad.append((name, f"{cells} cells differ; first row {first}:\n  spark={s.iloc[first].to_dict()}\n  oracle={o.iloc[first].to_dict()}"))
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
    except Exception as e:
        bad.append((name, f"error: {e}"))
for name, msg in bad:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle) - len(bad)}/{len(oracle)} green")
sys.exit(1 if bad else 0)
