#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first,
then this script replays every oracle_sql.json query in DuckDB against the
same parquet tables and compares rows/schema/values per query.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, additionally writes a per-query result map in the
CORRECTNESS/VERIFY_LARGE artifact shape.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
report = {}
con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
bad = []
for name in sorted(oracle):
    spark_dir = os.path.join(out, name)
    rep = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = rep
    try:
        sdf = pd.read_parquet(spark_dir)
        odf = con.execute(oracle[name]).fetchdf()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        rep["spark_rows"], rep["oracle_rows"] = len(sdf), len(odf)
        if list(sdf.columns) != list(odf.columns):
            bad.append((name, f"schema {list(sdf.columns)} vs {list(odf.columns)}"))
            continue
        rep["schema_match"] = True
        if len(sdf) != len(odf):
            bad.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            continue
        rep["rows_match"] = True
        s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True).astype(str)
        o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True).astype(str)
        if not s.equals(o):
            neq = (s != o)
            cells = int(neq.values.sum())
            first = neq.any(axis=1).idxmax()
            bad.append((name, f"{cells} cells differ; first row {first}:\n  spark={s.iloc[first].to_dict()}\n  oracle={o.iloc[first].to_dict()}"))
        else:
            rep["hash_match"] = True
            print(f"OK   {name} ({len(sdf)} rows)")
    except Exception as e:
        rep["err"] = str(e)[:300]
        bad.append((name, f"error: {e}"))
for name, msg in bad:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle) - len(bad)}/{len(oracle)} green")
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
sys.exit(1 if bad else 0)
