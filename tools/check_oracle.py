#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: load each Verify
result parquet, run the oracle SQL in DuckDB against the testdata
parquet tables, and diff (column-name-sorted, row-sorted) values.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no result dir"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{res_path}/*.parquet")])
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    # value compare, exact (driver hashes values)
    mismatch = None
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            eq = (a.astype(str) == b.astype(str)) if a.dtype != b.dtype else (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = eq.idxmin()
            mismatch = (c, i, a[i], b[i], a.dtype, b.dtype)
            break
    if mismatch:
        print(f"FAIL {name}: col={mismatch[0]} row={mismatch[1]} got={mismatch[2]!r}({mismatch[4]}) want={mismatch[3]!r}({mismatch[5]})")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print("RESULT:", "FAIL" if fails else "PASS", f"({len(oracles)-fails}/{len(oracles)})")
sys.exit(1 if fails else 0)
