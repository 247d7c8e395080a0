#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare row/schema/values (columns sorted by name,
rows in produced order)."""
import duckdb, json, sys, glob, os
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING {name}"); fails += 1; continue
    got = pd.read_parquet(res_dir)
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA {name}: {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"ROWS {name}: {len(got)} vs {len(exp)}"); fails += 1; continue
    # normalize dtypes for compare
    try:
        gd = got.astype(str); ed = exp.astype(str)
    except Exception as e:
        print(f"CAST-ERR {name}: {e}"); fails += 1; continue
    if not gd.equals(ed):
        neq = (gd != ed).any(axis=1)
        idx = neq[neq].index[:3]
        print(f"VALUES {name}: first diffs at rows {list(idx)}")
        for i in idx:
            print(f"  got: {gd.loc[i].to_dict()}")
            print(f"  exp: {ed.loc[i].to_dict()}")
        fails += 1; continue
    print(f"OK {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
