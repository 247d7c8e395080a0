#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare row/schema/values (columns sorted by name,
rows in produced order).

--json <path>: also emit a per-query artifact in the driver's exact
CORRECTNESS format ({"rows_match","schema_match","hash_match","spark_rows",
"oracle_rows","err"} per query) covering EVERY dumped query — oracled ones
with the full compare, no-oracle ones as {"err":"no_oracle"} rows-only
entries. The round commits this as CORRECTNESS_self.json so a hard
correctness receipt survives even when the driver's own artifact comes back
empty (r03/r04/r07/r10/r17).
"""
import duckdb, json, sys, glob, os
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]
    if json_out in args:
        args.remove(json_out)
out_dir = args[0] if len(args) > 0 else "/tmp/verify_out"
sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
report = {}


def entry(rows_match=None, schema_match=None, hash_match=None,
          spark_rows=None, oracle_rows=None, err=None):
    return {"rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}


fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING {name}"); fails += 1
        report[name] = entry(err="missing: query not dumped")
        continue
    got = pd.read_parquet(res_dir)
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fails += 1
        report[name] = entry(spark_rows=len(got), err=f"oracle: {e}")
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    n_got, n_exp = len(got), len(exp)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA {name}: {list(got.columns)} vs {list(exp.columns)}"); fails += 1
        report[name] = entry(rows_match=(n_got == n_exp), schema_match=False,
                             hash_match=False, spark_rows=n_got,
                             oracle_rows=n_exp, err=None)
        continue
    if n_got != n_exp:
        print(f"ROWS {name}: {n_got} vs {n_exp}"); fails += 1
        report[name] = entry(rows_match=False, schema_match=True,
                             hash_match=False, spark_rows=n_got,
                             oracle_rows=n_exp, err=None)
        continue
    # normalize dtypes for compare
    try:
        gd = got.astype(str); ed = exp.astype(str)
    except Exception as e:
        print(f"CAST-ERR {name}: {e}"); fails += 1
        report[name] = entry(rows_match=True, schema_match=True,
                             spark_rows=n_got, oracle_rows=n_exp,
                             err=f"cast: {e}")
        continue
    if not gd.equals(ed):
        neq = (gd != ed).any(axis=1)
        idx = neq[neq].index[:3]
        print(f"VALUES {name}: first diffs at rows {list(idx)}")
        for i in idx:
            print(f"  got: {gd.loc[i].to_dict()}")
            print(f"  exp: {ed.loc[i].to_dict()}")
        fails += 1
        report[name] = entry(rows_match=True, schema_match=True,
                             hash_match=False, spark_rows=n_got,
                             oracle_rows=n_exp, err=None)
        continue
    print(f"OK {name} ({n_got} rows)")
    report[name] = entry(rows_match=True, schema_match=True, hash_match=True,
                         spark_rows=n_got, oracle_rows=n_exp, err=None)

# dumped queries WITHOUT an oracle (sketch/recall families): rows-only
# entries, exactly the driver's weaker check
for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracle:
        continue
    try:
        n = len(pd.read_parquet(res_dir))
        print(f"NO-ORACLE {name} ({n} rows)")
        report[name] = entry(spark_rows=n, err="no_oracle")
    except Exception as e:
        print(f"READ-ERR {name}: {e}"); fails += 1
        report[name] = entry(err=f"read: {e}")

if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {json_out} ({len(report)} entries)")
print(f"\n{len(oracle)-fails}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
