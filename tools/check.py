#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
  python3 tools/check.py <verify_out_dir> [sf_dir]
Pre-verifies oracle SQL + result parity before the driver's per-round run.
(Local tooling only — the Scala library has no Python dependency.)
"""
import sys, json, glob, os
import duckdb

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    rdir = os.path.join(out, name)
    if not os.path.isdir(rdir):
        print(f"FAIL {name}: no spark output dir")
        fail += 1
        continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    got = con.sql(f"SELECT * FROM '{rdir}/*.parquet'").df()
    # driver compare: sort columns by name, then compare value multisets
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns differ: oracle={list(want.columns)} spark={list(got.columns)}")
        fail += 1
        continue
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(ws) != len(gs):
        print(f"FAIL {name}: rows differ: oracle={len(ws)} spark={len(gs)}")
        fail += 1
        continue
    if ws.equals(gs):
        ok += 1
        print(f"OK   {name} ({len(ws)} rows)")
    else:
        neq = (ws != gs) & ~(ws.isna() & gs.isna())
        bad = neq.any(axis=1)
        print(f"FAIL {name}: {int(bad.sum())}/{len(ws)} rows mismatch")
        print("  oracle:", ws[bad].head(3).to_dict("records"))
        print("  spark: ", gs[bad].head(3).to_dict("records"))
        fail += 1

print(f"\n{ok} OK, {fail} FAIL")
sys.exit(1 if fail else 0)
