#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run each oracle_sql in DuckDB
over the same parquet tables, compare to the Spark parquet dumps
(columns sorted by name, values compared row-wise after full sort)."""
import sys, json, glob, duckdb, math
import pyarrow.parquet as pq

outdir = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            # exact repr compare — round-1 established bit-exact parity,
            # so any float drift is a real regression, not noise
            if isinstance(v, float):
                v = repr(v) if not math.isnan(v) else 'nan'
            rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out), [cols[i] for i in idx]

nfail = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    try:
        tb = pq.read_table(path)
        scols = tb.column_names
        srows = [tuple(d[c] for c in scols) for d in tb.to_pylist()]
        res = con.execute(oracle[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); nfail += 1; continue
    sc, scn = canon(srows, scols)
    dc, dcn = canon(drows, dcols)
    if scn != dcn:
        print(f"FAIL {name}: cols spark={scn} duck={dcn}"); nfail += 1
    elif sc != dc:
        diffs = [(a,b) for a,b in zip(sc,dc) if a!=b][:3]
        print(f"FAIL {name}: {len(sc)} vs {len(dc)} rows; first diffs: {diffs}")
        nfail += 1
    else:
        print(f"OK   {name} ({len(sc)} rows)")
print(f"\n{len(oracle)-nfail} OK, {nfail} FAIL")
sys.exit(1 if nfail else 0)
