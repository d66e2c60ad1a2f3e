#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run each oracle_sql in DuckDB
over the same parquet tables, compare to the Spark parquet dumps
(columns sorted by name, values compared row-wise after full sort).

Type-STRICT: the driver's hasher distinguishes Arrow types (round 1:
DuckDB SUM(INTEGER) -> HUGEINT -> decimal128(38,0) hash-failed against
Spark's int64 even though the Python values matched). So we fetch the
DuckDB result as Arrow and compare normalized Arrow types column by
column, in addition to values."""
import sys, json, duckdb, math
import pyarrow as pa
import pyarrow.parquet as pq

outdir = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def norm_type(t):
    """Normalize representational-only Arrow differences; keep width and
    decimal-ness strict (int64 vs decimal128 MUST differ)."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"  # tz/unit differ benignly between writers
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    return str(t)

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
        stypes = {c: norm_type(tb.schema.field(c).type) for c in scols}
        srows = [tuple(d[c] for c in scols) for d in tb.to_pylist()]
        dtb = con.execute(oracle[name]).arrow()
        if hasattr(dtb, "read_all"):
            dtb = dtb.read_all()
        dcols = dtb.column_names
        dtypes = {c: norm_type(dtb.schema.field(c).type) for c in dcols}
        drows = [tuple(d[c] for c in dcols) for d in dtb.to_pylist()]
    except Exception as e:
        print(f"FAIL {name}: {e}"); nfail += 1; continue
    sc, scn = canon(srows, scols)
    dc, dcn = canon(drows, dcols)
    tdiff = [(c, stypes.get(c), dtypes.get(c)) for c in sorted(set(scols) | set(dcols))
             if stypes.get(c) != dtypes.get(c)]
    if scn != dcn:
        print(f"FAIL {name}: cols spark={scn} duck={dcn}"); nfail += 1
    elif tdiff:
        print(f"FAIL {name}: type mismatch {tdiff}"); nfail += 1
    elif sc != dc:
        diffs = [(a,b) for a,b in zip(sc,dc) if a!=b][:3]
        print(f"FAIL {name}: {len(sc)} vs {len(dc)} rows; first diffs: {diffs}")
        nfail += 1
    else:
        print(f"OK   {name} ({len(sc)} rows)")
print(f"\n{len(oracle)-nfail} OK, {nfail} FAIL")
sys.exit(1 if nfail else 0)
