#!/usr/bin/env python3
"""Scaling probe: given bench_full.json artifacts from graft.Bench runs
at several scale factors, emit SCALING.md — per-query warm seconds at
each SF and the log-log slope between the two largest SFs.

Slope reads as the empirical scaling exponent over a 10x data step:
~1.0 = linear, <1.0 = sublinear (fixed overhead still dominates),
>>1.0 = superlinear — the shapes that break at 100 TB. Queries under
the floor seconds at the largest SF are skipped for slope (overhead
noise, not data-driven signal).

Usage: scaling.py out.md sf1:bench_full_1.json sf2:bench_full_2.json ...
(sf values are the numeric scale factors, ascending order not required)
"""
import json, math, sys

FLOOR_SEC = 0.30   # below this at the largest SF, slope is noise
FLAG_SLOPE = 1.30  # above this, call the query out for a scale review

def main():
    out_path = sys.argv[1]
    runs = []
    for spec in sys.argv[2:]:
        sf, path = spec.split(":", 1)
        with open(path) as f:
            b = json.load(f)
        runs.append((float(sf), b["warm"], b))
    runs.sort(key=lambda r: r[0])
    sfs = [r[0] for r in runs]
    big, small = runs[-1], runs[-2]
    ratio = big[0] / small[0]

    rows = []
    for q in sorted(big[1], key=lambda x: (len(x), x)):
        times = [r[1].get(q) for r in runs]
        slope = None
        if (times[-1] is not None and times[-2] is not None
                and times[-1] >= FLOOR_SEC and times[-2] > 0):
            slope = math.log(times[-1] / times[-2]) / math.log(ratio)
        rows.append((q, times, slope))

    sloped = [(q, s) for q, _, s in rows if s is not None]
    flagged = [(q, s) for q, s in sloped if s > FLAG_SLOPE]
    med = sorted(s for _, s in sloped)[len(sloped) // 2] if sloped else None

    with open(out_path, "w") as f:
        w = f.write
        w("# SCALING — measured warm-time scaling across scale factors\n\n")
        w("Warm per-query seconds from `graft.Bench` (pass 2, stages "
          "landed), plus the\nempirical scaling exponent "
          f"slope = log(t_sf{big[0]}/t_sf{small[0]}) / log({ratio:.0f}) "
          "over the largest\n10x data step. ~1.0 = linear in data size; "
          f"queries under {FLOOR_SEC}s at sf{big[0]} are\nexcluded from "
          "slope (fixed per-query overhead, not data-driven signal).\n\n")
        w(f"- queries with a measurable slope: {len(sloped)}\n")
        if med is not None:
            w(f"- median slope: {med:.2f}\n")
        w(f"- flagged (> {FLAG_SLOPE}): "
          f"{', '.join(f'{q} ({s:.2f})' for q, s in flagged) or 'none'}\n\n")
        w("| query | " + " | ".join(f"sf{sf}" for sf in sfs) + " | slope |\n")
        w("|---" * (len(sfs) + 2) + "|\n")
        for q, times, slope in rows:
            tcells = " | ".join("-" if t is None else f"{t:.2f}" for t in times)
            scell = "-" if slope is None else f"{slope:.2f}"
            w(f"| {q} | {tcells} | {scell} |\n")
        tot = [sum(v for v in r[1].values()) for r in runs]
        w("| **total** | " + " | ".join(f"{t:.1f}" for t in tot) + " | "
          + f"{math.log(tot[-1]/tot[-2])/math.log(ratio):.2f} |\n")

    print(f"wrote {out_path}: {len(rows)} queries, "
          f"{len(flagged)} flagged, median slope {med and round(med,2)}")

if __name__ == "__main__":
    main()
