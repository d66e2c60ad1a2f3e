#!/usr/bin/env python3
"""Scaling probe: given bench_full.json artifacts from graft.Bench runs
at several scale factors, emit SCALING.md — per-query warm seconds at
each SF and the log-log slope over each of the two largest data steps
(one slope column when only two SFs are given).

Slope reads as the empirical scaling exponent over a 10x data step:
~1.0 = linear, <1.0 = sublinear (fixed overhead still dominates),
>>1.0 = superlinear — the shapes that break at 100 TB. Queries under
the floor seconds at the larger SF of a step are skipped for that
step's slope (overhead noise, not data-driven signal).

Usage: scaling.py out.md [--append TITLE] [--note TEXT] sf1:bench_full_1.json ...
(sf values are the numeric scale factors, ascending order not required)

--append TITLE appends a "## TITLE" section to out.md instead of
rewriting it — the sf10 rehearsal appendix: a SUBSET bench artifact
(SPARK_GRAFT_BENCH_ONLY) at the biggest SF joined against full
lower-SF artifacts; rows iterate the LARGEST SF's query set, so the
table carries exactly the rehearsed subset.
"""
import json, math, sys

FLOOR_SEC = 0.30   # below this at the step's larger SF, slope is noise
FLAG_SLOPE = 1.30  # above this, call the query out for a scale review

def main():
    out_path = sys.argv[1]
    args = sys.argv[2:]
    note = None
    append_title = None
    if args and args[0] == "--append":
        append_title = args[1]
        args = args[2:]
    if args and args[0] == "--note":
        note = args[1]
        args = args[2:]
    runs = []
    for spec in args:
        sf, path = spec.split(":", 1)
        with open(path) as f:
            b = json.load(f)
        runs.append((float(sf), b["warm"], b))
    runs.sort(key=lambda r: r[0])
    sfs = [r[0] for r in runs]
    # slope over each of the (up to) two largest steps — the top step
    # last so the flag column reads at the biggest measured scale
    steps = []
    if len(runs) >= 3:
        steps.append((len(runs) - 3, len(runs) - 2))
    steps.append((len(runs) - 2, len(runs) - 1))

    def slope_of(times, lo, hi):
        tl, th = times[lo], times[hi]
        if th is None or tl is None or th < FLOOR_SEC or tl <= 0:
            return None
        return math.log(th / tl) / math.log(sfs[hi] / sfs[lo])

    rows = []
    for q in sorted(runs[-1][1], key=lambda x: (len(x), x)):
        times = [r[1].get(q) for r in runs]
        rows.append((q, times, [slope_of(times, lo, hi) for lo, hi in steps]))

    top = len(steps) - 1
    sloped = [(q, s[top]) for q, _, s in rows if s[top] is not None]
    flagged = [(q, s) for q, s in sloped if s > FLAG_SLOPE]
    med = sorted(s for _, s in sloped)[len(sloped) // 2] if sloped else None

    step_names = [f"slope {sfs[lo]}→{sfs[hi]}" for lo, hi in steps]
    with open(out_path, "a" if append_title else "w") as f:
        w = f.write
        if append_title:
            w(f"\n## {append_title}\n\n")
        else:
            w("# SCALING — measured warm-time scaling across scale factors\n\n")
            w("Warm per-query seconds from `graft.Bench` (pass 2, stages "
              "landed), plus the\nempirical scaling exponent "
              "slope = log(t_hi/t_lo) / log(sf_hi/sf_lo) over each of the\n"
              "two largest 10x data steps. ~1.0 = linear in data size; "
              f"queries under {FLOOR_SEC}s at a\nstep's larger SF are "
              "excluded from that slope (fixed per-query overhead, not\n"
              "data-driven signal). Flags read the TOP step — the largest "
              "measured scale.\n\n")
        if note:
            w(note + "\n\n")
        w(f"- queries with a measurable top-step slope: {len(sloped)}\n")
        if med is not None:
            w(f"- median top-step slope: {med:.2f}\n")
        w(f"- flagged (> {FLAG_SLOPE}): "
          f"{', '.join(f'{q} ({s:.2f})' for q, s in flagged) or 'none'}\n\n")
        w("| query | " + " | ".join(f"sf{sf}" for sf in sfs) + " | "
          + " | ".join(step_names) + " |\n")
        w("|---" * (len(sfs) + len(steps) + 1) + "|\n")
        for q, times, slopes in rows:
            tcells = " | ".join("-" if t is None else f"{t:.2f}" for t in times)
            scells = " | ".join("-" if s is None else f"{s:.2f}" for s in slopes)
            w(f"| {q} | {tcells} | {scells} |\n")
        # total over the INTERSECTION of queries measured (v >= 0) at
        # EVERY SF — in append mode the lower-SF artifacts are full
        # sweeps (summing them whole would compare a 150-query total
        # against the rehearsed subset), and a query that errored at one
        # SF only must drop from every SF's total or the slope skews
        qset = set(runs[-1][1])
        qset = {q for q in qset
                if all(r[1].get(q, -1) >= 0 for r in runs)}
        tot = [sum(v for q, v in r[1].items() if q in qset and v >= 0)
               for r in runs]
        tots = " | ".join(
            f"{math.log(tot[hi]/tot[lo])/math.log(sfs[hi]/sfs[lo]):.2f}"
            if tot[lo] > 0 and tot[hi] > 0 else "-"
            for lo, hi in steps)
        w("| **total** (n=" + str(len(qset)) + ") | "
          + " | ".join(f"{t:.1f}" for t in tot) + f" | {tots} |\n")

    print(f"wrote {out_path}: {len(rows)} queries, "
          f"{len(flagged)} flagged, median top-step slope "
          f"{med and round(med, 2)}")

if __name__ == "__main__":
    main()
