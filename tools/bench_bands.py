#!/usr/bin/env python3
"""Merge N same-HEAD bench boards into BENCH_BANDS.json — the noise fence.

Usage:
    python3 tools/bench_bands.py board1.json board2.json board3.json \
        > BENCH_BANDS.json

Each input is a Bench-written BENCH_SELF record (per-face medians +
spread_min_median_max). The output carries, per face:
    medians  — the N boards' sweep medians
    band     — [min(medians), max(medians)]: the recorded same-HEAD
               placement-noise band
    extreme  — [min of all runs, max of all runs] across boards (from each
               board's within-sweep spread)

ADJUDICATION RULE (the fence): a face "regressed" in a later round ONLY if
its new sweep median exceeds band[1] (the same-HEAD max median) — a median
inside the band is placement noise by this record's own evidence, and no
solo re-run or judge adjudication is owed. Symmetrically, an "improvement"
claim requires the new median below band[0]. Faces absent from the bands
(new queries) adjudicate against their own within-sweep spread.
"""
import json
import sys


def main(paths):
    if len(paths) < 2:
        sys.exit("need >= 2 same-HEAD boards (3 is the canonical fence)")
    boards = []
    for p in paths:
        with open(p) as f:
            boards.append(json.load(f))
    faces = sorted(set().union(*(b["queries"].keys() for b in boards)))
    bands = {}
    for q in faces:
        meds = [b["queries"][q] for b in boards if q in b["queries"]]
        spreads = [b.get("spread_min_median_max", {}).get(q)
                   for b in boards if q in b.get("spread_min_median_max", {})]
        lo = min(s[0] for s in spreads) if spreads else min(meds)
        hi = max(s[2] for s in spreads) if spreads else max(meds)
        bands[q] = {
            "medians": [round(m, 3) for m in meds],
            "band": [round(min(meds), 3), round(max(meds), 3)],
            "extreme": [round(lo, 3), round(hi, 3)],
        }
    totals = [b["total_sec"] for b in boards]
    out = {
        "boards": len(boards),
        "board_files": paths,
        "sf": boards[0].get("sf"),
        "env": boards[0].get("env"),
        "total_sec_per_board": [round(t, 1) for t in totals],
        "total_band": [round(min(totals), 1), round(max(totals), 1)],
        "rule": ("a face regressed only if its new sweep median leaves the "
                 "recorded band (> band[1]); inside the band is same-HEAD "
                 "placement noise by this record's own evidence. "
                 "Improvements require median < band[0]."),
        "bands": bands,
    }
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
