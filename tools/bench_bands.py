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
    force = "--force" in paths
    paths = [p for p in paths if p != "--force"]
    if len(paths) < 2:
        sys.exit("need >= 2 same-HEAD boards (3 is the canonical fence)")
    boards = []
    for p in paths:
        with open(p) as f:
            boards.append(json.load(f))
    # The fence's validity rests on same-HEAD/same-env boards (ADVICE r17):
    # merging boards across commits or machines produces a "noise band"
    # that silently includes real code/environment deltas, which the
    # adjudication rule would then treat as authoritative. Refuse unless
    # --force explicitly overrides (and even then the mismatch is printed).
    def fingerprint(b, path):
        head = b.get("head_commit", "missing")
        env = b.get("env") or {}
        env_key = {k: env.get(k) for k in
                   ("host_cpus", "spark_master", "heap_gb", "jvm", "spark",
                    "os", "gc_settle_ms")}
        return path, head, json.dumps(env_key, sort_keys=True)
    fps = [fingerprint(b, p) for b, p in zip(boards, paths)]
    heads = {h for _, h, _ in fps}
    envs = {e for _, _, e in fps}
    if len(heads) > 1 or len(envs) > 1:
        for path, head, env_key in fps:
            print(f"  {path}: head={head} env={env_key}", file=sys.stderr)
        msg = ("boards disagree on " +
               " and ".join((["HEAD"] if len(heads) > 1 else []) +
                            (["env"] if len(envs) > 1 else [])))
        if not force:
            sys.exit(f"{msg} — a cross-HEAD/cross-env fence is not a noise "
                     "band; re-run the boards at one commit or pass --force")
        print(f"[bands] WARNING: {msg} (merged under --force)",
              file=sys.stderr)
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
        "head_commit": boards[0].get("head_commit", "missing"),
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
