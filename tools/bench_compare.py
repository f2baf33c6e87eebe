#!/usr/bin/env python3
"""Compare two BENCH_SELF.json records, noise-band aware.

A per-query change only counts as a REGRESSION/IMPROVEMENT when the two
records' [min, max] spreads do not overlap — overlapping spreads are
indistinguishable from run-to-run noise (the reason Bench records the
spread at all). Records from different environments (the `env` block)
are flagged as incomparable up front.

Usage: tools/bench_compare.py OLD.json NEW.json [--threshold 1.2]
Exit 1 if any non-overlapping regression exceeds the threshold ratio.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.2,
                    help="median ratio above which a clean regression fails the run")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    oenv, nenv = old.get("env"), new.get("env")
    if oenv != nenv:
        print(f"WARNING: environments differ — deltas may be environmental, not code")
        print(f"  old: {oenv}\n  new: {nenv}")

    ospread = old.get("spread_min_median_max", {})
    nspread = new.get("spread_min_median_max", {})
    oq, nq = old.get("queries", {}), new.get("queries", {})

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added queries: {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")

    regressions, improvements, noise = [], [], 0
    for name in sorted(set(oq) & set(nq)):
        om, nm = oq[name], nq[name]
        osp = ospread.get(name, [om, om, om])
        nsp = nspread.get(name, [nm, nm, nm])
        if nsp[0] > osp[2]:  # new min above old max: clean slowdown
            regressions.append((name, om, nm, nm / om if om else float("inf")))
        elif nsp[2] < osp[0]:  # new max below old min: clean speedup
            improvements.append((name, om, nm, nm / om if om else 0.0))
        else:
            noise += 1

    for name, om, nm, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"SLOWER  {name}: {om:.2f}s -> {nm:.2f}s ({r:.2f}x)")
    for name, om, nm, r in sorted(improvements, key=lambda x: x[3]):
        print(f"faster  {name}: {om:.2f}s -> {nm:.2f}s ({r:.2f}x)")
    print(f"\n{len(regressions)} slower / {len(improvements)} faster / "
          f"{noise} within noise band; totals "
          f"{old.get('total_sec', 0):.1f}s -> {new.get('total_sec', 0):.1f}s")

    bad = [r for r in regressions if r[3] >= args.threshold]
    if bad and oenv == nenv:
        print(f"FAIL: {len(bad)} regression(s) >= {args.threshold}x outside the noise band")
        return 1
    if bad:
        # Env fingerprints differ, so the deltas MAY be environmental — but a
        # green exit here would let a CI gate silently pass on any drift
        # (including an accidental heap/CPU change). Distinct code 2 forces
        # the caller to acknowledge incomparability instead.
        print(f"INCOMPARABLE: {len(bad)} regression(s) >= {args.threshold}x "
              "but the env fingerprints differ — re-record on a matching "
              "environment before trusting either direction")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
