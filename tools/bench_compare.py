#!/usr/bin/env python3
"""Compare two bench_queries*.json files with BOX-DRIFT normalization.

The box this repo benches on drifts +/-20% between same-day windows at
<2% hypervisor steal (ROUND_NOTES r14: 97.7 s vs 75.6 s for the identical
suite), so a raw per-query ratio between runs taken in different windows
mostly measures the host. The stable signal is each query's ratio
RELATIVE to the run-pair's median ratio: a uniform host shift moves every
query's raw ratio identically and cancels out of the normalized one,
while a genuine per-query regression sticks out of the distribution.

Usage:
  tools/bench_compare.py OLD.json NEW.json [--gate 1.5] [--abs-floor 0.3]

Prints the median raw ratio (the box-drift estimate), per-query
normalized regressions above --gate whose absolute delta also exceeds
--abs-floor seconds (sub-floor queries are noise-dominated), and queries
present in only one file. Exit 1 when any gated regression survives both
filters; 0 otherwise.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    if not isinstance(q, dict) or not q:
        sys.exit(f"{path}: no queries map found")
    return {k: float(v) for k, v in q.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--gate", type=float, default=1.5,
                    help="drift-normalized ratio gate (default 1.5)")
    ap.add_argument("--abs-floor", type=float, default=0.3,
                    help="ignore regressions smaller than this many seconds (default 0.3)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("no common queries")
    raw = {k: new[k] / old[k] for k in common if old[k] > 0}
    drift = statistics.median(raw.values())
    print(f"common queries : {len(common)}")
    print(f"total old/new  : {sum(old[k] for k in common):.1f} s / "
          f"{sum(new[k] for k in common):.1f} s")
    print(f"median raw ratio (box drift): {drift:.3f}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in old    : {' '.join(only_old)}")
    if only_new:
        print(f"only in new    : {' '.join(only_new)}")
    flagged = []
    for k in common:
        if old[k] <= 0:
            continue
        norm = raw[k] / drift
        delta = new[k] - old[k] * drift  # seconds beyond the drift-expected time
        if norm > args.gate and delta > args.abs_floor:
            flagged.append((norm, delta, k))
    if flagged:
        print(f"\nREGRESSIONS past gate {args.gate} (drift-normalized, "
              f"abs floor {args.abs_floor} s):")
        for norm, delta, k in sorted(flagged, reverse=True):
            print(f"  {k}: {old[k]:.3f} s -> {new[k]:.3f} s "
                  f"(norm {norm:.2f}x, +{delta:.2f} s beyond drift)")
        sys.exit(1)
    print("\nno drift-normalized regressions past the gate")


if __name__ == "__main__":
    main()
