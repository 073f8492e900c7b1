#!/usr/bin/env python3
"""Per-query bench regression report between two Bench JSON lines.

Accepts either a raw Bench stdout line ({"metric": ...}) or a driver
BENCH_r{N}.json wrapper ({"parsed": {...}}). Dev tooling only.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold_sec]
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    print(f"old total {old['value']:.1f}s ({len(qo)}q)  "
          f"new total {new['value']:.1f}s ({len(qn)}q)  "
          f"common-sum {sum(qo[k] for k in common):.1f} -> "
          f"{sum(qn[k] for k in common):.1f}")
    moved = [(qn[k] - qo[k], k) for k in common if abs(qn[k] - qo[k]) >= thresh]
    for delta, k in sorted(moved):
        print(f"  {delta:+6.2f}  {k}: {qo[k]:.2f} -> {qn[k]:.2f}")
    for k in sorted(set(qn) - set(qo)):
        print(f"  new     {k}: {qn[k]:.2f}")
    for k in sorted(set(qo) - set(qn)):
        print(f"  gone    {k}: {qo[k]:.2f}")


if __name__ == "__main__":
    main()
