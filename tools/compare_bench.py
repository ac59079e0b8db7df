#!/usr/bin/env python3
"""Round-over-round bench triage: diff two BENCH_SUMMARY-shaped JSON files
(throughput `queries` + `maintenance` maps) and print regressions and
improvements past a ratio threshold, plus added/removed rows.

The ambient band on this box is ~1.3-1.7x (docs/PLANS.md), so the default
threshold is 1.5 -- anything past it deserves a quiet re-measure before it
is believed (min-merge methodology), anything under it is weather.

Works on per-query maps (BENCH_SUMMARY.json or a Bench run redirected via
SPARK_GRAFT_SUMMARY); the driver's BENCH_r{N}.json carries family subtotals
only, so diff against a historical committed summary instead:

Usage: compare_bench.py <old.json> <new.json> [threshold]
       git show 'HEAD~5:BENCH_SUMMARY.json' > /tmp/old.json
       compare_bench.py /tmp/old.json BENCH_SUMMARY.json 1.5
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    q = dict(d.get("queries", {}))
    q.update({f"[maint] {k}": v for k, v in d.get("maintenance", {}).items()})
    return {k: v for k, v in q.items() if isinstance(v, (int, float)) and v > 0}


def main(old_path, new_path, threshold=1.5):
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    rows = [(k, old[k], new[k], new[k] / old[k]) for k in shared]
    reg = [r for r in rows if r[3] >= threshold and r[2] >= 0.3]
    imp = [r for r in rows if r[3] <= 1 / threshold and r[1] >= 0.3]
    print(f"shared rows: {len(shared)}  "
          f"old total {sum(old[k] for k in shared):.1f}s  "
          f"new total {sum(new[k] for k in shared):.1f}s")
    for title, rs in (("REGRESSIONS (re-measure quiet before believing)",
                       sorted(reg, key=lambda r: -r[3])),
                      ("improvements", sorted(imp, key=lambda r: r[3]))):
        print(f"\n{title}: {len(rs)}")
        for k, o, n, r in rs[:20]:
            print(f"  {k:34s} {o:7.2f} -> {n:7.2f}  {r:5.2f}x")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"\nadded ({len(added)}): " +
              ", ".join(f"{k}={new[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
