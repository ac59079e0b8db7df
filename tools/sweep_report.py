#!/usr/bin/env python3
"""Scale-sweep report: given bench JSON lines (graft.Bench output) at
increasing scale factors, print a per-query table of times and scaling
ratios, flagging anything super-linear.

Usage: sweep_report.py out1a.json[,out1b.json...]:MULT1 out2.json:MULT2 [...]
  where MULT is the data multiple relative to the first spec (e.g. 1, 3, 10)
  and multiple comma-separated files for one MULT are merged by per-query
  MINIMUM — this machine shows multi-minute ambient load spikes, and the min
  across staggered runs is the noise-robust estimator of true plan cost.

A query is flagged SUPER-LINEAR when time_ratio > data_ratio * SLACK
between the smallest and largest SF. SLACK (default 1.5) absorbs fixed
per-query overhead that hasn't amortized yet at small scale — at these
sizes sub-linear readings just mean overhead still dominates.
"""
import json
import sys

SLACK = 1.5


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def load_merged(paths):
    """Per-query min across runs; a query failed (<0) in ALL runs stays -1."""
    datas = [load(p) for p in paths]
    merged = dict(datas[0])
    qs = {}
    # union, not datas[0]'s keys: a query present only in a later run of the
    # merge group must not be silently dropped
    names = sorted({q for d in datas for q in d["queries"]})
    for q in names:
        times = [d["queries"][q] for d in datas if q in d["queries"]]
        good = [t for t in times if t >= 0]
        qs[q] = min(good) if good else -1.0
    merged["queries"] = qs
    merged["value"] = sum(t for t in qs.values() if t > 0)
    return merged


def main(specs):
    runs = []  # (mult, data)
    for spec in specs:
        path, mult = spec.rsplit(":", 1)
        runs.append((float(mult), load_merged(path.split(","))))
    runs.sort(key=lambda r: r[0])
    base_mult, base = runs[0]
    # union across SFs so a query missing from the base run is still reported
    names = sorted({q for _, r in runs for q in r["queries"]})
    print(f"{'query':28s}" + "".join(f"{f'x{m:g}':>10s}" for m, _ in runs)
          + f"{'t-ratio':>9s}{'d-ratio':>9s}  verdict")
    flagged = []
    for q in names:
        times = [r["queries"].get(q) for _, r in runs]
        if any(t is None or t < 0 for t in times):
            print(f"{q:28s}  MISSING/FAILED in some run")
            continue
        tr = times[-1] / times[0] if times[0] > 0 else float("inf")
        dr = runs[-1][0] / base_mult
        verdict = "ok (sub-linear)" if tr <= dr else (
            "ok (≈linear)" if tr <= dr * SLACK else "SUPER-LINEAR")
        # also check every ADJACENT pair: a mid-scale blow-up that recovers
        # at the endpoint (e.g. a spill band) must not pass unflagged. The
        # 0.5 s floor keeps overhead-dominated sub-second readings (where
        # adjacent ratios are mostly fixed-cost noise) out of the flag set —
        # the endpoint check still covers them.
        for (m0, r0), (m1, r1) in zip(runs, runs[1:]):
            t0, t1 = r0["queries"].get(q), r1["queries"].get(q)
            if t0 and t1 and t0 >= 0.5 and t1 / t0 > (m1 / m0) * SLACK:
                verdict = f"SUPER-LINEAR (x{m0:g}->x{m1:g})"
        if verdict.startswith("SUPER-LINEAR"):
            flagged.append((q, tr, dr))
        print(f"{q:28s}" + "".join(f"{t:10.2f}" for t in times)
              + f"{tr:9.2f}{dr:9.1f}  {verdict}")
    tot = [sum(t for t in r["queries"].values() if t > 0) for _, r in runs]
    print(f"{'TOTAL':28s}" + "".join(f"{t:10.1f}" for t in tot))
    if flagged:
        print("\nSUPER-LINEAR queries (time ratio vs data ratio):")
        for q, tr, dr in flagged:
            print(f"  {q}: {tr:.1f}x time for {dr:g}x data")
        sys.exit(1)
    print("\nAll queries scale at or below data growth (slack %.1f)." % SLACK)


if __name__ == "__main__":
    main(sys.argv[1:])
