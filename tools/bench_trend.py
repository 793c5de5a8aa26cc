"""Per-query timing history across BENCH_LOCAL.jsonl records — the
host-drift triage tool.

Bench totals on this box swing 1.5-3x on identical code (hypervisor
oversubscription + the python-sequential queries; see CLAUDE.md), so a
single old-vs-new ratio (tools/bench_compare.py) flags spurious
"regressions". This prints each query's full same-(sf, cpus) history —
min / median / latest — and flags only queries whose LATEST exceeds
`--factor` x their historical MINIMUM, the comparison that survives
drift: the minimum is the code's demonstrated capability; a latest far
above EVERY past run is signal, a latest above one fast outlier is not.

Usage:
    python tools/bench_trend.py [--sf 0.1] [--cpus 16] [--factor 2.0]
        [--history BENCH_LOCAL.jsonl] [--gate] [--exempt a,b] [names...]
Exit 0 unless --gate is passed AND a non-exempt query's latest run
exceeds factor x its historical minimum (VERDICT r5 #5: the
drift-robust comparison is now a round gate, not an FYI). --exempt
carries the documented flaky list — python-sequential builds whose
wall-clock legitimately swings 1.6-3.7s on identical code.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument(
        "--history", default=os.path.join(ROOT, "BENCH_LOCAL.jsonl")
    )
    ap.add_argument("--gate", action="store_true",
                    help="exit 1 if any non-exempt query is flagged")
    ap.add_argument("--exempt", default="",
                    help="comma-separated queries excluded from gating "
                         "(still printed/flagged)")
    args = ap.parse_args()
    exempt = {n for n in args.exempt.split(",") if n}

    records = []
    with open(args.history) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if d.get("sf") == args.sf and d.get("_cpus") == args.cpus:
                records.append(d)
    if not records:
        print(f"no records at sf={args.sf} cpus={args.cpus}", file=sys.stderr)
        return 0

    hist: dict[str, list[float]] = {}
    for d in records:
        for q, t in d.get("queries", {}).items():
            if isinstance(t, (int, float)) and t >= 0:
                hist.setdefault(q, []).append(float(t))

    names = args.names or sorted(hist)
    flagged = []
    print(
        f"{'query':42s} {'runs':>4s} {'min':>7s} {'median':>7s} "
        f"{'latest':>7s} {'lat/min':>8s}"
    )
    for q in names:
        ts = hist.get(q)
        if not ts:
            print(f"{q:42s}    - (no history)")
            continue
        lo, med, latest = min(ts), statistics.median(ts), ts[-1]
        ratio = latest / lo if lo > 0 else float("inf")
        mark = ""
        if len(ts) >= 2 and ratio > args.factor:
            mark = "  << latest > factor x historical min"
            flagged.append(q)
        print(
            f"{q:42s} {len(ts):4d} {lo:7.2f} {med:7.2f} {latest:7.2f} "
            f"{ratio:8.2f}{mark}"
        )
    if flagged:
        print(f"\n{len(flagged)} flagged: {', '.join(flagged)}")
        print(
            "re-time flagged queries in ISOLATION before concluding a "
            "regression (CLAUDE.md: identical code measured 1.6-3.7s)"
        )
    if args.gate:
        gating = [q for q in flagged if q not in exempt]
        skipped = [q for q in flagged if q in exempt]
        if skipped:
            print(f"exempt (documented flaky, not gating): {', '.join(skipped)}")
        if gating:
            print(f"GATE FAIL: {', '.join(gating)} above "
                  f"{args.factor}x historical min")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
