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
    ap.add_argument(
        "--min-sec",
        type=float,
        default=1.5,
        help="queries whose latest time is below this are never flagged: "
        "sub-second kernels are job-overhead-dominated, and host windows "
        "alone swing them 2-3x (r6: cosine_edges_blocked hit 2.63x its "
        "all-time 0.48s min while the ROUND-START code re-timed at 0.90s "
        "in the same window — pure drift). Absolute-seconds floors what "
        "a ratio-only gate cannot: a 2x blowup of 0.5s is noise, of 20s "
        "is a regression.",
    )
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

    # DRIFT NORMALIZATION (same rationale as bench_compare's): the
    # all-time MIN can come from an exceptionally fast host window —
    # r6 measured the SAME commit's tfidf at 4.4-7.1s (old code) vs
    # 3.0-3.8s (HEAD) while the recorded min was 1.5s, so a hard
    # factor-over-min gate fails honest runs in slow windows. A real
    # regression stands out against the run-wide MEDIAN latest/min
    # ratio; uniform window slowdown does not.
    all_ratios = [
        ts[-1] / min(ts)
        for ts in hist.values()
        if len(ts) >= 2 and min(ts) > 0
    ]
    drift = max(1.0, statistics.median(all_ratios)) if all_ratios else 1.0
    eff_factor = args.factor * drift
    if drift > 1.3:
        print(
            f"host-window drift: median latest/min ratio {drift:.2f} — "
            f"effective gate factor {eff_factor:.2f}x"
        )

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
        if len(ts) >= 2 and ratio > eff_factor and latest >= args.min_sec:
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
                  f"{eff_factor:.2f}x historical min "
                  f"(base {args.factor}x, drift-adjusted)")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
