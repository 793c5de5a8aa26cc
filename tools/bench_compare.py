"""Per-query bench regression diff between two BENCH json records.

Accepts either bench.py's raw one-line output or the driver's
BENCH_r{N}.json wrapper (which nests the parsed line under "parsed").
Prints per-query deltas sorted worst-first and exits non-zero when a
query regressed beyond the threshold — the guard against a perf fix
in one operator silently slowing another (shared session confs,
fan_out defaults, warmup changes).

Cross-round caveat (CLAUDE.md): totals are only comparable when both
records ran the same query set, the same pass discipline (two-pass
best-of), and the same cpu count — the tool prints those alongside
the diff instead of pretending a single scalar verdict.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
  python bench.py > /tmp/b.json && python tools/bench_compare.py \
      BENCH_r02.json /tmp/b.json
"""

from __future__ import annotations

import json
import sys


def load_record(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # the file is either a (pretty-printed) JSON document, or bench.py
    # stdout where the record is the last line that parses as JSON
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        rec = None
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
    if rec is None:
        raise SystemExit(f"{path}: no JSON object found")
    if "parsed" in rec and isinstance(rec["parsed"], dict):
        inner = dict(rec["parsed"])
        inner.setdefault("cpus", rec.get("cpus"))
        rec = inner
    if "queries" not in rec:
        raise SystemExit(f"{path}: record has no 'queries' map")
    return rec


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="diff two bench records per query")
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=1.5,
        help="never gate a query whose NEW time is below this — "
        "sub-second queries are job-overhead-dominated and swing 2-3x "
        "with the host window alone (same rationale as bench_trend's "
        "floor; r6: cosine_edges_blocked 0.50s -> 1.25s while the "
        "round-START code re-timed at 0.90s in the same window)",
    )
    ap.add_argument(
        "--allow-dropped",
        default="",
        help="comma-separated query names whose absence from the new "
        "record is a DELIBERATE headline swap, not a breakage "
        "(anything else dropped still gates)",
    )
    ap.add_argument(
        "--drift-cap",
        type=float,
        default=2.5,
        help="gate when the run-wide MEDIAN per-query ratio itself "
        "exceeds this — drift normalization makes a genuinely uniform "
        "regression (e.g. a session-config change slowing everything "
        "2x) look like host drift, so past this cap the tool refuses "
        "to self-certify and demands a same-window A/B (git worktree "
        "the old commit, time both; CLAUDE.md r6 protocol)",
    )
    ap.add_argument(
        "--exempt",
        default="",
        help="comma-separated documented-flaky queries (python-heavy "
        "sequential builds whose wall-clock swings 2-3x on identical "
        "code on this host — CLAUDE.md r4/r6): printed but never "
        "gating; same semantics as bench_trend --exempt",
    )
    ns = ap.parse_args()
    threshold = ns.threshold
    allow_dropped = {n for n in ns.allow_dropped.split(",") if n}
    exempt = {n for n in ns.exempt.split(",") if n}
    old, new = load_record(ns.old), load_record(ns.new)
    oq, nq = old["queries"], new["queries"]
    both = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))

    rows = []
    for name in both:
        a, b = oq[name], nq[name]
        if a is None or b is None or a < 0 or b < 0:
            rows.append((float("inf"), name, a, b, "ERR"))
            continue
        ratio = b / a if a > 0 else float("inf")
        rows.append((ratio, name, a, b, ""))
    rows.sort(reverse=True)

    # DRIFT NORMALIZATION: this box's speed swings 1.5-3x between
    # host windows (CLAUDE.md: identical-config totals 51/78/106/150s;
    # r6: the round-START code re-timed 2x its own historical min).
    # A per-query ratio gate against one older record therefore fails
    # EVERY query in a slow window — and because a failed run's record
    # never becomes the baseline, a fast-window baseline ratchets in
    # forever. A real single-query regression stands out AGAINST the
    # run-wide median ratio; uniform slowdown does not. Gate on
    # ratio >= threshold * max(1, median_ratio).
    import statistics

    finite = [r for r, _, _, _, err in rows if not err and r != float("inf")]
    drift = max(1.0, statistics.median(finite)) if finite else 1.0
    eff_threshold = threshold * drift

    print(
        f"old: total={old.get('value')}s sf={old.get('sf')} "
        f"cpus={old.get('cpus', '?')} n={len(oq)}"
    )
    print(
        f"new: total={new.get('value')}s sf={new.get('sf')} "
        f"cpus={new.get('cpus', '?')} n={len(nq)}"
    )
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")

    # a query that BROKE (-1.0 timing in the new record) or silently
    # disappeared is worse than a slowdown — both gate
    regressions = [
        f"{n} (broke)"
        for _, n, a, b, err in rows
        if err and (a is not None and a >= 0) and (b is None or b < 0)
    ]
    regressions += [f"{n} (dropped)" for n in only_old if n not in allow_dropped]
    print(f"\n{'ratio':>7}  {'old_s':>8}  {'new_s':>8}  query")
    for ratio, name, a, b, err in rows:
        flag = ""
        if err:
            flag = "  <-- error/missing timing"
        elif ratio >= eff_threshold and (b - a) >= 0.5 and b >= ns.min_sec:
            # ratio alone flags 0.1s->0.2s noise; require absolute
            # movement too
            if name in exempt:
                flag = "  <-- above threshold but exempt (documented flaky)"
            else:
                flag = f"  <-- regressed >{eff_threshold:.2f}x (drift-adjusted)"
                regressions.append(name)
        r = f"{ratio:.2f}" if ratio != float("inf") else "inf"
        print(f"{r:>7}  {a!s:>8}  {b!s:>8}  {name}{flag}")

    if drift > 1.3:
        print(
            f"\nhost-window drift: median per-query ratio {drift:.2f} — "
            f"effective per-query threshold {eff_threshold:.2f}x"
        )
    if drift > ns.drift_cap:
        print(
            f"\nDRIFT CAP EXCEEDED: median ratio {drift:.2f} > "
            f"{ns.drift_cap:.2f} — a uniform slowdown this large is "
            f"indistinguishable from host drift; re-run in a quiet "
            f"window (check uptime) or A/B the old commit in the SAME "
            f"window before trusting either verdict"
        )
        sys.exit(1)
    if regressions:
        print(f"\n{len(regressions)} regression(s): {', '.join(regressions)}")
        sys.exit(1)
    print("\nno regressions beyond threshold")


if __name__ == "__main__":
    main()
