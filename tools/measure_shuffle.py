"""Measure per-query SHUFFLE VOLUME and scan input, and how both GROW
with data size — the empirical backing for SCALING.md's 100 TB claims.

For every bench HEADLINE query this executes the plan into the noop
sink (full plan, every output expression, no driver fetch) at two
scale factors and attributes the Spark stage metrics (shuffle write
bytes/records, scan input bytes/records) to the query via the UI REST
API (stage ids are globally monotone, so "new completed stages since
the last query" is an exact attribution).

The headline number per query is the GROWTH EXPONENT
    alpha = log(shuffle_hi / shuffle_lo) / log(rows_hi / rows_lo)
i.e. shuffle ~ input^alpha (input measured in scanned ROWS — the
vectorized parquet reader's inputBytes metric reports near
footer-only byte counts, while inputRecords is exact). alpha <= ~1 means the operator's shuffle
grows at most linearly with the data — the property every SCALING.md
entry claims; alpha >> 1 (superlinear, e.g. an unblocked pair join)
is exactly the class of defect that is invisible at one scale factor.
Queries with zero shuffle at both scales (pure scans, broadcast
joins, TakeOrdered tops) are reported as "none" — the strongest
possible shape.

Usage:
    python tools/measure_shuffle.py [--lo /root/testdata/sf0.01] \
        [--hi /root/testdata/sf0.1] [--out SHUFFLE.md] [names...]

Writes a markdown table (default SHUFFLE.md) and prints one JSON line
for tooling. Runs each scale factor in a FRESH subprocess (the UI
REST API must be enabled at session creation; also keeps the two
measurements' stage namespaces independent).

Caveats recorded in the table header: local fixed overheads (16
shuffle partitions regardless of data) make tiny absolute byte counts
noisy below ~100 KB, so alpha is only classified when the hi-side
shuffle exceeds 1 MB; streaming queries execute extra jobs
(state-store exchanges) that are genuinely part of their cost and are
attributed to them.
"""

from __future__ import annotations

import argparse
import re
import json
import os
import subprocess
import sys
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# Below this hi-side volume the absolute numbers are dominated by
# fixed per-partition framing (16 partitions x headers), not data.
CLASSIFY_FLOOR_BYTES = 1 << 20

# Queries whose superlinear growth is OUTPUT-bound — the result set
# itself grows faster than the input by problem definition, so no
# algorithm avoids it. These stay in the table with their alpha but
# don't fail the run; the note is printed under the table.
OUTPUT_BOUND = {
    "simhash_hamming_pairs": (
        "emits one row PER NEAR-DUP PAIR and the synthetic corpus "
        "plants duplicate cliques that scale with corpus size "
        "(4,323 pairs at sf0.01 -> 432,593 at sf0.1 — exactly "
        "quadratic in clique size, which pair output is by "
        "definition; ~930 docs share a single fingerprint). The "
        "candidate JOIN is selectivity-tuned (Manku n_blocks=4 "
        "24-bit subset keys); the linear-output form of the same "
        "dedup decision is simhash_dedup_groups, which collapses "
        "exact-fingerprint groups to one representative before "
        "pairing."
    ),
}


def _stage_metrics(ui: str, app_id: str) -> dict[int, dict]:
    """Completed-stage metrics, after QUIESCING: the status store is
    fed asynchronously off the listener bus, so polling right after a
    job returns can miss its last stages (they would then be
    mis-attributed to the NEXT query). Poll until the completed set is
    stable across two consecutive reads and nothing is active."""
    import time

    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    act_url = f"{ui}/api/v1/applications/{app_id}/stages?status=active"
    stages: list[dict] = []
    prev_ids: set[tuple[int, int]] = {(-1, -1)}
    quiesced = False
    for _ in range(50):  # <=10s; normally 1-2 iterations
        with urllib.request.urlopen(act_url, timeout=30) as r:
            active = json.load(r)
        with urllib.request.urlopen(url, timeout=30) as r:
            stages = json.load(r)
        ids = {(s["stageId"], s["attemptId"]) for s in stages}
        if not active and ids == prev_ids:
            quiesced = True
            break
        prev_ids = ids
        time.sleep(0.2)
    if not quiesced:
        # proceeding anyway would mis-attribute late stages to the
        # NEXT query — make the unstable attribution visible
        print(
            "WARNING: status store did not quiesce within 10s; "
            "stage attribution for the current query may be unstable",
            file=sys.stderr,
        )
    out: dict[int, dict] = {}
    for s in stages:
        # attemptId retries: keep the max per stage id (a retried
        # stage re-runs the work; summing attempts would double-count)
        sid = s["stageId"]
        cur = out.get(sid)
        if cur is None or s["attemptId"] > cur["attempt"]:
            out[sid] = {
                "attempt": s["attemptId"],
                "shuffle_bytes": s.get("shuffleWriteBytes", 0),
                "shuffle_records": s.get("shuffleWriteRecords", 0),
                "input_bytes": s.get("inputBytes", 0),
                "input_records": s.get("inputRecords", 0),
            }
    return out


def measure_one_sf(sf_dir: str, names: list[str]) -> dict[str, dict]:
    """Run in-process: execute each query into the noop sink and
    attribute new completed stages' metrics to it."""
    from streaming_cdc_spark.queries import QUERIES
    from streaming_cdc_spark.session import get_spark

    spark = get_spark(
        "measure_shuffle", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    # Warm scans so the first query is not charged the cold file reads
    # of shared tables — each query still reads its inputs itself (no
    # caching in tables.load), this only pages the OS file cache.
    from streaming_cdc_spark.tables import load

    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        try:
            load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 - optional tables
            pass

    seen: set[int] = set(_stage_metrics(ui, app_id))
    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            results[name] = {"error": "unknown query"}
            continue
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:120]}
            continue
        stages = _stage_metrics(ui, app_id)
        new = {sid: m for sid, m in stages.items() if sid not in seen}
        seen = set(stages)
        results[name] = {
            "shuffle_bytes": sum(m["shuffle_bytes"] for m in new.values()),
            "shuffle_records": sum(m["shuffle_records"] for m in new.values()),
            "input_bytes": sum(m["input_bytes"] for m in new.values()),
            "input_records": sum(m["input_records"] for m in new.values()),
            "stages": len(new),
        }
    return results


def _classify(lo: dict, hi: dict) -> tuple[str, float | None]:
    if hi["shuffle_bytes"] == 0 and lo["shuffle_bytes"] == 0:
        return "none", None
    if hi["shuffle_bytes"] < CLASSIFY_FLOOR_BYTES:
        return "tiny", None
    if (
        lo["shuffle_bytes"] == 0
        or lo["input_records"] == 0
        or hi["input_records"] == 0
    ):
        return "n/a", None
    import math

    # Records, not bytes: Spark's vectorized parquet reader reports
    # near-footer-only inputBytes (measured: 60k-row lineitem scan =
    # 5.9 KB "input bytes"), while inputRecords is exact.
    in_ratio = hi["input_records"] / lo["input_records"]
    if in_ratio <= 1.5:  # fixture-driven query: input barely scales
        return "fixed-input", None
    alpha = math.log(hi["shuffle_bytes"] / lo["shuffle_bytes"]) / math.log(in_ratio)
    if alpha < 0.9:
        return "sublinear", alpha
    if alpha <= 1.15:
        return "linear", alpha
    return "SUPERLINEAR", alpha


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.0f}{unit}" if unit == "B" else f"{n:.1f}{unit}"
        n /= 1024.0
    return f"{n:.1f}GB"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(ROOT, "SHUFFLE.md"))
    ap.add_argument("--child-sf", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child_sf:
        # Child mode: measure one sf in THIS process, dump JSON.
        names = args.names
        print(json.dumps(measure_one_sf(args.child_sf, names)))
        return 0

    if args.names:
        names = args.names
    else:
        sys.path.insert(0, ROOT)
        import bench

        names = list(bench.HEADLINE)

    per_sf: dict[str, dict[str, dict]] = {}
    for label, sf_dir in (("lo", args.lo), ("hi", args.hi)):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child-sf", sf_dir]
            + names,
            capture_output=True,
            text=True,
            cwd=ROOT,
        )
        line = next(
            (
                ln
                for ln in reversed((proc.stdout or "").splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            tail = "\n".join((proc.stderr or "").splitlines()[-5:])
            print(f"child run for {sf_dir} failed:\n{tail}", file=sys.stderr)
            return 1
        per_sf[label] = json.loads(line)

    rows = []
    supers = []
    noted = []
    for name in names:
        lo, hi = per_sf["lo"].get(name), per_sf["hi"].get(name)
        if not lo or not hi or "error" in lo or "error" in hi:
            err = (lo or {}).get("error") or (hi or {}).get("error") or "missing"
            rows.append((name, None, None, None, None, f"error: {err}", None))
            continue
        cls, alpha = _classify(lo, hi)
        if cls == "SUPERLINEAR":
            if name in OUTPUT_BOUND:
                cls = "output-bound"
                noted.append(name)
            else:
                supers.append(name)
        rows.append(
            (
                name,
                lo["input_records"],
                hi["input_records"],
                lo["shuffle_bytes"],
                hi["shuffle_bytes"],
                cls,
                alpha,
            )
        )

    # Subset runs MERGE into an existing table instead of clobbering
    # it (an r8 name-subset run silently replaced the 159-row table
    # with 6 rows): parse prior `| name | ...` lines, keep every row
    # not re-measured, in their original order, and append new names.
    new_lines: dict[str, str] = {}
    for name, ilo, ihi, slo, shi, cls, alpha in rows:
        if ilo is None:
            new_lines[name] = f"| {name} | — | — | — | {cls} |"
        else:
            new_lines[name] = (
                f"| {name} | {ilo:,} → {ihi:,} "
                f"| {_fmt_bytes(slo)} → {_fmt_bytes(shi)} "
                f"| {f'{alpha:.2f}' if alpha is not None else '—'} "
                f"| {cls} |"
            )
    merged: dict[str, str] = {}
    if args.names and os.path.exists(args.out):
        # Rows kept from the prior table must still name a REGISTERED
        # query — a deleted/renamed query would otherwise keep its
        # stale row forever, inflating the "N measured" summary
        # (review r8).
        sys.path.insert(0, ROOT)
        from streaming_cdc_spark.queries import QUERIES

        live = set(QUERIES)
        for ln in open(args.out):
            m = re.match(r"\| ([a-z0-9_]+) \|", ln)
            if m and m.group(1) != "query" and m.group(1) in live:
                merged[m.group(1)] = ln.rstrip("\n")
    merged.update(new_lines)
    n_super_total = sum(1 for ln in merged.values() if "| SUPERLINEAR |" in ln)

    with open(args.out, "w") as f:
        f.write(
            "# SHUFFLE — measured shuffle volume vs data size\n\n"
            "Generated by `python tools/measure_shuffle.py` (rerun after\n"
            "plan-affecting changes). Each bench HEADLINE query executed\n"
            "into the noop sink at two scale factors; stage metrics\n"
            "attributed via the UI REST API. `alpha` is the growth\n"
            "exponent shuffle ~ input^alpha between the two scale\n"
            "factors: `none` = zero shuffle at both scales (pure scan /\n"
            "broadcast join / TakeOrdered), `tiny` = under 1 MB at the\n"
            "high scale (fixed per-partition framing dominates, not\n"
            "classifiable), `fixed-input` = fixture-driven query whose\n"
            "input barely scales, `SUPERLINEAR` (alpha > 1.15) = the\n"
            "100 TB red flag this tool exists to catch. Streaming\n"
            "queries' state-store exchanges are included in their\n"
            "numbers.\n\n"
            f"lo = `{args.lo}`, hi = `{args.hi}`\n\n"
            "| query | input rows lo→hi | shuffle lo→hi | alpha | class |\n"
            "|---|---|---|---|---|\n"
        )
        for ln in merged.values():
            f.write(ln + "\n")
        f.write(
            f"\n**{n_super_total} superlinear** of {len(merged)} measured"
            + (f"; this run flagged: {', '.join(supers)}" if supers else "")
            + "\n"
        )
        # notes derive from the MERGED table, not this run's `noted`
        # list — a subset run must not delete the explanation for a
        # surviving output-bound row (review r8)
        noted_all = [
            n
            for n, ln in merged.items()
            if "| output-bound |" in ln and n in OUTPUT_BOUND
        ]
        if noted_all:
            f.write("\nOutput-bound notes:\n\n")
            for n in noted_all:
                f.write(f"- **{n}**: {OUTPUT_BOUND[n]}\n")

    print(
        json.dumps(
            {
                "measured": len(rows),
                "superlinear": supers,
                "out": args.out,
            }
        )
    )
    return 1 if supers else 0


if __name__ == "__main__":
    raise SystemExit(main())
