"""Partition-invariance gate: the oracle differential checks ONE
physical configuration; at 100x scale the partitioning is different,
and any hidden order-dependent reduction (a float sum whose value
depends on which partition merges first, a non-deterministic tiebreak
resolved by task order) breaks hash parity SILENTLY — the sf0.01
oracle would still pass while the cluster run diverges.

This tool re-runs the driver's first-50 window under perturbed
physical configs and asserts the VALUE HASHES are identical:

- baseline: the session defaults (shuffle partitions = cores, AQE on)
- 1-part:   spark.sql.shuffle.partitions=1 — every shuffle reduces in
            a single task, maximally different merge order
- 7-part + small scan splits: shuffle.partitions=7 and
            files.maxPartitionBytes=1m, so scans split into many more
            input partitions AND shuffles land on a prime partition
            count nothing is aligned to

All three are runtime-settable confs (verified: they apply per-plan,
not per-JVM), so one session serves all configs. The hash is the same
order-insensitive pandas-fetch signature the driver replica
(tools/check_pandas.py) uses.

Usage: python tools/check_invariance.py [sf_dir] [query ...]
Exit 0 iff every query hashes identically under every config.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_pandas import frame_sig  # noqa: E402  (sibling tool)

CONFIGS: list[tuple[str, dict[str, str]]] = [
    ("baseline", {}),
    ("shuffle=1", {"spark.sql.shuffle.partitions": "1"}),
    (
        "shuffle=7,scan=1m",
        {
            "spark.sql.shuffle.partitions": "7",
            "spark.sql.files.maxPartitionBytes": "1m",
        },
    ),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = list(sys.argv[2:])

    from streaming_cdc_spark.queries import QUERIES
    from streaming_cdc_spark.session import get_spark

    spark = get_spark("check-invariance")
    defaults = {
        k: spark.conf.get(k, None)
        for _, conf in CONFIGS
        for k in conf
    }

    names = only or list(QUERIES)[:50]
    sigs: dict[str, list] = {}
    bad: list[str] = []
    errs: list[str] = []
    for label, conf in CONFIGS:
        for k, v in conf.items():
            spark.conf.set(k, v)
        t0 = time.time()
        for name in names:
            if name in bad or name in errs:
                continue
            try:
                sig = frame_sig(QUERIES[name](spark, sf_dir).toPandas())
            except Exception as e:  # noqa: BLE001
                print(f"ERR   {name} [{label}]: {e}")
                errs.append(name)
                continue
            if label == "baseline":
                sigs[name] = sig
            elif sig != sigs[name]:
                base, cur = sigs[name], sig
                diff = next(
                    (
                        (a, b)
                        for a, b in zip(base, cur)
                        if a != b
                    ),
                    (f"<{len(base)} rows>", f"<{len(cur)} rows>"),
                )
                print(f"DIFF  {name} [{label}]:")
                print("  baseline:", str(diff[0]).replace("\x01", " | ")[:200])
                print(f"  {label}:", str(diff[1]).replace("\x01", " | ")[:200])
                bad.append(name)
        # restore defaults between configs so 'baseline' really is
        for k in conf:
            if defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])
        print(f"[{label}] {len(names)} queries in {time.time() - t0:.0f}s")
    n_ok = len(names) - len(bad) - len(errs)
    print(f"\n{n_ok} invariant, {len(bad)} diff, {len(errs)} error")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
