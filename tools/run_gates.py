"""Round-end gate runner: every verification pass in one command.

Runs, in order (each is also runnable standalone — see CLAUDE.md):
1. pytest            — unit/property/golden/differential-fuzz suite
2. check_oracle      — Spark vs DuckDB differential on ALL queries
3. check_pandas      — the driver's pandas-fetch hashing replica,
                       full registry (catches HUGEINT/date fetch
                       hazards check_oracle's fetchall cannot see)
4. audit_types       — oracle SQL type-hazard lint
5. audit_plans       — registry-wide physical-plan red-flag audit

Usage: python tools/run_gates.py [sf_dir]   (default sf0.01)
Exit 0 iff every gate passed. Sequential on purpose: concurrent
Spark sessions on this host corrupt each other's timings and can
OOM; total ~15-20 min.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # full-registry names for check_pandas (its default is first-50)
    sys.path.insert(0, ROOT)
    from streaming_cdc_spark.queries import QUERIES

    all_names = list(QUERIES)
    gates: list[tuple[str, list[str]]] = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        ("check_oracle", [sys.executable, "tools/check_oracle.py", sf_dir]),
        (
            "check_pandas",
            [sys.executable, "tools/check_pandas.py", sf_dir, *all_names],
        ),
        ("audit_types", [sys.executable, "tools/audit_types.py", sf_dir]),
        ("audit_plans", [sys.executable, "tools/audit_plans.py"]),
    ]
    failures = []
    for name, cmd in gates:
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
        dt = round(time.time() - t0, 1)
        tail = "\n".join((proc.stdout or proc.stderr).strip().splitlines()[-2:])
        status = "PASS" if proc.returncode == 0 else "FAIL"
        print(f"[{status}] {name} ({dt}s): {tail}")
        if proc.returncode != 0:
            failures.append(name)
    if failures:
        print(f"\nFAILED gates: {', '.join(failures)}")
        sys.exit(1)
    print("\nall gates green")


if __name__ == "__main__":
    main()
