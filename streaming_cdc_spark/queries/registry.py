"""Registry mapping query name -> builder and name -> oracle SQL.

Builders have signature ``(spark: SparkSession, sf_dir: str) -> DataFrame``.
Oracle SQL must be DuckDB-runnable over views named after TESTDATA
tables. Column names/aliases MUST match between the two sides — the
driver sorts columns by name before hashing values.

Determinism rules for every registered query:
- no LIMIT without a total deterministic ORDER BY tiebreak;
- every float aggregate rounded (2-6 dp) identically on both sides;
- no reliance on row order (the driver's hash is order-insensitive);
- every DuckDB integer SUM (plain or windowed) must be CAST to
  BIGINT: SUM(int) yields HUGEINT, which pandas-based fetching
  renders as float64 ("150.0" vs Spark's "150" — hash mismatch even
  though fetchall() compares equal). `python tools/audit_types.py`
  checks all oracles for this class of hazard.

The driver checks only the FIRST 50 entries of queries() — keep the
registration order (queries/__init__.py import order + per-module
definition order) covering every judged operator family within the
first 50 slots.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a named query and its optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
