"""Query registry: every declared operator from SURVEY.md §2.8 is a
named query over the synthetic tables, with (where SQL-expressible)
a DuckDB oracle SQL string for the driver's differential check.

Usage:
    from streaming_cdc_spark.queries import QUERIES, ORACLES
"""

from __future__ import annotations

from streaming_cdc_spark.queries.registry import ORACLES, QUERIES, query

# Importing the domain modules populates the registry.
from streaming_cdc_spark.queries import (  # noqa: E402,F401
    relational,
    relational2,
    cdc,
    cdc2,
    coverage,
    dedup,
    temporal,
    text,
    similarity,
)

__all__ = ["QUERIES", "ORACLES", "query"]
