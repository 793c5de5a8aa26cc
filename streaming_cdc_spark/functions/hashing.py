"""Cross-engine deterministic hashing.

Spark's ``hash()``/``xxhash64`` and DuckDB's ``hash()`` are different
algorithms, so every operator that must be oracle-checkable hashes via
md5: take the first 15 hex chars (60 bits, always positive) as an
int64. Verified byte-identical across Spark and DuckDB.

SQL equivalent (DuckDB):
    CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column | str, salt: str | None = None) -> Column:
    """60-bit positive int64 from md5(salt + value)."""
    c = F.col(c) if isinstance(c, str) else c
    if salt is not None:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-side rendering of md5_long for oracle SQL."""
    inner = f"concat('{salt}', {expr})" if salt is not None else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"
