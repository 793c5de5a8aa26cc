"""Skew-mitigation utilities (SURVEY §4 / task brief: "skewed keys
hurt ... salting for skew").

AQE's skew-join splitting handles most cases at runtime; these
operators are the explicit form for when the skew is known up front
(e.g. a giant entity in the mention stream) or when the operation is
an aggregation (AQE does not salt aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    join_hint: str | None = None,
) -> DataFrame:
    """Join a skewed big side to a small side by spreading each hot
    key over ``n_salts`` shuffle partitions: the big side gets a
    per-row salt, the small side is replicated once per salt, and the
    join key becomes (key, salt). Output columns = plain join's.

    ``join_hint`` (e.g. "shuffle_hash", "merge") is applied to the
    replicated side: when the dimension is NOT broadcastable — the
    regime salting exists for; a broadcast join has no shuffle to
    skew — pass it to pin the shuffle physical instead of letting a
    locally-small fixture auto-broadcast and bypass the salted path."""
    salted_big = skewed.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    if join_hint:
        replicated = replicated.hint(join_hint)
    out = salted_big.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate
    on (key, salt), then final combine on key. ``aggs`` maps output
    name -> one of sum/count-shaped partial aggregates (re-combinable
    by summation)."""
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )
