"""Temporal join operators Spark lacks natively (task brief: as-of
join, range join, hypertable rollup).

The as-of join uses the union+window strategy: tag right rows as
state and left rows as probes, union them, and take the last state
payload at-or-before each probe with one window over (key, time) —
ONE shuffle, no range scan, no per-row search. This is the scalable
shape; a broadcast variant would apply when the right side is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    inner: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest right_ts <= left_ts for the same key.

    Right-side ties on (key, right_ts) are resolved deterministically
    by keeping the max payload struct. Output: all left columns +
    payload_cols (null when unmatched, dropped if inner).
    """
    left_cols = left.columns
    payload = F.struct(*[F.col(c) for c in payload_cols])
    # dedupe right on (key, t): keep the lexicographically largest
    # payload so as-of resolution has no ties
    r = (
        right.select(F.col(key), F.col(right_ts).alias("_t"), payload.alias("_payload"))
        .groupBy(key, "_t")
        .agg(F.max("_payload").alias("_payload"))
        .withColumn("_is_probe", F.lit(0))
    )
    l = left.select(
        *left_cols, F.col(left_ts).alias("_t"), F.lit(1).alias("_is_probe")
    ).withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))
    u = l.unionByName(r.select(key, "_t", "_payload", "_is_probe"), allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy("_t", "_is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    picked = u.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = picked.filter(F.col("_is_probe") == 1).select(
        *left_cols, *[F.col("_asof")[c].alias(c) for c in payload_cols]
    )
    if inner:
        out = out.filter(F.col(payload_cols[0]).isNotNull())
    return out


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    fine: str = "hour",
    coarse: str = "day",
) -> tuple[DataFrame, DataFrame]:
    """Hypertable-style continuous aggregate: a fine-grained rollup
    (hour) and a coarse rollup (day) derived FROM THE FINE ONE — the
    re-aggregation is exact for sum/count and never rescans raw data,
    which is the hypertable maintenance property."""
    fine_df = (
        df.groupBy(
            F.date_trunc(fine, F.col(ts_col)).alias("bucket"), F.col(key_col)
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_sum_dec"),
        )
    )
    coarse_df = (
        fine_df.groupBy(
            F.date_trunc(coarse, F.col("bucket")).alias("bucket"), F.col(key_col)
        )
        .agg(F.sum("n").alias("n"), F.sum("_sum_dec").alias("_sum_dec"))
    )
    fmt = lambda d: d.select(  # noqa: E731
        "bucket",
        key_col,
        "n",
        F.round(F.col("_sum_dec").cast("double"), 2).alias("sum_value"),
    )
    return fmt(fine_df), fmt(coarse_df)
