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


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: list | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts whenever the
    time since the user's previous event exceeds ``gap_seconds``.
    session_id = running count of session starts per key — two
    KEY-PARTITIONED windows (lag, then cumulative sum), so the work
    distributes across keys; no global window, no state on the driver.
    Skewed power-users concentrate a key's events in one task — at
    100 TB the fix is the streaming session window
    (``F.session_window``) or per-key chunked reduction, but a single
    user's events fit a task by assumption here.

    ``order_cols`` must make the per-key order total (pass a unique
    tiebreak like event_id) or session numbering is nondeterministic.

    Output: df + (session_id long) — 1-based per key."""
    w = W.partitionBy(key_col).orderBy(*(order_cols or [ts_col]))
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        F.when(prev.isNull(), 1)
        .when(F.col(ts_col).cast("long") - prev.cast("long") > gap_seconds, 1)
        .otherwise(0)
    )
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("_new", new_sess).withColumn(
        "session_id", F.sum("_new").over(wc).cast("long")
    ).drop("_new")


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


def resample_locf(
    events: DataFrame,
    freq_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward:
    one row per (key, slot) on each key's own [first, last] slot range,
    carrying the latest observation at or before the slot boundary —
    the gap-fill step before any per-entity time-series model.

    Physical shape (no asof UDF, no per-key loop): observations
    dedup to one row per (key, instant) (max_by tiebreak — identical
    rule in the oracle), each key's slot range comes from one tiny
    groupBy, the grid is a sequence() explode (rows = slots, linear),
    and the carry-forward IS asof_join (one implementation of the
    boundary-tie union+window strategy in this module) probing each
    slot boundary — the struct payload carries a matched row's value
    even when that value is NULL, i.e. true as-of semantics, not
    skip-the-NULLs. Slots before a key's first observation carry
    NULL. Output: (key_col, slot, value_ffill[2dp]) with slot =
    epoch_us div freq_us (integer — calendar rendering is a
    fetch-path hazard, CLAUDE.md)."""
    obs = (
        events.select(
            F.col(key_col),
            F.unix_micros(ts_col).alias("_tus"),
            F.col(value_col).cast("double").alias("_v"),
            F.col(tiebreak_col).alias("_tb"),
        )
        .groupBy(key_col, "_tus")
        .agg(F.max_by("_v", "_tb").alias("_v"))
    )
    bounds = obs.groupBy(key_col).agg(
        F.expr(f"min(_tus) div {freq_us}").alias("_lo"),
        F.expr(f"max(_tus) div {freq_us}").alias("_hi"),
    )
    grid = bounds.select(
        key_col, F.explode(F.sequence("_lo", "_hi")).alias("slot")
    ).withColumn("_gts", F.col("slot") * freq_us)
    out = asof_join(
        grid,
        obs,
        key=key_col,
        left_ts="_gts",
        right_ts="_tus",
        payload_cols=["_v"],
        inner=False,
    )
    return out.select(key_col, "slot", F.round("_v", 2).alias("value_ffill"))


def interval_coverage(
    df: DataFrame,
    start_col: str,
    width_days_col: str,
    group_col: str,
) -> DataFrame:
    """POINT-IN-INTERVAL coverage counts: for every calendar day and
    group, how many of the input's [start, start + width_days]
    (inclusive) intervals cover that day — the interval/range-join
    workload (validity windows, promo periods, sensor uptime).

    Physical strategy: a naive formulation is a theta join
    (day BETWEEN start AND end) — a cross product that no equi-join
    engine shuffles efficiently. Because the interval width here is
    BOUNDED, the scale-correct plan is to UNNEST each interval into
    its covered days (sequence + explode: rows = n * avg_width,
    linear) and count by (day, group) — one explode, one hash
    aggregate, zero joins, skew-free (days are near-uniform). For
    unbounded widths the same operator would bin intervals into
    fixed-width buckets and equi-join on bucket before the residual
    BETWEEN filter (the classic bucketed range join); bounded-width
    unnesting is that plan's degenerate, cheaper case. Oracles check
    it against an INDEPENDENT naive BETWEEN range join.

    Output: (day 'yyyy-MM-dd' string, <group_col>, n_covering) —
    calendar buckets emitted as strings per the DATE fetch-path rule.
    """
    start = F.to_date(F.col(start_col))
    w = F.col(width_days_col).cast("int")
    # a negative width is an EMPTY interval (the BETWEEN formulation's
    # semantics), not a reversed one — Spark's sequence() would count
    # DOWN (step defaults to -1 when start > stop) and silently cover
    # the days BEFORE start
    span = F.when(w >= 0, F.sequence(start, F.date_add(start, w))).otherwise(
        F.array().cast("array<date>")
    )
    days = F.explode(span).alias("_day")
    # group on the raw DATE (4-byte int through the exchange) and
    # format AFTER the aggregate: the previous form ran date_format on
    # every exploded row (n * avg_width string builds) and shuffled
    # 10-byte string keys; formatting is injective on dates, so the
    # groups — and the output — are identical (optimization r9,
    # guide §2.3: shuffle narrower keys, do per-row work on fewer rows)
    return (
        df.select(days, F.col(group_col))
        .groupBy(F.col("_day"), F.col(group_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_covering"))
        .select(
            F.date_format("_day", "yyyy-MM-dd").alias("day"),
            F.col(group_col),
            "n_covering",
        )
    )


def interval_overlap_pairs(
    iv: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """INTERVAL OVERLAP SELF-JOIN: all pairs of intervals (same key)
    sharing at least one point — the interval sibling of the
    point-in-interval `interval_coverage`. Naive form is a theta join
    (quadratic per key); this is the standard bucket-join physical:
    each interval explodes to the width-``bucket_width`` buckets it
    touches (bounded: span/bucket_width + 1 rows per interval — pick
    bucket_width >= the max span so it's <= 2), candidates equi-join
    on (key, bucket), DISTINCT collapses pairs sharing several
    buckets, and the exact overlap predicate verifies. Two
    overlapping intervals share the bucket containing any common
    point, so recall is total — the bucket join is candidate
    generation, never the answer. Requires integer start/end (e.g.
    epoch days); end is inclusive. Output: (key, id_a, id_b,
    overlap_len) with id_a < id_b.

    At 100 TB: shuffle volume = intervals x buckets-touched (~2n) on
    the (key, bucket) equi-join; a hot bucket (burst of concurrent
    intervals) is real output density — AQE skew-split handles the
    join, and the emitted pairs are the answer's own size."""
    from streaming_cdc_spark.session import fan_out

    rows = fan_out(
        iv.select(
            F.col(key_col).alias("_k"),
            F.col(id_col).alias("_id"),
            F.col(start_col).alias("_s"),
            F.col(end_col).alias("_e"),
        )
        # degenerate (end < start) intervals contain no point: emit
        # nothing for them — without the guard Spark sequence() counts
        # DOWN (the r6 interval_coverage defect class) and the verify
        # predicate would pass them with NEGATIVE overlap_len
        .filter(F.col("_s") <= F.col("_e"))
    )
    # both join sides reference this explode — checkpoint or the scan
    # + sequence-explode recompute once per side (house rule)
    bucketed = rows.select(
        "_k",
        "_id",
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.expr(f"_s div {bucket_width}"), F.expr(f"_e div {bucket_width}")
            )
        ).alias("_b"),
    ).localCheckpoint()
    a = bucketed.select(
        F.col("_k"), F.col("_b"),
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), F.col("_e").alias("_ea"),
    )
    b = bucketed.select(
        F.col("_k").alias("_k2"), F.col("_b").alias("_b2"),
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), F.col("_e").alias("_eb"),
    )
    cand = (
        a.join(b, (a["_k"] == b["_k2"]) & (a["_b"] == b["_b2"]))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("_k", "id_a", "id_b", "_sa", "_ea", "_sb", "_eb")
        .distinct()
    )
    return (
        cand.filter((F.col("_sa") <= F.col("_eb")) & (F.col("_sb") <= F.col("_ea")))
        .select(
            F.col("_k").alias(key_col),
            "id_a",
            "id_b",
            (
                F.least("_ea", "_eb") - F.greatest("_sa", "_sb") + 1
            ).cast("long").alias("overlap_len"),
        )
    )
