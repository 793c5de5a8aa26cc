"""Event-time streaming extensions (SURVEY §7 step 7: the reference's
streams are positional with no late data; watermarked event-time
windows are the engine extension a real deployment needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows with a late-data watermark:
    (window_start, window_end, key, n_events, sum_value). Append-mode
    compatible — windows finalize once the watermark passes."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon:
    dropDuplicates keyed state with TTL — the streaming form of
    operators.dedup.exact_dedup_groups."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-based sessionization via ``F.session_window`` —
    the streaming twin of operators.temporal.sessionize: a session
    closes when no event arrives for ``gap``, and its row finalizes
    once the watermark passes the session end (append-mode safe).
    State is per (key, open session), bounded by the watermark.

    Output: (session_start, session_end, key, n_events, sum_value)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
