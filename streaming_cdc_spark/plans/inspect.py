"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that filters reach
the parquet scan (PushedFilters), projections prune columns
(ReadSchema), and small dims broadcast — so a regression that silently
turns a pruned scan into a full scan fails CI, not the cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    try:
        return df._jdf.queryExecution().explainString(  # type: ignore[attr-defined]
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception:  # noqa: BLE001 — fall back to capturing explain()
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the columns actually read."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Note: with AQE on, the pre-execution formatted plan hides
    codegen markers; this checks the codegen explain output."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    return "WholeStageCodegen" in buf.getvalue()


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (partial_sum/count/min/max)."""
    return "partial_" in formatted_plan(df)
