"""Data-quality profiling and constraint validation (the Deequ /
Great-Expectations slice of an analytics engine).

Not in the reference (a streaming CDC engine validates nothing at
rest); these are the table-health operators a 100 TB lakehouse runs
before trusting a snapshot. Shapes are deliberately boring: the
profile is ONE global aggregate pass (partial-aggregated, a one-row
result regardless of table size), and every constraint check is a
scan-aggregate or an anti-join — all linear, nothing quadratic,
nothing driver-sized except the per-check summary row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column health profile in ONE aggregate pass: row count,
    null count, exact distinct count. All columns' aggregates ride in
    a single agg (Spark plans multi-distinct via one Expand — still
    one stage), then the one-row result unpivots into one row per
    column via an inline array of structs — driver never sees data,
    only the profile. Output: (col_name, n_rows, n_nulls, n_distinct),
    ordered by column name via the caller's sort."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select(
        "_r.col_name", "_r.n_rows", "_r.n_nulls", "_r.n_distinct"
    )


def check_unique(cols: list[str]) -> Column:
    """Violation count for a uniqueness constraint: rows beyond the
    first per NON-NULL key — SQL-standard semantics (NULL != NULL, so
    NULL-keyed rows are exempt; pair with a not-null predicate check
    if the key must also be present). Computed inside the caller's
    aggregate as count(rows with full key) - count_distinct(key),
    with the key masked to NULL when any component is NULL so the
    struct wrapper can't smuggle NULL fields past count_distinct."""
    nn = None
    for c in cols:
        p = F.col(c).isNotNull()
        nn = p if nn is None else (nn & p)
    key = F.when(nn, F.struct(*[F.col(c) for c in cols]))
    # coalesce: sum over ZERO rows is NULL; empty input must report
    # 0 violations like the oracle's COUNT arithmetic does
    return F.coalesce(F.sum(nn.cast("long")), F.lit(0)) - F.count_distinct(key)


def constraint_checks(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    unique: list[tuple[str, list[str]]] | None = None,
    fk: list[tuple[str, DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Declarative constraint validation. ``checks`` are
    (name, boolean Column) row predicates — each contributes its
    violation count from the SAME single aggregate pass (a NULL
    predicate result counts as a violation). ``unique`` entries
    (name, key_cols) ride in that same pass via
    count(*) - count_distinct(key). ``fk`` entries
    (name, parent_df, child_col, parent_col) validate referential
    integrity with one anti-join count each (children whose key has
    no parent). Output: (check_name, n_violations, passed) — one row
    per check, the whole result driver-tiny."""
    aggs = [
        F.sum((~F.coalesce(c, F.lit(False))).cast("long")).alias(name)
        for name, c in checks
    ]
    names = [name for name, _ in checks]
    for name, cols in unique or []:
        aggs.append(check_unique(cols).alias(name))
        names.append(name)
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("n_violations"),
            )
            for name in names
        ]
    )
    out = one.select(F.explode(rows).alias("_r")).select(
        "_r.check_name", "_r.n_violations"
    )
    for name, parent, child_col, parent_col in fk or []:
        orphans = (
            df.select(F.col(child_col).alias("_k"))
            .join(
                parent.select(F.col(parent_col).alias("_k")).distinct(),
                "_k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )
        out = out.unionByName(orphans)
    return out.select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
