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


def mg_insert(d: dict, key: str, w: int, k: int) -> dict:
    """Weighted Misra-Gries insert of (key, weight) into a ≤k-counter
    dict: increment, claim a free slot, or repeatedly decrement all
    counters and the remaining weight by the smaller of (min counter,
    remaining weight) — each decrement event of size dec removes
    dec*(k+1) total mass, which is where the N/(k+1) error bound comes
    from. Shared by the batch summary and the streaming sharded-state
    twin. Returns the (possibly rebuilt) dict."""
    while w > 0:
        if key in d:
            d[key] += w
            w = 0
        elif len(d) < k:
            d[key] = w
            w = 0
        else:
            dec = min(min(d.values()), w)
            d = {x: c - dec for x, c in d.items() if c > dec}
            w -= dec
    return d


def misra_gries_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Mergeable MISRA-GRIES frequency summary (Misra & Gries 1982;
    merged with the counter-SUM rule of Agarwal et al. PODS'12):
    each input partition keeps at most ``k`` weighted counters —
    an incoming key increments its counter, claims a free slot, or
    triggers a uniform decrement of all ``k`` counters plus the
    incoming weight (each decrement event of size d removes d*(k+1)
    mass, so per-partition decrements total at most n_p/(k+1)).
    Per-partition summaries are then SUMMED per key in one groupBy —
    the merge never touches the driver and the output is at most
    k * n_partitions rows.

    Guarantees, for N total rows: est <= true, and
    true - est <= sum_p n_p/(k+1) = N/(k+1); hence any key with
    true count > N/(k+1) is GUARANTEED a positive estimate. The
    estimates themselves depend on arrival order and partitioning
    (like any mergeable sketch) — queries must surface only exact
    counts plus theorem-bound BITS (the approx_distinct_bounds
    pattern), never the raw estimate.

    NULL keys are EXCLUDED (consistently with the queries' exact
    sides — a NULL never equi-joins back anyway, and pandas
    value_counts would silently drop it here while the exact count
    kept it, skewing the theorem bits). Returns (key string, est
    long)."""
    from streaming_cdc_spark.session import ensure_package_on_executors, fan_out

    ensure_package_on_executors(df.sparkSession)
    base = fan_out(
        df.select(F.col(key_col).cast("string").alias("key")).filter(
            F.col("key").isNotNull()
        )
    )

    def gen(batches):
        d: dict[str, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for key, w in pdf["key"].value_counts().items():
                d = mg_insert(d, key, int(w), k)
        import pandas as pd

        yield pd.DataFrame(
            {"key": list(d.keys()), "est": [int(v) for v in d.values()]}
        )

    summaries = base.mapInPandas(gen, "key string, est long")
    return summaries.groupBy("key").agg(F.sum("est").cast("long").alias("est"))


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


def numeric_histogram(df: DataFrame, value_col: str, bins: int) -> DataFrame:
    """EQUI-WIDTH NUMERIC HISTOGRAM — the profiling companion to
    column_profile: one pass for the global [min, max] (a one-row
    scalar broadcast), one scan assigning each value its bin by a
    fixed-order double formula (identical IEEE ops on any engine:
    width = (max-min)/bins; bin = least(floor((v-min)/width),
    bins-1), the right edge clamped into the last bin; a degenerate
    min==max column collapses to bin 0), one keyed count. NULLs are
    excluded (profile them via column_profile's null counts).
    Output: (bin, bin_lo, bin_hi, n) — edges rounded to 6 dp."""
    vals = df.select(F.col(value_col).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    stats = vals.agg(F.min("_v").alias("_mn"), F.max("_v").alias("_mx"))
    j = vals.crossJoin(F.broadcast(stats))
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    bin_ = F.when(F.col("_mx") == F.col("_mn"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("_v") - F.col("_mn")) / width),
            F.lit(bins - 1).cast("long"),
        )
    )
    g = j.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("_mn").alias("_mn"),
        F.max("_mx").alias("_mx"),
    )
    w2 = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    return g.select(
        "bin",
        F.round(F.col("_mn") + F.col("bin").cast("double") * w2, 6).alias("bin_lo"),
        F.round(F.col("_mn") + (F.col("bin") + 1).cast("double") * w2, 6).alias(
            "bin_hi"
        ),
        "n",
    )


def count_min_summary(
    df: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """COUNT-MIN sketch (Cormode & Muthukrishnan 2005) built
    distributed: ``depth`` salted md5 hash rows of ``width`` cells;
    cell(d, h) = total count of keys hashing to h at depth d;
    est(key) = MIN over depths of its cell totals — always >= the
    true count, overcounting only by colliding keys' mass. The
    sketch is MERGEABLE by cell-wise addition, so at 100 TB each
    partition sums its own table and one (d, cell) groupBy merges —
    width*depth cells total, independent of key cardinality. Unlike
    GK/HLL, every cell is an exact SUM over a deterministic hash
    partition of the keys, so the WHOLE sketch — not just a theorem
    bit — replays in SQL (the streaming_bloom_status rule:
    probabilistic != non-deterministic). NULL keys excluded (the
    sketch-family convention). Returns (key, n, est, overcount)."""
    from streaming_cdc_spark.functions.hashing import md5_long

    keyed = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    hashed = keyed.withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "cell",
        md5_long(
            F.concat(F.lit("cm"), F.col("d").cast("string"), F.lit(":"), F.col("key"))
        )
        % width,
    )
    cells = hashed.groupBy("d", "cell").agg(F.sum("n").alias("cn"))
    return (
        hashed.join(cells, ["d", "cell"])
        .groupBy("key", "n")
        .agg(F.min("cn").cast("long").alias("est"))
        .select(
            "key",
            "n",
            "est",
            (F.col("est") - F.col("n")).cast("long").alias("overcount"),
        )
    )
