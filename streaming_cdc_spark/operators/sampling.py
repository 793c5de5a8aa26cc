"""Deterministic sampling for training-data curation.

Random sampling is the wrong tool in a 100 TB pipeline: reruns must
reproduce byte-identical corpora, and a sample must not depend on
partitioning or visit order. Both operators here key every decision
off the md5-chain hash of (group, id) — the same cross-engine hash
(functions.hashing.md5_long) the dedup chains use — so the sample is
a pure function of the data, replayable in the DuckDB oracle and
stable under repartitioning, retries, and cluster size.

- ``hash_rate_sample``: per-group Bernoulli by rate, as a pure FILTER
  (no shuffle, no RNG state) — the scale path for "keep 25% of each
  language".
- ``deterministic_group_topk``: exactly-k rows per group, ordered by
  the hash (a reservoir-sample stand-in with none of the sequential
  state): one row_number window partitioned by group. Spark's
  WindowGroupLimit rule (3.5+) pushes the k-limit below the exchange,
  so each map task forwards at most k rows per group — shuffle volume
  is O(groups x k), not O(rows). Few giant groups still serialize
  their top-k merge; salt the group key if k is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from streaming_cdc_spark.functions.hashing import md5_long


def _sample_hash(group_col: str, id_col: str):
    # NULL groups hash as '' on BOTH engines: Spark's concat_ws would
    # otherwise DROP a NULL argument plus its separator ('5'), while
    # DuckDB's concat keeps the separator ('|5') — different hash,
    # divergent sample membership (code-review r4). With the coalesce,
    # both render '|5'.
    g = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    return md5_long(F.concat_ws("|", g, F.col(id_col).cast("string")))


def hash_rate_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    rate_permille: int,
) -> DataFrame:
    """Keep rows whose 60-bit (group, id) hash lands below
    ``rate_permille``/1000 — deterministic Bernoulli(rate) per group,
    integer arithmetic end to end (no float boundary, no RNG)."""
    return df.filter(_sample_hash(group_col, id_col) % 1000 < rate_permille)


def deterministic_group_topk(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, selected by hash order
    (ties broken by id — total order, so the sample is unique)."""
    w = W.partitionBy(group_col).orderBy(
        _sample_hash(group_col, id_col).alias("_h"), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    unit: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted bottom-k — priority sampling in the
    Duffield-Lund-Thorup shape with the random draw replaced by the
    row's 40-bit id hash: priority = (u40 * unit) div weight. Heavier
    rows get proportionally smaller priorities, so selection
    probability grows with weight, and EVERYTHING is integer
    arithmetic (u40 < 2^40, so u40 * unit fits int64 with 1e6 scale):
    the sample is an exact total order, identical across engines,
    partitionings, and reruns — no ln(u)/w float boundary to drift.
    Physical: one projection + TakeOrdered(k) with (priority, id)
    tiebreak — O(k) per partition, one tiny final merge, no shuffle
    of the data itself. Adds a ``priority`` column."""
    out = df.withColumn(
        "_u40",
        md5_long(F.col(id_col).cast("string")) % F.lit(1 << 40).cast("long"),
    ).withColumn(
        "priority",
        F.expr(f"(_u40 * {unit}) div greatest(cast({weight_col} as long), 1)"),
    )
    return out.drop("_u40").orderBy("priority", id_col).limit(k)


def greedy_max_coverage(
    items: DataFrame,
    id_col: str,
    elem_col: str,
    k: int,
) -> DataFrame:
    """GREEDY MAX-COVERAGE subset selection — the (1 - 1/e)
    submodular greedy (Nemhauser/Wolsey/Fisher '78), the standard
    coverage-based data-subset-selection step (pick the k documents
    that jointly cover the most distinct shingles/facts/n-grams):
    per round, each candidate's MARGINAL gain is its count of
    still-uncovered elements; the (gain DESC, id ASC) argmax joins
    the selection and its elements join the covered set.

    Fully distributed: per round one anti-join against the covered
    set + one keyed count + one global top-1 (TakeOrdered — never a
    single-partition window); the covered set stays a DataFrame (no
    driver collect) and is localCheckpointed so round r+1's plan does
    not re-run rounds 1..r. Fixed k keeps it SQL-replayable (unrolled
    round CTEs, the pagerank/bisection convention). Rounds after
    coverage is exhausted emit no row. Output:
    (pick_round, <id_col>, gain)."""
    s = (
        items.select(F.col(id_col).alias("_id"), F.col(elem_col).alias("_e"))
        .distinct()
        .localCheckpoint()
    )
    covered: DataFrame | None = None
    picks: list[DataFrame] = []
    for r in range(1, k + 1):
        remaining = s if covered is None else s.join(covered, "_e", "left_anti")
        gains = remaining.groupBy("_id").agg(
            F.count(F.lit(1)).cast("long").alias("gain")
        )
        top = (
            gains.orderBy(F.desc("gain"), F.asc("_id")).limit(1).localCheckpoint()
        )
        picks.append(
            top.select(
                F.lit(r).cast("long").alias("pick_round"),
                F.col("_id").alias(id_col),
                "gain",
            )
        )
        newly = s.join(top.select("_id"), "_id", "left_semi").select("_e")
        covered = (
            newly if covered is None else covered.union(newly)
        ).localCheckpoint()
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out
