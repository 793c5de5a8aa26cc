"""Record-linkage classics: sorted-neighborhood blocking (Hernández &
Stolfo, SIGMOD'95) and Fellegi-Sunter match scoring (JASA 1969) —
the probabilistic-ER layer the reference's exact-key clustering
(string_match.py:14-28, oracle_wd.py:17-36) stops short of, and the
pair-generation/scoring machinery a large-scale identity-resolution
pipeline runs before any clustering.

Scale shapes:
- Sorted neighborhood: ONE range exchange (the global rank, via the
  mono-id decode of ranking.row_number_global — the corpus moves
  once), then a bucket-banded equi-join in which every row meets at
  most 2·window candidates — linear output by construction, no theta
  join, no window functions over a single partition.
- Fellegi-Sunter: per-field u-probabilities from EXACT integer
  frequency sums (sum f_v·(f_v-1) over value frequencies / N·(N-1) —
  the standard frequency-based estimate), shipped as a one-row
  broadcast; scoring is a pure column projection over candidate
  pairs. No driver data, no floats until one final fixed-order
  division/multiply chain (IEEE-identical in Spark and DuckDB, the
  exact_moment_corr pattern) — the score is the product of per-field
  likelihood ratios (monotone-equivalent to the classic sum of log
  weights; log is avoided because ln() is not bit-identical across
  engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.ranking import row_number_global


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list,
    id_col: str,
    window: int,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """All ordered pairs whose global ranks under ``order_cols`` are
    within ``window`` (0 < rank_b - rank_a <= window - 1) — the
    sorted-neighborhood blocking method. ``order_cols`` MUST be a
    total order (append the id as tiebreak).

    Physical: global rank (one range exchange), then each row is
    banded into bucket (rank-1) div window; row A probes buckets
    {b, b+1} (explode of two keys), row B sits at its own bucket —
    every qualifying pair matches exactly once, every row meets at
    most 2·window rows before the rank filter, so candidate volume is
    n·(window-1): linear, skew-free (buckets are rank-ranges, equal
    sized by construction).

    Output: (id_a, id_b, rank_a, rank_b) plus ``keep_cols`` from both
    sides suffixed _a/_b."""
    keep = keep_cols or []
    ranked = row_number_global(
        df.select(id_col, *keep), order_cols, "_rank"
    ).localCheckpoint()
    b = F.expr(f"(_rank - 1) div {window}")
    left = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("_rank").alias("rank_a"),
        *[F.col(c).alias(f"{c}_a") for c in keep],
        F.explode(F.array(b, b + 1)).alias("_bkt"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("_rank").alias("rank_b"),
        *[F.col(c).alias(f"{c}_b") for c in keep],
        b.alias("_bkt"),
    )
    return (
        left.join(right, "_bkt")
        .filter(
            (F.col("rank_b") - F.col("rank_a") >= 1)
            & (F.col("rank_b") - F.col("rank_a") <= window - 1)
        )
        .drop("_bkt")
    )


def fs_u_stats(records: DataFrame, fields: list[str]) -> DataFrame:
    """One-row DataFrame of exact-integer Fellegi-Sunter u-statistics:
    for each field f, ``u_num_f`` = sum over values of f_v·(f_v-1)
    (the number of ordered random record pairs agreeing on f), plus
    ``n_rec``; u_f = u_num_f / (n·(n-1)). All BIGINT — no float
    enters until scoring."""
    out = records.agg(F.count(F.lit(1)).cast("long").alias("n_rec"))
    for f in fields:
        freq = records.groupBy(f).agg(F.count(F.lit(1)).alias("_c"))
        s = freq.agg(
            F.sum(F.col("_c") * (F.col("_c") - 1)).cast("long").alias(f"u_num_{f}")
        )
        out = out.crossJoin(s)
    return out


def fellegi_sunter_scores(
    pairs: DataFrame,
    u_stats: DataFrame,
    fields: list[str],
    m_micro: dict[str, int],
    score_dp: int = 4,
) -> DataFrame:
    """Score candidate pairs with the Fellegi-Sunter likelihood
    ratio: per field f with match probability m_f (micro-units, the
    caller's prior) and frequency-based u_f,

        ratio_f = m_f / u_f          if the pair agrees on f
                = (1 - m_f)/(1 - u_f) otherwise

    score = product of ratios in FIELD-LIST ORDER (fixed operand
    order; monotone-equivalent to the textbook sum of log2 weights,
    avoiding non-bit-identical ln). Every ratio is one double
    division of exact BIGINT products, so the rounded score is
    engine-identical. ``pairs`` must carry ``{f}_a``/``{f}_b`` for
    each field (sorted_neighborhood_pairs' keep_cols does).
    Output: pairs + agree_{f} flags + score_r."""
    out = pairs.crossJoin(F.broadcast(u_stats))
    den = F.col("n_rec") * (F.col("n_rec") - F.lit(1))
    score = None
    for f in fields:
        m = m_micro[f]
        agree = F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b"))
        out = out.withColumn(f"agree_{f}", agree)
        u_num = F.col(f"u_num_{f}")
        ratio = F.when(
            F.col(f"agree_{f}"),
            (F.lit(m) * den).cast("double") / (F.lit(1_000_000) * u_num).cast("double"),
        ).otherwise(
            (F.lit(1_000_000 - m) * den).cast("double")
            / (F.lit(1_000_000) * (den - u_num)).cast("double")
        )
        score = ratio if score is None else score * ratio
    return out.withColumn("score_r", F.round(score, score_dp)).drop(
        "n_rec", *[f"u_num_{f}" for f in fields]
    )
