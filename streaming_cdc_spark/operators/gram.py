"""Distributed exact Gram / covariance matrix over an embedding column.

The reference pipeline whitens and PCA-projects mention encodings
(SURVEY §2: the vectorize/encode surface); the precursor for both is
the d x d second-moment (Gram) matrix of an n x d embedding table.
At 100 TB the only scale-correct physical is map-side partial
accumulation: each task folds its rows into ONE d x d partial (an
O(rows * d^2) numpy matmul, d^2 output cells), and the shuffle moves
`partitions * d*(d+1)/2` tiny rows — never the data. A naive
explode-and-self-join (n * d^2 rows through a shuffle) would move
~4096x the input; the pivoted groupBy form still shuffles n*d rows.

Exactness across engines: float sums are partition-order dependent,
so values are first QUANTIZED to integer milli-units with FLOOR
(floor(x * 1000) — floor is identical in Spark, DuckDB, and numpy,
and avoids the round-half tie hazard entirely since ties need no
rule). All accumulation is then exact int64 arithmetic: per-task
partials via numpy int64 matmul, the cross-task merge via Spark
SUM(BIGINT). The DuckDB oracle re-derives the same integers from an
unnest + dim self-join — an independent formulation of the same
quantized definition.

Overflow budget: |q| <= Q_MAX milli-units (checked per batch), so a
single product is <= Q_MAX^2 and an int64 partial holds
9.2e18 / Q_MAX^2 rows per task — with Q_MAX = 2^15 that is ~8.6e9
rows/task, far above any realistic partition; the merged Spark-side
SUM is BIGINT and raises on overflow under ANSI rather than wrapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_cdc_spark.session import ensure_package_on_executors, fan_out

QUANT = 1000
# int64 partial-overflow guard: a batch with any |q| above this raises
# rather than risking silent wraparound in the matmul.
Q_MAX = 1 << 15


def partial_gram(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-partition exact quantized Gram partials.

    Returns one row per (partition-batch, dim_i <= dim_j) with the
    int64 partial sums: gram_q = sum(q_i * q_j), sum_i, sum_j, n.
    Callers merge with a keyed SUM over (dim_i, dim_j).
    """
    spark = df.sparkSession
    ensure_package_on_executors(spark)

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = pdf[vec_col]
            if len(vecs) == 0:
                continue
            # float32 -> float64 is exact; *1000 is exact (1000 = 8*125,
            # 125 fits the float32 mantissa headroom); floor is exact.
            m = np.stack(vecs.to_numpy())
            # NaN/Inf would bypass the overflow guard below:
            # floor(NaN).astype(int64) is INT64_MIN, whose np.abs is
            # still negative, so |q| >= Q_MAX never trips and the
            # matmul silently wraps. Reject non-finite input first.
            if not np.isfinite(m).all():
                raise ValueError(
                    "non-finite embedding values (NaN/Inf): exact "
                    "quantized Gram is undefined; clean the input"
                )
            q = np.floor(m.astype(np.float64) * QUANT).astype(np.int64)
            if np.abs(q).max() >= Q_MAX:
                raise ValueError(
                    f"quantized magnitude >= {Q_MAX}: int64 Gram partial "
                    "overflow budget exceeded; rescale QUANT"
                )
            g = q.T @ q  # d x d int64, exact
            s = q.sum(axis=0)
            d = g.shape[0]
            iu = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "dim_i": iu[0] + 1,
                    "dim_j": iu[1] + 1,
                    "gram_q": g[iu],
                    "sum_i": s[iu[0]],
                    "sum_j": s[iu[1]],
                    "n": np.full(len(iu[0]), len(q), dtype=np.int64),
                }
            )

    return fan_out(df.select(vec_col)).mapInPandas(
        gen,
        "dim_i long, dim_j long, gram_q long, sum_i long, sum_j long, n long",
    )


def covariance_matrix(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact-integer Gram sums merged across tasks + the covariance
    as one fixed-order double formula per (i, j) cell:
    cov = (gram_q/n - (sum_i/n)*(sum_j/n)) / QUANT^2."""
    merged = partial_gram(df, vec_col).groupBy("dim_i", "dim_j").agg(
        F.sum("gram_q").alias("gram_q"),
        F.sum("sum_i").alias("sum_i"),
        F.sum("sum_j").alias("sum_j"),
        F.sum("n").alias("n"),
    )
    gd = F.col("gram_q").cast("double")
    si = F.col("sum_i").cast("double")
    sj = F.col("sum_j").cast("double")
    nd = F.col("n").cast("double")
    return merged.select(
        "dim_i",
        "dim_j",
        "gram_q",
        "n",
        F.round((gd / nd - (si / nd) * (sj / nd)) / float(QUANT * QUANT), 6).alias(
            "cov_r"
        ),
    )
