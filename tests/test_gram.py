"""Exact distributed Gram/covariance: partition-count invariance,
chunk-boundary equivalence, and agreement with a single-process numpy
reference on the same quantized definition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.gram import QUANT, covariance_matrix, partial_gram


def _mk(spark, n=257, d=5, seed=7, parts=4):
    rng = np.random.default_rng(seed)
    m = rng.normal(scale=1.3, size=(n, d)).astype(np.float32)
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(
        parts
    )
    return df, m


def _ref(m):
    q = np.floor(m.astype(np.float64) * QUANT).astype(np.int64)
    g = q.T @ q
    s = q.sum(axis=0)
    n = len(q)
    iu = np.triu_indices(m.shape[1])
    out = {}
    for i, j in zip(*iu):
        cov = (g[i, j] / n - (s[i] / n) * (s[j] / n)) / float(QUANT * QUANT)
        out[(i + 1, j + 1)] = (int(g[i, j]), round(cov, 6))
    return out


def test_covariance_matches_numpy_reference(spark):
    df, m = _mk(spark)
    got = {
        (r.dim_i, r.dim_j): (r.gram_q, r.cov_r)
        for r in covariance_matrix(df).collect()
    }
    assert got == _ref(m)


def test_partition_count_invariant(spark):
    df1, m = _mk(spark, parts=1)
    df7, _ = _mk(spark, parts=7)
    c1 = sorted(map(tuple, covariance_matrix(df1).collect()))
    c7 = sorted(map(tuple, covariance_matrix(df7).collect()))
    assert c1 == c7


def test_chunk_boundary_equivalence(spark):
    # Arrow hands mapInPandas multiple small batches per partition;
    # partials must merge to the same exact integers.
    df, m = _mk(spark, n=101, parts=2)
    base = sorted(map(tuple, covariance_matrix(df).collect()))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        small = sorted(map(tuple, covariance_matrix(df).collect()))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert small == base


def test_partial_counts_cover_all_rows(spark):
    df, m = _mk(spark, n=64, d=3, parts=3)
    diag = (
        partial_gram(df)
        .filter((F.col("dim_i") == 1) & (F.col("dim_j") == 1))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert diag == 64


def test_overflow_guard_raises(spark):
    rows = [(0, [float(1 << 14), 1.0]), (1, [2.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="overflow budget"):
        covariance_matrix(df).collect()


def test_non_finite_input_raises_not_wraps(spark):
    # NaN would bypass the magnitude guard (floor(NaN)->INT64_MIN,
    # np.abs stays negative) and silently wrap the matmul; the
    # operator must raise a named error instead.
    for bad in (float("nan"), float("inf"), float("-inf")):
        rows = [(0, [bad, 1.0]), (1, [2.0, 3.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        with pytest.raises(Exception, match="non-finite"):
            covariance_matrix(df).collect()
