"""Strategy parity for the pairwise-similarity kernel: the exact
triangle-blocked path (the 100 TB default) must produce the identical
edge set as the broadcast block-matmul, and must never collect the
build side on the driver."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streaming_cdc_spark.operators import similarity
from streaming_cdc_spark.operators.similarity import (
    blended_self_edges,
    cosine_self_edges,
)


def _vec_df(spark, n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d))
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _edges(df):
    return {
        (r["u"], r["v"]): r["sim"]
        for r in df.collect()
    }


def test_blocked_matches_broadcast_exactly(spark):
    df = _vec_df(spark)
    bcast = _edges(cosine_self_edges(df, 0.3, strategy="broadcast"))
    blocked = _edges(cosine_self_edges(df, 0.3, strategy="blocked", block_rows=10))
    assert set(bcast) == set(blocked)
    for k in bcast:
        assert abs(bcast[k] - blocked[k]) < 1e-9


def test_blocked_single_block_degenerate(spark):
    # n_blocks == 1: everything lands in one pair group (i == j branch)
    df = _vec_df(spark, n=12)
    bcast = _edges(cosine_self_edges(df, 0.0, strategy="broadcast"))
    blocked = _edges(cosine_self_edges(df, 0.0, strategy="blocked", block_rows=1_000))
    assert set(bcast) == set(blocked)


def test_blocked_chunked_matmul_matches_broadcast(spark, monkeypatch):
    """r6: the sims matmul is row-chunked so a block-pair task never
    allocates |left|x|right| doubles at once (a 100k-row block was an
    80 GB allocation — caught live by tools/stress.py). Force many
    tiny chunks through BOTH branches (i==j and i!=j) and require the
    exact broadcast edge set, incl. values."""
    monkeypatch.setattr(similarity, "_CHUNK_ELEMS", 37)  # ~5-row chunks
    df = _vec_df(spark, n=80)
    bcast = _edges(cosine_self_edges(df, 0.2, strategy="broadcast"))
    # block_rows=30 -> 3 blocks: diagonal AND off-diagonal pair groups
    blocked = _edges(cosine_self_edges(df, 0.2, strategy="blocked", block_rows=30))
    assert set(bcast) == set(blocked)
    for k in bcast:
        assert abs(bcast[k] - blocked[k]) < 1e-9


def test_blended_blocked_matches_broadcast(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(size=(40, 6))
    b = rng.normal(size=(40, 4))
    df = spark.createDataFrame(
        [
            (i, [float(x) for x in a[i]], [float(x) for x in b[i]])
            for i in range(40)
        ],
        "vec_id long, va array<double>, vb array<double>",
    )
    w = [("va", 0.8), ("vb", 0.2)]
    bcast = _edges(blended_self_edges(df, w, 0.2, strategy="broadcast"))
    blocked = _edges(blended_self_edges(df, w, 0.2, strategy="blocked", block_rows=7))
    assert set(bcast) == set(blocked)
    for k in bcast:
        assert abs(bcast[k] - blocked[k]) < 1e-9


def test_blocked_path_never_collects_on_driver(spark, monkeypatch):
    """The scale path must not route through _collect_matrix (driver
    toPandas of the build side) — VERDICT r1 finding 4."""
    df = _vec_df(spark, n=30)

    def boom(*a, **k):
        raise AssertionError("driver collect on the blocked path")

    monkeypatch.setattr(similarity, "_collect_matrix", boom)
    edges = cosine_self_edges(df, 0.3, strategy="blocked", block_rows=8)
    assert edges.count() >= 0  # forces execution through the blocked path


def test_auto_strategy_cutover(spark, monkeypatch):
    """auto picks broadcast below the row cutoff and blocked above it."""
    df = _vec_df(spark, n=30)
    called = {"bcast": 0, "blocked": 0}
    orig_b, orig_k = similarity._broadcast_self_edges, similarity._blocked_self_edges

    def spy_b(*a, **k):
        called["bcast"] += 1
        return orig_b(*a, **k)

    def spy_k(*a, **k):
        called["blocked"] += 1
        return orig_k(*a, **k)

    monkeypatch.setattr(similarity, "_broadcast_self_edges", spy_b)
    monkeypatch.setattr(similarity, "_blocked_self_edges", spy_k)
    cosine_self_edges(df, 0.3, broadcast_max_rows=1_000)
    assert called == {"bcast": 1, "blocked": 0}
    cosine_self_edges(df, 0.3, broadcast_max_rows=10)
    assert called == {"bcast": 1, "blocked": 1}


def test_strict_threshold_comparison(spark):
    """Pairs exactly AT the threshold are excluded on every path —
    reference semantics (nn_thresh.py links on score > threshold)."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # cos(1,2)=1.0, cos(1,3)=cos(2,3)=0.0
    for strat in ("broadcast", "blocked"):
        got = set(_edges(cosine_self_edges(df, 0.0, strategy=strat, block_rows=2)))
        assert got == {(1, 2)}
        got1 = set(_edges(cosine_self_edges(df, 1.0, strategy=strat, block_rows=2)))
        assert got1 == set()
