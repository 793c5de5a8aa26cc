"""Sorted-neighborhood blocking + Fellegi-Sunter scoring
(operators/linkage.py) and label propagation
(operators/clustering.py: label_propagation)."""

import math

import pytest
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.linkage import (
    fellegi_sunter_scores,
    fs_u_stats,
    sorted_neighborhood_pairs,
)


def test_snm_pairs_equal_bruteforce(spark):
    """Banded-bucket pair generation == the definitional rank-band
    self-join, on a key order with duplicates and for several window
    sizes (incl. window crossing bucket boundaries)."""
    rows = [(i, f"k{(i * 7) % 5}", i % 3) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, k string, g int")
    order = sorted((r[1], r[2], r[0]) for r in rows)
    rank = {t[2]: i + 1 for i, t in enumerate(order)}
    for w in (2, 3, 5):
        got = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                df, ["k", "g", "id"], "id", window=w
            ).collect()
        }
        want = {
            (a, b)
            for a in rank
            for b in rank
            if 1 <= rank[b] - rank[a] <= w - 1
        }
        assert got == want


def test_snm_pair_volume_is_linear(spark):
    """n rows -> exactly (n - w/2)*(w-1)-ish pairs: sum over gaps
    g=1..w-1 of (n-g). No quadratic blowup regardless of key skew
    (every row shares the same key here — the worst case for
    key-equality blocking is irrelevant to rank banding)."""
    n, w = 200, 4
    df = spark.range(n).select(F.col("id"), F.lit("same").alias("k"))
    got = sorted_neighborhood_pairs(df, ["k", "id"], "id", window=w).count()
    assert got == sum(n - g for g in range(1, w))


def test_snm_is_skew_free_under_mega_key(spark):
    """Rank banding is skew-free BY CONSTRUCTION: a sort key shared
    by 90% of rows (which would square a key-equality blocker) still
    yields exactly the linear rank-band pair count, and every rank
    bucket holds exactly `window` rows regardless of key skew."""
    n, w = 300, 5
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit("MEGA")).otherwise(
            F.concat(F.lit("rare"), F.col("id").cast("string"))
        ).alias("k"),
    )
    pairs = sorted_neighborhood_pairs(df, ["k", "id"], "id", window=w)
    assert pairs.count() == sum(n - g for g in range(1, w))
    # bucket occupancy is rank-range-determined: exactly w rows per
    # full bucket — the mega key cannot concentrate a join key
    from streaming_cdc_spark.operators.ranking import row_number_global

    ranked = row_number_global(df, ["k", "id"], "_rank")
    occ = (
        ranked.select(F.expr(f"(_rank - 1) div {w}").alias("b"))
        .groupBy("b")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()["mx"]
    )
    assert occ == w


def test_fs_scores_hand_computed(spark):
    """Fellegi-Sunter ratios against a by-hand computation: 4 records,
    one field with frequencies (2, 2) -> u = 4/12; m = 0.9."""
    recs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, f string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    ).join(
        recs.select(F.col("id").alias("id_a"), F.col("f").alias("f_a")), "id_a"
    ).join(
        recs.select(F.col("id").alias("id_b"), F.col("f").alias("f_b")), "id_b"
    )
    stats = fs_u_stats(recs, ["f"])
    got = {
        (r["id_a"], r["id_b"]): (r["agree_f"], r["score_r"])
        for r in fellegi_sunter_scores(
            pairs, stats, ["f"], {"f": 900_000}
        ).collect()
    }
    # u = (2*1 + 2*1) / (4*3) = 1/3; agree: 0.9/(1/3) = 2.7;
    # disagree: 0.1/(2/3) = 0.15
    assert got[(1, 2)][0] is True
    assert math.isclose(got[(1, 2)][1], 2.7, abs_tol=1e-9)
    assert got[(1, 3)][0] is False
    assert math.isclose(got[(1, 3)][1], 0.15, abs_tol=1e-9)


def test_label_propagation_splits_dense_regions(spark):
    """Two 4-cliques joined by a single bridge edge: CC merges them
    into one component; LPA's mode vote keeps two communities. Also
    pins the deterministic tie-break (results stable across runs)."""
    from streaming_cdc_spark.operators.clustering import label_propagation

    cliq1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cliq2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(cliq1 + cliq2 + [(3, 10)], "u long, v long")
    out = {r["vec_id"]: r["community"] for r in label_propagation(edges, 3).collect()}
    comms = set(out.values())
    assert len(comms) == 2
    assert {out[i] for i in range(4)} != {out[i] for i in range(10, 14)}
    out2 = {r["vec_id"]: r["community"] for r in label_propagation(edges, 3).collect()}
    assert out == out2


def test_label_propagation_iteration_zero_is_identity_vote(spark):
    """One iteration on a path graph a-b-c: ends adopt the middle's
    label only if it wins the (count, label) order — with single
    neighbors each end takes its neighbor's id; the middle takes
    MIN(a, c)."""
    from streaming_cdc_spark.operators.clustering import label_propagation

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    out = {r["vec_id"]: r["community"] for r in label_propagation(edges, 1).collect()}
    assert out == {1: 2, 2: 1, 3: 2}
