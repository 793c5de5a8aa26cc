"""Property-based tests (hypothesis) for the driver-side kernels and
metric invariants. Spark-touching properties use few examples; the
pure-numpy kernels get the full treatment.
"""

import itertools

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from streaming_cdc_spark.metrics.hungarian import linear_sum_assignment
from streaming_cdc_spark.operators.greedy import greedy_cluster_numpy
from streaming_cdc_spark.operators.encoder import recenter_tokens


# -- Hungarian ---------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 5),
    st.integers(1, 5),
    st.integers(0, 10_000),
    st.booleans(),
)
def test_hungarian_optimal(n, m, seed, maximize):
    rng = np.random.default_rng(seed)
    c = rng.random((n, m))
    ri, ci = linear_sum_assignment(c, maximize=maximize)
    total = c[ri, ci].sum()
    k = min(n, m)
    best = None
    if n <= m:
        for cols in itertools.permutations(range(m), k):
            s = sum(c[i, cols[i]] for i in range(k))
            best = s if best is None else (max(best, s) if maximize else min(best, s))
    else:
        for rows in itertools.permutations(range(n), k):
            s = sum(c[rows[j], j] for j in range(k))
            best = s if best is None else (max(best, s) if maximize else min(best, s))
    assert total == pytest.approx(best, abs=1e-9)


# -- greedy clustering kernel -----------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.integers(2, 20), st.integers(0, 10_000))
def test_greedy_cluster_ids_are_reachable_and_stable(n, seed):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, 4))
    labels = greedy_cluster_numpy(e, threshold=0.6)
    # ids are valid indices; self-similarity > threshold guarantees a
    # mention is linked at least to itself
    assert labels.shape == (n,)
    assert ((labels >= 0) & (labels < n)).all()
    # idempotent: same input -> same output
    assert (labels == greedy_cluster_numpy(e, threshold=0.6)).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 12), st.integers(0, 10_000))
def test_greedy_matches_union_find_on_transitive_data(n, seed):
    """SURVEY §2.7-C1 equivalence claim: when similarity is transitive
    (block-diagonal one-hot data), the greedy order-dependent pass and
    connected components produce the same PARTITION."""
    rng = np.random.default_rng(seed)
    block = rng.integers(0, 3, size=n)
    e = np.eye(3)[block]  # identical vectors within a block
    labels = greedy_cluster_numpy(e, threshold=0.5)
    # same block <-> same cluster
    for i in range(n):
        for j in range(n):
            assert (labels[i] == labels[j]) == (block[i] == block[j])


# -- recentring --------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 30), st.integers(0, 30), st.integers(0, 20))
def test_recenter_budget_bounds(nl, nr, budget):
    left = [f"l{i}" for i in range(nl)]
    right = [f"r{i}" for i in range(nr)]
    l, r = recenter_tokens(left, right, budget)
    # never exceeds the total budget, keeps suffix/prefix order
    assert len(l) + len(r) <= 2 * budget
    assert l == left[len(left) - len(l) :]
    assert r == right[: len(r)]
    # budget is fully used when enough tokens exist
    assert len(l) + len(r) == min(nl + nr, 2 * budget) or (
        len(l) == nl and len(r) == nr
    )


# -- metric invariants (Spark, few examples) --------------------------


def test_metric_invariants(spark):
    from streaming_cdc_spark.metrics.coref import b3_df, muc_df

    rng = np.random.default_rng(0)
    rows = [(i, int(rng.integers(0, 4)), int(rng.integers(0, 5))) for i in range(40)]
    df = spark.createDataFrame(rows, "mention long, true_id long, pred_id long")

    # renaming pred ids (bijection) leaves every metric unchanged
    remap = {p: 100 + (p * 7) % 11 for p in range(5)}
    rows2 = [(m, t, remap[p]) for m, t, p in rows]
    df2 = spark.createDataFrame(rows2, "mention long, true_id long, pred_id long")
    assert muc_df(df).collect() == muc_df(df2).collect()
    assert b3_df(df).collect() == b3_df(df2).collect()

    # perfect clustering -> all ones
    perfect = spark.createDataFrame(
        [(m, t, t) for m, t, _ in rows], "mention long, true_id long, pred_id long"
    )
    m = muc_df(perfect).first()
    assert m["muc_p"] == pytest.approx(1.0, abs=1e-6)
    assert m["muc_r"] == pytest.approx(1.0, abs=1e-6)
    b = b3_df(perfect).first()
    assert b["b3_f1"] == pytest.approx(1.0, abs=1e-6)
