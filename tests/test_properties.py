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


# -- corpus-hygiene operator invariants (Spark: few examples) ----------


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 10_000))
def test_sessionize_invariants(seed):
    """Within a session: consecutive gaps <= threshold; across
    consecutive sessions of a user: the boundary gap > threshold."""
    import datetime as dt

    from streaming_cdc_spark.operators.temporal import sessionize
    from streaming_cdc_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(40):
        rows.append(
            (
                eid,
                int(rng.integers(0, 4)),
                t0 + dt.timedelta(seconds=int(rng.integers(0, 20000))),
            )
        )
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = sessionize(df, "user_id", "ts", 1800, ["ts", "event_id"]).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for prev, cur in zip(rs, rs[1:]):
            gap = (cur["ts"] - prev["ts"]).total_seconds()
            if cur["session_id"] == prev["session_id"]:
                assert gap <= 1800
            else:
                assert gap > 1800
                assert cur["session_id"] == prev["session_id"] + 1


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 10_000), st.integers(10, 100))
def test_pack_sequences_invariants(seed, budget):
    """Sequences are contiguous in id order; every sequence except
    possibly the last STARTS under the budget boundary."""
    from streaming_cdc_spark.operators.text import pack_sequences
    from streaming_cdc_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    rng = np.random.default_rng(seed)
    rows = [(i, " ".join(["w"] * int(rng.integers(1, 30)))) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(pack_sequences(df, budget=budget).collect(), key=lambda r: r["doc_id"])
    # cum_tokens is the inclusive prefix sum in id order
    run = 0
    for r in got:
        run += r["n_tokens"]
        assert r["cum_tokens"] == run
        assert r["seq_id"] == (r["cum_tokens"] - r["n_tokens"]) // budget
    # seq ids are nondecreasing in id order
    sids = [r["seq_id"] for r in got]
    assert sids == sorted(sids)
