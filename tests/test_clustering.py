"""Clustering operators: greedy exact replay (reference fixture) and
connected components vs a hand union-find."""

import numpy as np
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.clustering import connected_components, threshold_clusters
from streaming_cdc_spark.operators.greedy import greedy_cluster_numpy, greedy_clusters


def test_greedy_one_hot_fixture():
    # Reference tests/nn_thresh_test.py:8-18 — 5x2 one-hot, thr 0.5
    example = np.array([[1, 0], [0, 1], [1, 0], [1, 0], [0, 1]], dtype=float)
    observed = greedy_cluster_numpy(example, threshold=0.5)
    assert observed.tolist() == [0, 1, 0, 0, 1]


def test_greedy_window_limit():
    # 3 identical vectors; window limit 1 still chains them transitively
    e = np.array([[1, 0], [1, 0], [1, 0]], dtype=float)
    assert greedy_cluster_numpy(e, 0.5, strategy="backwards", limit=1).tolist() == [0, 0, 0]


def test_greedy_spark_wrapper(spark):
    rows = [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [1.0, 0.0]), (13, [1.0, 0.0]), (14, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cluster_id"] for r in greedy_clusters(df, 0.5).collect()}
    assert got == {10: 10, 11: 11, 12: 10, 13: 10, 14: 11}


import pytest


@pytest.mark.parametrize("cutoff", [0, 2_000_000])  # distributed loop vs driver union-find
def test_connected_components(spark, cutoff):
    vertices = spark.range(1, 8).select(F.col("id").alias("v"))
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "u long, v long")
    got = {
        r["v"]: r["cluster_id"]
        for r in connected_components(vertices, edges, driver_cutoff=cutoff).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


@pytest.mark.parametrize("cutoff", [0, 2_000_000])
def test_connected_components_chain(spark, cutoff):
    # long path graph: exercises pointer jumping (O(log n) rounds)
    n = 64
    vertices = spark.range(n).select(F.col("id").alias("v"))
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "u long, v long")
    got = {
        r["v"]: r["cluster_id"]
        for r in connected_components(vertices, edges, driver_cutoff=cutoff).collect()
    }
    assert all(c == 0 for c in got.values())


def test_connected_components_custom_id_col(spark):
    vertices = spark.createDataFrame([(10,), (11,), (12,)], "vec_id long")
    edges = spark.createDataFrame([(10, 12)], "u long, v long")
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in connected_components(vertices, edges, id_col="vec_id").collect()
    }
    assert got == {10: 10, 11: 11, 12: 10}


@pytest.mark.parametrize("cutoff", [0, 2_000_000])
def test_connected_components_duplicate_and_reversed_edges(spark, cutoff):
    # r10 loop rewrite (self-loop fold + u-partitioned cached edges):
    # duplicate edges, both-direction pairs and a DESCENDING id chain
    # (the min label enters at the tail, so own-label retention and
    # the jump both do real work) must not change the assignment on
    # either physical path
    vertices = spark.range(1, 10).select(F.col("id").alias("v"))
    edges = spark.createDataFrame(
        [(9, 8), (8, 9), (8, 7), (7, 6), (7, 6), (6, 1), (3, 4)],
        "u long, v long",
    )
    got = {
        r["v"]: r["cluster_id"]
        for r in connected_components(vertices, edges, driver_cutoff=cutoff).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 3, 5: 5, 6: 1, 7: 1, 8: 1, 9: 1}


@pytest.mark.parametrize("cutoff", [0, 2_000_000])
def test_connected_components_edge_only_vertices(spark, cutoff):
    # edges referencing ids absent from `vertices` must not leak into
    # the output on either physical path (r1 ADVICE)
    vertices = spark.createDataFrame([(1,), (2,)], "v long")
    edges = spark.createDataFrame([(1, 9), (9, 2)], "u long, v long")
    got = {
        r["v"]: r["cluster_id"]
        for r in connected_components(vertices, edges, driver_cutoff=cutoff).collect()
    }
    assert set(got) == {1, 2}


def test_threshold_clusters_matches_union_find(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    tau = 0.5
    # driver-side truth: union-find over exact cosine graph
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    parent = list(range(40))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(40):
        for j in range(i + 1, 40):
            if sims[i, j] > tau:
                parent[find(i)] = find(j)
    truth = {}
    for i in range(40):
        truth.setdefault(find(i), []).append(i)
    expected = {m: min(ms) for ms in truth.values() for m in ms}
    got = {r["vec_id"]: r["cluster_id"] for r in threshold_clusters(df, tau).collect()}
    assert got == expected


def test_greedy_propagation_equals_max_parent_chase():
    """The oracle for greedy_parity_clusters relies on: the
    reference's forward id-propagation == parent-chase with
    parent(j) = max predecessor above threshold. Fuzz it."""
    import numpy as np

    from streaming_cdc_spark.operators.greedy import greedy_cluster_numpy

    rng = np.random.default_rng(11)
    for trial in range(20):
        n, d = rng.integers(5, 40), 4
        mat = rng.normal(size=(int(n), d))
        tau = float(rng.uniform(0.1, 0.9))
        labels = greedy_cluster_numpy(mat, tau)
        e = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = e @ e.T
        parent = {}
        for j in range(int(n)):
            preds = [i for i in range(j) if sims[j, i] > tau]
            if preds:
                parent[j] = max(preds)
        chase = {}
        for j in range(int(n)):
            r = j
            while r in parent:
                r = parent[r]
            chase[j] = chase.get(parent.get(j, j), r)
        want = np.array([chase[j] for j in range(int(n))])
        assert (labels == want).all(), (trial, labels, want)


def test_triangle_counts_match_bruteforce_random(spark):
    """Degree orientation must produce every triangle exactly once —
    fuzzed over random graphs including a planted clique (hub skew)."""
    import itertools
    import random

    from streaming_cdc_spark.operators.clustering import triangle_counts

    rng = random.Random(17)
    for trial in range(3):
        edges = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(90)}
        edges |= set(itertools.combinations(range(5), 2))  # planted K5
        edges = sorted(edges)
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r["vec_id"]: r["n_triangles"] for r in triangle_counts(df).collect()
        }
        es = set(edges)
        nodes = sorted({x for e in edges for x in e})
        want: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in es and (b, c) in es and (a, c) in es:
                for x in (a, b, c):
                    want[x] = want.get(x, 0) + 1
        assert got == want, trial
        # K5 corners sit in >= C(4,2)=6 triangles each
        assert all(got[x] >= 6 for x in range(5))


def test_pagerank_exact_path_graph_golden(spark):
    """Hand-computed one-iteration ranks on the path graph 1-2-3
    (micro-units): deg = 1,2,1; contributions 2->1: 500000,
    1->2 + 3->2: 2000000, 2->3: 500000; damped =
    150000 + 85%*c // 100."""
    from streaming_cdc_spark.operators.clustering import pagerank_exact

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    got = {
        r["vec_id"]: r["rank_micro"]
        for r in pagerank_exact(edges, iterations=1).collect()
    }
    assert got == {1: 575000, 2: 1850000, 3: 575000}


def test_pagerank_exact_partition_invariant(spark):
    """Integer micro-unit arithmetic: identical ranks under 1- and
    16-partition inputs (the property float PageRank lacks)."""
    from streaming_cdc_spark.operators.clustering import pagerank_exact

    import random

    rnd = random.Random(7)
    edges = [(rnd.randrange(40), 40 + rnd.randrange(40)) for _ in range(300)]
    df1 = spark.createDataFrame(edges, "u long, v long").repartition(1)
    df16 = spark.createDataFrame(edges, "u long, v long").repartition(16)
    a = sorted(map(tuple, pagerank_exact(df1, 3).collect()))
    b = sorted(map(tuple, pagerank_exact(df16, 3).collect()))
    assert a == b


def test_bfs_distances_path_single_seed(spark):
    from streaming_cdc_spark.operators.clustering import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "u long, v long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, rounds=3).collect()
    }
    # nodes beyond 3 hops are absent, not infinite
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_distances_multi_seed_takes_min(spark):
    from streaming_cdc_spark.operators.clustering import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "u long, v long"
    )
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, rounds=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}


def test_bfs_distances_edges_are_undirected(spark):
    from streaming_cdc_spark.operators.clustering import bfs_distances

    edges = spark.createDataFrame([(7, 8)], "u long, v long")
    seeds = spark.createDataFrame([(8,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, rounds=2).collect()
    }
    assert got == {8: 0, 7: 1}
