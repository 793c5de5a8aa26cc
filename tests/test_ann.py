"""IVF ANN: recall against brute force on clustered data."""

import numpy as np
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.ann import fit_ivf_index, ivf_top_k


def test_ivf_recall(spark):
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(8, 16)) * 3
    vecs = np.vstack([c + rng.normal(scale=0.2, size=(25, 16)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    assigned, centroids = fit_ivf_index(df, k=8, seed=42)
    queries = df.filter("vec_id < 10")
    got = ivf_top_k(queries, assigned, centroids, k=3, n_probe=2)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q"], []).append((r["rank"], r["neighbor"]))
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    hits = total = 0
    for q in range(10):
        truth = set(
            sorted((i for i in range(len(vecs)) if i != q), key=lambda i: (-sims[q, i], i))[:3]
        )
        found = {n for _, n in by_q.get(q, [])}
        hits += len(truth & found)
        total += 3
    # clustered data, 2 of 8 cells probed -> near-perfect recall
    assert hits / total >= 0.9


def test_ivf_deterministic(spark):
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    a_assigned, a_cent = fit_ivf_index(df, k=4, seed=7)
    b_assigned, b_cent = fit_ivf_index(df, k=4, seed=7)
    assert np.allclose(a_cent, b_cent)
    a = sorted(map(tuple, ivf_top_k(df.filter("vec_id<5"), a_assigned, a_cent, k=2).collect()))
    b = sorted(map(tuple, ivf_top_k(df.filter("vec_id<5"), b_assigned, b_cent, k=2).collect()))
    assert a == b


def test_nearest_centroid_matches_numpy(spark):
    from streaming_cdc_spark.operators.ann import collect_seed_centroids, nearest_centroid

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cents = collect_seed_centroids(df, 4)
    out = df.select(
        "vec_id", nearest_centroid("embedding", cents).getField("cid").alias("cid")
    ).collect()
    cmat = np.stack([np.array(c) for _, c in cents])
    for r in out:
        d = np.linalg.norm(vecs[r.vec_id] - cmat, axis=1)
        # ties to smaller centroid id == first argmin
        assert cents[int(np.argmin(d))][0] == r.cid


def test_centroid_ranking_order(spark):
    from streaming_cdc_spark.operators.ann import centroid_ranking, collect_seed_centroids

    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(20, 5))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cents = collect_seed_centroids(df, 5)
    out = df.select(
        "vec_id", centroid_ranking("embedding", cents, 3).alias("probes")
    ).collect()
    cmat = np.stack([np.array(c) for _, c in cents])
    cids = np.array([cid for cid, _ in cents])
    for r in out:
        d = np.linalg.norm(vecs[r.vec_id] - cmat, axis=1)
        expect = [int(cids[i]) for i in np.lexsort((cids, d))[:3]]
        assert list(r.probes) == expect


def test_semantic_dedup_flags(spark):
    from streaming_cdc_spark.operators.ann import semantic_dedup_flags

    # two tight duplicate groups + one singleton, all in one cell
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, base),
        (1, [2.0, 0.0, 0.0, 0.0]),          # same direction as 0 -> dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),          # orthogonal -> kept
        (3, [1.000001, 0.0, 0.0, 0.0]),     # near-identical -> dup of 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, base)]  # one cell: pure pairwise semantics
    out = {
        r.vec_id: r.dropped
        for r in semantic_dedup_flags(df, cents, tau=0.95).collect()
    }
    assert out == {0: False, 1: True, 2: False, 3: True}


def test_semantic_dedup_cells_matches_fold(spark):
    """The Arrow-batched per-cell matmul path and the expression-fold
    path produce identical flags."""
    from streaming_cdc_spark.operators.ann import (
        collect_seed_centroids,
        semantic_dedup_flags,
        semantic_dedup_flags_cells,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 8))
    vecs[40:44] = vecs[0] * 1.5  # planted dups
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    cents = collect_seed_centroids(df, 4)
    a = sorted(map(tuple, semantic_dedup_flags(df, cents, tau=0.8).collect()))
    b = sorted(map(tuple, semantic_dedup_flags_cells(df, cents, tau=0.8).collect()))
    assert a == b
    assert any(r[2] for r in a)  # the planted dups actually drop


def test_assign_cells_numpy_path_matches_literal(spark):
    """Above LITERAL_CENTROID_MAX the assignment switches to the
    Arrow-batched argmin — same cells as the literal expression."""
    from streaming_cdc_spark.operators import ann

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(120, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    cents = ann.collect_seed_centroids(df, 40)  # > LITERAL_CENTROID_MAX
    assert len(cents) > ann.LITERAL_CENTROID_MAX
    got = sorted(
        map(tuple, ann.assign_cells(df, cents, "vec_id", "embedding", "_id")
            .select("_id", "cid").collect())
    )
    lit = sorted(
        map(
            tuple,
            df.select(
                F.col("vec_id").alias("_id"),
                ann.nearest_centroid("embedding", cents).getField("cid").alias("cid"),
            ).collect(),
        )
    )
    assert got == lit

    probes = sorted(
        map(tuple, ann.probe_cells_ranked(df, cents, 2, "vec_id", "embedding", "q")
            .select("q", "cid").collect())
    )
    lit_probes = sorted(
        map(
            tuple,
            df.select(
                F.col("vec_id").alias("q"),
                F.explode(ann.centroid_ranking("embedding", cents, 2)).alias("cid"),
            ).collect(),
        )
    )
    assert probes == lit_probes


def test_ivf_exact_topk_small_cell_no_self(spark):
    """A cell with fewer than k real candidates must not resurrect
    masked self-pairs through the -inf kth boundary."""
    from streaming_cdc_spark.operators.ann import collect_seed_centroids, ivf_exact_top_k

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = collect_seed_centroids(df, 2)
    out = ivf_exact_top_k(df, cents, k=3, n_probe=1).collect()
    assert all(r.q != r.neighbor for r in out)
    assert all(np.isfinite(r.sim_r) for r in out)
