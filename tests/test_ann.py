"""IVF ANN: recall against brute force on clustered data."""

import numpy as np

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
