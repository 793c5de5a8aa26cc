"""Pairwise similarity operators — the reference's O(n^2) score matrix
(nn_thresh.py:112-115 ``torch.mm(E, E^T)``, baseline.py:35-40) recast
for Spark.

Physical strategy: the probe side streams through ``mapInPandas`` in
Arrow batches; the build side is a broadcast numpy matrix, so each
batch is one BLAS matmul — the vectorized fast path. This is the
"broadcast block-matmul" pattern: correct whenever the BUILD side fits
in executor memory (tens of millions of 64-d vectors). At 100 TB the
build side is replaced by LSH buckets (see lsh_bucket_edges /
operators.dedup minhash) and this same kernel re-scores candidates
within a bucket — candidate generation changes, the scoring kernel
does not.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prepare(df: DataFrame):
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Collect the build side as (ids, row-normalized float64 matrix)."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms


def cosine_self_edges(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (u < v) with cosine(u, v) >= threshold.

    Output: (u long, v long, sim double). The similarity graph that
    feeds threshold clustering (C1-C3).
    """
    spark = df.sparkSession
    _prepare(df)
    ids_b, mat_b = _collect_matrix(df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids_b, mat_b))

    def gen(batches):
        r_ids, r_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(a, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            sims = (a / n) @ r_mat.T
            li, ri = np.nonzero(sims >= threshold)
            u = pdf[id_col].to_numpy()[li]
            v = r_ids[ri]
            keep = u < v
            yield pd.DataFrame(
                {"u": u[keep], "v": v[keep], "sim": sims[li, ri][keep]}
            )

    return df.select(id_col, vec_col).mapInPandas(gen, "u long, v long, sim double")


def blended_self_edges(
    df: DataFrame,
    vec_cols_weights: list[tuple[str, float]],
    threshold: float,
    id_col: str = "vec_id",
) -> DataFrame:
    """P13/C16 combo scoring (baseline.py:35-40, combo.py:21-41): the
    pairwise score is a weighted sum of per-column cosine kernels
    (e.g. 0.8 * mention-bigram + 0.2 * context-tfidf), thresholded.
    Same broadcast block-matmul physical strategy as
    cosine_self_edges, one matmul per kernel."""
    spark = df.sparkSession
    _prepare(df)
    mats = []
    ids_ref = None
    for vec_col, _ in vec_cols_weights:
        ids_b, mat_b = _collect_matrix(df, id_col, vec_col)
        ids_ref = ids_b
        mats.append(mat_b)
    bc = spark.sparkContext.broadcast((ids_ref, mats))
    cols = [vc for vc, _ in vec_cols_weights]

    def gen(batches):
        r_ids, r_mats = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sims = None
            for (vec_col, w), r_mat in zip(vec_cols_weights, r_mats):
                a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                n = np.linalg.norm(a, axis=1, keepdims=True)
                n[n == 0.0] = 1.0
                part = w * ((a / n) @ r_mat.T)
                sims = part if sims is None else sims + part
            li, ri = np.nonzero(sims > threshold)
            u = pdf[id_col].to_numpy()[li]
            v = r_ids[ri]
            keep = u < v
            yield pd.DataFrame({"u": u[keep], "v": v[keep], "sim": sims[li, ri][keep]})

    return df.select(id_col, *cols).mapInPandas(gen, "u long, v long, sim double")


def cosine_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k neighbors for each query vector
    (C9 ``cknn`` grinch_alg.py:213-237 generalized to k>1).

    Output: (q long, neighbor long, sim double, rank int). Ties break
    on neighbor id ascending — fully deterministic.
    """
    spark = queries.sparkSession
    _prepare(queries)
    ids_b, mat_b = _collect_matrix(corpus, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids_b, mat_b))

    def gen(batches):
        r_ids, r_mat = bc.value
        order_ids = np.argsort(r_ids, kind="stable")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(a, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            sims = (a / n) @ r_mat.T
            q_ids = pdf[id_col].to_numpy()
            out_q, out_n, out_s, out_r = [], [], [], []
            for qi in range(len(q_ids)):
                row = sims[qi]
                mask = r_ids != q_ids[qi] if exclude_self else np.ones_like(row, bool)
                cand = np.nonzero(mask)[0]
                # sort by (-sim, neighbor id): deterministic ranking
                order = cand[np.lexsort((r_ids[cand], -row[cand]))][:k]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(r_ids[order])
                out_s.extend(row[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"q": out_q, "neighbor": out_n, "sim": out_s, "rank": out_r}
            )

    return queries.select(id_col, vec_col).mapInPandas(
        gen, "q long, neighbor long, sim double, rank int"
    )


def sign_lsh_bucket(vec_col: str, n_bits: int = 8) -> F.Column:
    """Deterministic LSH bucket id from the signs of the first n_bits
    coordinates — the scale path's candidate generator (SQL-expressible
    so the oracle can replay it). bucket in [0, 2^n_bits)."""
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
