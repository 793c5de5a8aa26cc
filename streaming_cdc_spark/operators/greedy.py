"""Exact-replay greedy clustering — parity mode.

Reproduces the reference's order-dependent semantics exactly
(nn_thresh.py:138-152 ``cluster``; strategies nn_thresh.py:27-109:
backwards / diversity / cache / diversity-cache) in numpy, wrapped as
a sorted single-partition ``applyInPandas``. This is intentionally
NOT distributed: the semantics are a sequential fold over the stream
order (SURVEY §2.7-C1/C2). Use operators.clustering.threshold_clusters
(connected components) for the scalable order-independent semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _adjacency(scores: np.ndarray, strategy: str, threshold: float, limit: int | None):
    """Back-fill the boolean adjacency row by row (nn_thresh.py:139-146)."""
    n = scores.shape[0]
    adj = np.zeros((n, n), dtype=bool)
    if strategy == "backwards":
        for i in range(n):
            row = scores[i].copy()
            start = max(0, i - limit) if limit is not None else 0
            mask = np.zeros(n, dtype=bool)
            mask[start : i + 1] = True
            row[~mask] = -1e32
            adj[i] = row > threshold
        return adj

    mask = np.zeros(n, dtype=bool)
    last_seen = np.zeros(n, dtype=np.int64)
    for i in range(n):
        row = scores[i].copy()
        mask[i] = True
        row[~mask] = -1e32
        out = row > threshold
        if strategy in ("cache", "diversity-cache"):
            last_seen[out] = i
        if limit is not None and mask.sum() == limit:
            if strategy == "diversity":
                removal = int(np.argmax(row[:i]))
            elif strategy == "cache":
                removal = int(np.argmin(last_seen[:i]))
                last_seen[removal] = int(1e13)
            else:  # diversity-cache (nn_thresh.py:81-101)
                if out[:i].any():
                    removal = int(np.argmax(row[:i]))
                else:
                    removal = int(np.argmin(last_seen[:i]))
                last_seen[removal] = int(1e13)
            mask[removal] = False
        adj[i] = out
    return adj


def greedy_cluster_numpy(
    embeddings: np.ndarray,
    threshold: float,
    strategy: str = "backwards",
    limit: int | None = None,
    normalize: bool = True,
) -> np.ndarray:
    """Reference-exact greedy clustering over a (n, d) float matrix.

    Returns int cluster ids (nn_thresh.py:147-152: ids propagate
    forward through the transposed adjacency in index order).
    """
    e = embeddings.astype(np.float64)
    if normalize:
        norms = np.linalg.norm(e, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        e = e / norms
    scores = e @ e.T
    adj = _adjacency(scores, strategy, threshold, limit)
    n = scores.shape[0]
    clusters = np.arange(n)
    for i in range(n):
        clusters[adj[:, i]] = clusters[i]
    return clusters


def greedy_clusters(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "backwards",
    limit: int | None = None,
) -> DataFrame:
    """Spark wrapper: sorts by id (stream order), folds in one group.

    Output: (id_col long, cluster_id long) where cluster_id is the id
    of the cluster-defining row (stable across runs).
    """

    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.stack(pdf[vec_col].to_numpy())
        labels = greedy_cluster_numpy(mat, threshold, strategy=strategy, limit=limit)
        return pd.DataFrame(
            {id_col: pdf[id_col], "cluster_id": pdf[id_col].to_numpy()[labels]}
        )

    return (
        df.select(id_col, vec_col)
        .withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fold, f"{id_col} long, cluster_id long")
    )
