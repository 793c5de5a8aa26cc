"""Offline dendrogram cut with recomputed scores (C15, cut_tree.py):
load a dendrogram edge list + leaf embeddings, propagate vector sums
bottom-up, score each internal node as the similarity of its
children's centroids, and emit flat clusters by threshold cut.

The tree is <= 3n rows for n leaves and each row is a few pointers —
the driver-side walk mirrors the reference (cut_tree.py:41-103) and is
the right physical choice at any corpus scale (the EMBEDDINGS stay
distributed; only the edge skeleton is collected). A fully
distributed variant would be iterative join rounds over tree depth.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cut_dendrogram(
    edges: DataFrame,
    leaf_vectors: DataFrame,
    threshold: float,
    id_col: str = "uid",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Returns (uid, cluster_id) for every leaf; cluster_id = lexical
    min leaf uid of the emitted subtree."""
    spark = edges.sparkSession
    edge_rows = edges.select("uid", "parent_uid").collect()
    vec_rows = leaf_vectors.select(id_col, vec_col).collect()
    vecs = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for r in vec_rows}

    parent = {r["uid"]: r["parent_uid"] for r in edge_rows}
    children: dict[str, list[str]] = {}
    for u, p in parent.items():
        if p is not None:
            children.setdefault(p, []).append(u)
    roots = [u for u, p in parent.items() if p is None]

    # bottom-up sums (iterative post-order)
    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}

    def centroid(u):
        c = sums[u] / counts[u]
        if normalize:
            n = np.linalg.norm(c)
            if n > 0:
                c = c / n
        return c

    for root in roots:
        stack = [(root, False)]
        while stack:
            node, expanded = stack.pop()
            ch = children.get(node, [])
            if not ch:
                sums[node] = vecs.get(node, np.zeros(1))
                counts[node] = 1
                continue
            if not expanded:
                stack.append((node, True))
                stack.extend((c, False) for c in ch)
            else:
                sums[node] = np.sum([sums[c] for c in ch], axis=0)
                counts[node] = sum(counts[c] for c in ch)

    def node_score(u):
        ch = children.get(u, [])
        if len(ch) != 2:
            return float("-inf")
        return float(centroid(ch[0]) @ centroid(ch[1]))

    out: list[tuple[str, str]] = []
    for root in roots:
        stack = [root]
        while stack:
            node = stack.pop()
            ch = children.get(node, [])
            if not ch or node_score(node) >= threshold:
                leaves = []
                s2 = [node]
                while s2:
                    cur = s2.pop()
                    cc = children.get(cur, [])
                    if cc:
                        s2.extend(cc)
                    else:
                        leaves.append(cur)
                rep = min(leaves)
                out.extend((l, rep) for l in leaves)
            else:
                stack.extend(ch)
    return spark.createDataFrame(out, "uid string, cluster_id string")
