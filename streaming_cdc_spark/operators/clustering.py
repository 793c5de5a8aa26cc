"""Distributed clustering operators.

The reference's greedy threshold clustering (nn_thresh.py:138-152,
baseline.py:64-69) is order-dependent; its order-independent core is
"mentions linked by a similarity edge end in the same cluster" —
i.e. connected components of the threshold graph. We implement CC as
the scalable semantics (documented equivalence: identical partitions
whenever the greedy pass links transitively, which holds for the
`backwards` strategy with no window limit), and keep the exact
sequential replay in operators/greedy.py for parity mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_cdc_spark.operators.similarity import cosine_self_edges


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "v",
    max_iter: int = 50,
) -> DataFrame:
    """Min-label propagation with pointer jumping.

    vertices: DataFrame with ``id_col``; edges: DataFrame (u, v).
    Returns (id_col, cluster_id) where cluster_id = min vertex id in
    the component — deterministic.

    Scale notes: each round is two shuffles (neighbor-min join +
    pointer-jump join) over (vertex, label) pairs; pointer jumping
    gives O(log n) rounds instead of O(diameter). localCheckpoint
    truncates lineage so plans stay flat. AQE handles skew from giant
    components.
    """
    sym = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .union(edges.select(F.col("v").cast("long").alias("u"), F.col("u").cast("long").alias("v")))
        .distinct()
        .persist()
    )
    lbl = vertices.select(
        F.col(id_col).cast("long").alias("v"), F.col(id_col).cast("long").alias("l")
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            sym.join(lbl.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.min("l").alias("nl"))
        )
        stepped = lbl.join(nbr_min, "v", "left").select(
            "v", F.least(F.col("l"), F.coalesce("nl", "l")).alias("l")
        )
        # pointer jump: l(v) <- l(l(v))
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(F.col("v").alias("l"), F.col("l").alias("l2")).alias("b"),
                "l",
                "left",
            )
            .select(F.col("v"), F.least(F.col("l"), F.coalesce("l2", "l")).alias("l"))
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(lbl.alias("o"), "v")
            .filter(F.col("n.l") != F.col("o.l"))
            .limit(1)
            .count()
        )
        lbl = jumped
        if changed == 0:
            break
    sym.unpersist()
    return lbl.select(F.col("v").alias(id_col), F.col("l").alias("cluster_id"))


def threshold_clusters(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-threshold clustering: similarity edges -> connected
    components. Returns (id_col, cluster_id)."""
    edges = cosine_self_edges(df, threshold, id_col=id_col, vec_col=vec_col)
    return connected_components(df.select(id_col), edges.select("u", "v"), id_col=id_col)


def find_threshold(
    df: DataFrame,
    target: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iters: int = 30,
    epsilon: float | None = None,
) -> tuple[float, DataFrame]:
    """C7 bisection (nn_thresh.py:118-135): binary-search the cosine
    threshold until the cluster count is within epsilon of target.
    Driver loop; each iteration re-filters the cached scored edges and
    re-runs CC — the scores are computed once.
    """
    n = df.count()
    if epsilon is None:
        epsilon = n / 1000.0
    scored = cosine_self_edges(df, threshold=-1.0, id_col=id_col, vec_col=vec_col).persist()
    vertices = df.select(id_col)
    lo, hi = 0.0, 1.0
    best = None
    threshold = 0.5
    for _ in range(max_iters):
        threshold = (lo + hi) / 2
        clusters = connected_components(
            vertices, scored.filter(F.col("sim") >= threshold), id_col=id_col
        )
        n_clusters = clusters.select(F.countDistinct("cluster_id")).first()[0]
        best = (threshold, clusters)
        if abs(n_clusters - target) <= epsilon:
            break
        if n_clusters < target:
            lo = threshold
        else:
            hi = threshold
    scored.unpersist()
    return best
