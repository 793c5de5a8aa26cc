"""Dendrogram purity (A10, dendrogram_purity.py:64-84) as a
DISTRIBUTED DataFrame computation.

The reference does a bottom-up histogram merge on a driver-side tree.
Here the per-node label histograms come from an ancestor closure
(computed by pointer doubling: log(depth) self-joins) joined to leaf
labels — every step is a groupBy/join, so a dendrogram with billions
of leaves still computes purity without collecting the tree.

purity = (1 / p*) * sum over internal nodes n, labels k of
         h_left(n,k) * h_right(n,k) * h(n,k) / leaves(n)
with p* = sum_k C(total_k, 2)   (binary trees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """(uid, anc) for every proper ancestor, via pointer doubling:
    R <- R ∪ (R ∘ R), so a depth-d tree closes in ceil(log2 d) rounds."""
    reach = (
        edges.filter(F.col("parent_uid").isNotNull())
        .select(F.col("uid"), F.col("parent_uid").alias("anc"))
        .localCheckpoint()
    )
    # ONE job per doubling round (optimization r9): the count that
    # checks the fixed point is also the action that materializes the
    # lazy checkpoint, and the previous round's size is carried in a
    # variable instead of re-counting the already-checkpointed frame
    # at the top of each round (3 jobs/round -> 1).
    n_before = reach.count()
    for _ in range(max_rounds):
        hopped = (
            reach.alias("r1")
            .join(reach.alias("r2"), F.col("r1.anc") == F.col("r2.uid"))
            .select(F.col("r1.uid").alias("uid"), F.col("r2.anc").alias("anc"))
        )
        reach = reach.union(hopped).distinct().localCheckpoint(eager=False)
        n_now = reach.count()
        if n_now == n_before:
            break
        n_before = n_now
    return reach


def node_histograms(edges: DataFrame) -> DataFrame:
    """(node, label, h): label counts over each node's leaf
    descendants (a leaf counts itself)."""
    leaves = edges.filter(F.col("label").isNotNull()).select(
        F.col("uid").alias("leaf"), "label"
    )
    closure = ancestor_closure(edges).select(
        F.col("uid").alias("leaf"), F.col("anc").alias("node")
    )
    self_rows = leaves.select(F.col("leaf"), F.col("leaf").alias("node"), "label")
    up_rows = closure.join(leaves, "leaf").select("leaf", "node", "label")
    return (
        self_rows.unionByName(up_rows)
        .groupBy("node", "label")
        .agg(F.count("*").alias("h"))
    )


def _node_contributions(edges: DataFrame) -> DataFrame:
    """(node, c): each internal node-label pair's purity summand
    h_left * h_right * h / leaves — the shared core of the global and
    per-key purity forms."""
    hist = node_histograms(edges).persist()
    child_edges = edges.filter(F.col("parent_uid").isNotNull()).select(
        F.col("uid").alias("child"), F.col("parent_uid").alias("node")
    )
    # per (parent, label): product of the two children's counts —
    # only when BOTH children carry the label
    child_hist = child_edges.join(
        hist.withColumnRenamed("node", "child"), "child"
    )
    pair_products = (
        child_hist.groupBy("node", "label")
        .agg(F.count("*").alias("n_children_with"), F.product("h").alias("pair_product"))
        .filter(F.col("n_children_with") == 2)
    )
    leaves_per_node = hist.groupBy("node").agg(F.sum("h").alias("n_leaves"))
    contrib = (
        pair_products.join(hist, ["node", "label"])
        .join(leaves_per_node, "node")
        .select(
            "node",
            (F.col("pair_product") * F.col("h") / F.col("n_leaves")).alias("c"),
        )
    )
    hist.unpersist()
    return contrib


def dendrogram_purity_df(edges: DataFrame) -> DataFrame:
    """One row: (purity double). Golden: the reference's 7-node
    fixture tree scores exactly 0.75 (dendrogram_purity_test.py)."""
    summand = _node_contributions(edges).agg(
        F.coalesce(F.sum("c"), F.lit(0.0)).alias("s")
    )
    totals = (
        edges.filter(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count("*").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("p_star"))
    )
    return summand.crossJoin(totals).select(
        F.round(F.col("s") / F.col("p_star"), 6).alias("purity")
    )


def dendrogram_purity_per_key(edges: DataFrame, key_col: str = "key") -> DataFrame:
    """(key, purity) for a FOREST: edges carry ``key_col`` naming the
    tree each node belongs to (grinch_per_key output). Node ids are
    prefixed with the key so the one shared closure/histogram pass
    stays within each tree even when uids collide across keys, then
    the summand and the p* pair total aggregate per key instead of
    globally. Keys must not contain '|'. Keys whose tree has no
    same-label sibling pair score 0.0 (p* > 0 assumed: >=2 leaves of
    some label per key)."""
    k = F.col(key_col).cast("string")
    pref = edges.select(
        F.concat_ws("|", k, F.col("uid")).alias("uid"),
        F.when(
            F.col("parent_uid").isNotNull(), F.concat_ws("|", k, F.col("parent_uid"))
        ).alias("parent_uid"),
        "label",
    )
    per_key_s = (
        _node_contributions(pref)
        .withColumn("key", F.substring_index("node", "|", 1))
        .groupBy("key")
        .agg(F.sum("c").alias("s"))
    )
    totals = (
        pref.filter(F.col("label").isNotNull())
        .withColumn("key", F.substring_index("uid", "|", 1))
        .groupBy("key", "label")
        .agg(F.count("*").alias("t"))
        .groupBy("key")
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("p_star"))
    )
    return totals.join(per_key_s, "key", "left").select(
        "key",
        F.round(F.coalesce(F.col("s"), F.lit(0.0)) / F.col("p_star"), 6).alias(
            "purity"
        ),
    )
