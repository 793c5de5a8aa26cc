"""Coreference quality metrics as DataFrame aggregations.

Input contract: a *pairs* DataFrame with one row per mention:
(mention long, true_id, pred_id) — the Spark form of the reference's
cluster-pair CSV (nn_thresh.py:192-194, eval_clusters.py:186-195).

MUC   — eval_clusters.py:44-74 (Vilain et al.), incl. the +1e-13
B³    — eval_clusters.py:77-98
CEAF-e— eval_clusters.py:101-144 (phi_4 + Hungarian; contingency is
        aggregated in Spark, the #clusters² matrix solves on the
        driver — small at any data scale)
errors— eval_clusters.py:147-169 (conflated / divided counts)

All heavy work (contingency tables, cluster sizes) is distributed
groupBy aggregation; only #cluster-sized results ever reach the
driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_cdc_spark.metrics.hungarian import linear_sum_assignment

EPS = 1e-13


def contingency(pairs: DataFrame) -> DataFrame:
    """(true_id, pred_id, overlap) — J7, the shared core of every metric."""
    return pairs.groupBy("true_id", "pred_id").agg(F.count("*").alias("overlap"))


def muc_df(pairs: DataFrame) -> DataFrame:
    """One row: (muc_p, muc_r, muc_f1) rounded to 6dp."""
    pstats = pairs.groupBy("pred_id").agg(
        F.count("*").alias("sz"), F.countDistinct("true_id").alias("parts")
    )
    tstats = pairs.groupBy("true_id").agg(
        F.count("*").alias("sz"), F.countDistinct("pred_id").alias("parts")
    )
    p = pstats.agg(
        (F.sum(F.col("sz") - F.col("parts")) / (F.sum(F.col("sz") - 1) + F.lit(EPS))).alias("p")
    )
    r = tstats.agg(
        (F.sum(F.col("sz") - F.col("parts")) / (F.sum(F.col("sz") - 1) + F.lit(EPS))).alias("r")
    )
    return (
        p.crossJoin(r)
        .select(
            F.round("p", 6).alias("muc_p"),
            F.round("r", 6).alias("muc_r"),
            F.round(
                2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r") + F.lit(EPS)), 6
            ).alias("muc_f1"),
        )
    )


def b3_df(pairs: DataFrame) -> DataFrame:
    """One row: (b3_p, b3_r, b3_f1) rounded to 6dp.

    Per-mention ratios collapse onto the contingency table: each of
    the `overlap` mentions in cell (t, p) contributes overlap/|p| to
    precision and overlap/|t| to recall."""
    cont = contingency(pairs)
    tsz = pairs.groupBy("true_id").agg(F.count("*").alias("st"))
    psz = pairs.groupBy("pred_id").agg(F.count("*").alias("sp"))
    total = pairs.count()
    joined = cont.join(tsz, "true_id").join(psz, "pred_id")
    # per-cell quotients are computed in double (deterministic) but
    # ACCUMULATED as decimals — exact addition, so partition order
    # cannot shift the rounded result (oracle determinism rule)
    term_p = (F.col("overlap") * F.col("overlap") / F.col("sp")).cast("decimal(28,12)")
    term_r = (F.col("overlap") * F.col("overlap") / F.col("st")).cast("decimal(28,12)")
    agg = joined.agg(
        (F.sum(term_p).cast("double") / F.lit(total)).alias("p"),
        (F.sum(term_r).cast("double") / F.lit(total)).alias("r"),
    )
    return agg.select(
        F.round("p", 6).alias("b3_p"),
        F.round("r", 6).alias("b3_r"),
        F.round(2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")), 6).alias("b3_f1"),
    )


def ari_df(pairs: DataFrame) -> DataFrame:
    """One row: (ari,) — the Adjusted Rand Index (Hubert & Arabie
    1985) between pred and gold clusterings, rounded to 6dp. Chosen
    over NMI/V-measure as the partition-similarity extension of the
    metric family because it needs NO logarithms: with P = Σ_ij
    n_ij(n_ij-1), A = Σ_i a_i(a_i-1), B = Σ_j b_j(b_j-1), N2 =
    n(n-1) (all EXACT BIGINTs — integer "2·C(·,2)" units),

        ARI = (P - A·B/N2) / ((A+B)/2 - A·B/N2)

    evaluated as ONE fixed-order double expression — the
    exact_moment_corr pattern, engine-identical where ln() is not.
    Degenerate case (every clustering identical to every other —
    denominator 0) returns 1.0 by convention. One contingency
    aggregation + three scalar sums; nothing data-sized leaves the
    executors."""
    cont = contingency(pairs)
    p = cont.agg(
        F.sum(F.col("overlap") * (F.col("overlap") - 1)).cast("long").alias("P")
    )
    a = (
        pairs.groupBy("true_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("A"))
    )
    b = (
        pairs.groupBy("pred_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("B"))
    )
    n = pairs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = p.crossJoin(a).crossJoin(b).crossJoin(n)
    exp = (
        F.col("A").cast("double") * F.col("B").cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    num = F.col("P").cast("double") - exp
    den = (F.col("A") + F.col("B")).cast("double") / F.lit(2.0) - exp
    return s.select(
        F.round(F.when(den == 0, F.lit(1.0)).otherwise(num / den), 6).alias("ari")
    )


def conflation_df(pairs: DataFrame) -> DataFrame:
    """One row: (conflated, divided) error counts (eval_clusters.py:147-169)."""
    conflated = (
        pairs.groupBy("pred_id")
        .agg((F.countDistinct("true_id") - 1).alias("c"))
        .agg(F.sum("c").alias("conflated"))
    )
    divided = (
        pairs.groupBy("true_id")
        .agg((F.countDistinct("pred_id") - 1).alias("d"))
        .agg(F.sum("d").alias("divided"))
    )
    return conflated.crossJoin(divided)


def ceaf_e_df(pairs: DataFrame) -> DataFrame:
    """One row: (ceaf_p, ceaf_r, ceaf_f1) rounded to 6dp.

    Contingency + sizes aggregate in Spark; the dense (n_true, n_pred)
    phi_4 matrix is built on the driver and solved with Hungarian —
    matching the reference's orientation exactly: precision divides by
    #true clusters, recall by #pred (eval_clusters.py:138-140).
    """
    spark = pairs.sparkSession
    cont = contingency(pairs)
    tsz = pairs.groupBy("true_id").agg(F.count("*").alias("st"))
    psz = pairs.groupBy("pred_id").agg(F.count("*").alias("sp"))
    rows = cont.join(tsz, "true_id").join(psz, "pred_id").collect()
    if not rows:
        return spark.createDataFrame(
            [(0.0, 0.0, 0.0)], "ceaf_p double, ceaf_r double, ceaf_f1 double"
        )
    t_ids = sorted({r["true_id"] for r in rows})
    p_ids = sorted({r["pred_id"] for r in rows})
    t_index = {t: i for i, t in enumerate(t_ids)}
    p_index = {p: i for i, p in enumerate(p_ids)}
    scores = np.zeros((len(t_ids), len(p_ids)))
    t_size = {}
    p_size = {}
    for r in rows:
        t_size[r["true_id"]] = r["st"]
        p_size[r["pred_id"]] = r["sp"]
    for r in rows:
        scores[t_index[r["true_id"]], p_index[r["pred_id"]]] = (
            2.0 * r["overlap"] / (t_size[r["true_id"]] + p_size[r["pred_id"]])
        )
    ri, ci = linear_sum_assignment(scores, maximize=True)
    num = float(scores[ri, ci].sum())
    p = num / len(t_ids)
    r = num / len(p_ids)
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return spark.createDataFrame(
        [(round(p, 6), round(r, 6), round(f1, 6))],
        "ceaf_p double, ceaf_r double, ceaf_f1 double",
    )
