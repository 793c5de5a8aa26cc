"""IVF (inverted-file) approximate nearest neighbor search — the
scale path for similarity search over embedding columns
(BASELINE.json north_star; complements the sign-LSH bucket path).

Index = seeded MLlib KMeans over the corpus: each vector is assigned
to its nearest centroid (one "cell"). A query probes only the
``n_probe`` nearest cells and exact-re-ranks candidates — corpus
scans drop from O(n) to O(n * n_probe / k) per query. Centroids are
a tiny broadcast; cell assignment is a shuffle-free map; the probe is
an equi-join on cell id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_ivf_index(
    corpus: DataFrame,
    k: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Returns (assigned corpus with a `cell` column, centroid matrix).
    Deterministic for a fixed seed + input."""
    prepped = corpus.withColumn("_v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=k, seed=seed, featuresCol="_v", predictionCol="cell")
    model = km.fit(prepped)
    assigned = model.transform(prepped).drop("_v")
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_top_k(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells per query, exact cosine re-rank
    within candidates. Output: (q, neighbor, sim, rank) — rank ties
    break on neighbor id."""
    from streaming_cdc_spark.session import ensure_package_on_executors

    spark = queries.sparkSession
    ensure_package_on_executors(spark)
    cent = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast(cent)

    def probe_cells(batches):
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(a, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            sims = (a / n) @ c.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            out_q, out_vec, out_cell = [], [], []
            for i in range(len(pdf)):
                for cell in order[i]:
                    out_q.append(pdf[id_col].iloc[i])
                    out_vec.append(pdf[vec_col].iloc[i])
                    out_cell.append(int(cell))
            yield pd.DataFrame({"q": out_q, "q_vec": out_vec, "cell": out_cell})

    from streaming_cdc_spark.session import fan_out

    probes = fan_out(queries.select(id_col, vec_col)).mapInPandas(
        probe_cells, f"q long, q_vec array<double>, cell int"
    )
    cand = probes.join(
        assigned_corpus.select(
            F.col(id_col).alias("neighbor"), F.col(vec_col).alias("n_vec"), "cell"
        ),
        "cell",
    ).filter(F.col("q") != F.col("neighbor"))
    from streaming_cdc_spark.functions.vectors import as_double, cosine

    scored = cand.withColumn("sim", cosine(as_double("q_vec"), as_double("n_vec")))
    from pyspark.sql import Window as W

    w = W.partitionBy("q").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "neighbor", F.round("sim", 6).alias("sim"), "rank")
    )


def collect_seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic seeds: the k lowest-id vectors, collected to the
    driver. Centroid sets are driver-sized by construction in Lloyd's
    (MLlib holds them on the driver too) — k rows, not data-sized."""
    rows = df.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def nearest_centroid(
    vec_col: str | Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """struct(dist, cid) of the nearest centroid by L2, ties to the
    smaller centroid id — as ONE shuffle-free expression: the centroid
    set is inlined as literals (the Lloyd's-assignment analogue of a
    broadcast join, minus the 8x row expansion and the argmin window).
    Struct comparison is lexicographic, so array_min implements
    (min dist, then min cid) exactly."""
    from streaming_cdc_spark.functions.vectors import as_double, l2_distance

    v = as_double(vec_col)
    return F.array_min(
        F.array(
            *[
                F.struct(l2_distance(v, _lit_vec(c)).alias("dist"), F.lit(cid).cast("long").alias("cid"))
                for cid, c in centroids
            ]
        )
    )


def centroid_ranking(
    vec_col: str | Column, centroids: list[tuple[int, list[float]]], n_probe: int
) -> Column:
    """Array of the n_probe nearest centroid ids (L2, ties to smaller
    cid) — the IVF probe list, again as one shuffle-free expression
    over inlined centroids."""
    from streaming_cdc_spark.functions.vectors import as_double, l2_distance

    v = as_double(vec_col)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(l2_distance(v, _lit_vec(c)).alias("dist"), F.lit(cid).cast("long").alias("cid"))
                for cid, c in centroids
            ]
        )
    )
    return F.slice(ranked, 1, n_probe).getField("cid")


def semantic_dedup_flags(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cells
    bound the candidate set, then embedding-cosine near-dups above
    ``tau`` are dropped WITHIN each cell only — the O(n^2) pairwise
    scan becomes k independent O((n/k)^2) cell scans, the property
    that makes embedding dedup tractable at corpus scale.

    Deterministic keep rule: a vector is dropped iff some same-cell
    vector with a SMALLER id is within tau (greedy min-id keep, the
    same rule as resolve_near_dups). Returns (id_col, cid, dropped).

    Physical plan: assignment is a shuffle-free literal-centroid map
    (nearest_centroid); candidates are an equi-join on cell id. Scale
    knob is k: grow it with the corpus so cells stay bounded (SemDeDup
    uses n/k ~ 10^4 at 10^9 docs); skewed cells fall to AQE skew-join.
    """
    from streaming_cdc_spark.functions.vectors import as_double, cosine

    best = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_v"),
        nearest_centroid(vec_col, centroids).getField("cid").alias("cid"),
    )
    a = best.select(F.col("cid"), F.col("_id").alias("_u"), F.col("_v").alias("_va"))
    b = best.select(F.col("cid"), F.col("_id").alias("_w"), F.col("_v").alias("_vb"))
    dropped = (
        a.join(b, "cid")
        .filter(F.col("_u") < F.col("_w"))
        .filter(cosine(as_double("_va"), as_double("_vb")) > F.lit(tau))
        .select(F.col("_w").alias("_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return best.join(dropped, "_id", "left").select(
        F.col("_id").alias(id_col),
        "cid",
        F.coalesce("_dropped", F.lit(False)).alias("dropped"),
    )


def semantic_dedup_flags_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """semantic_dedup_flags with the per-cell scan as an Arrow-batched
    numpy matmul (applyInPandas per cell) instead of a per-pair
    Catalyst fold — identical flags, ~20x less CPU per candidate at
    corpus scale. Cell size is the task-memory bound: grow k with the
    corpus (SemDeDup uses n/k ~ 1e4); AQE skew-join handles hot cells.
    """
    from streaming_cdc_spark.session import ensure_package_on_executors, fan_out

    ensure_package_on_executors(df.sparkSession)
    best = fan_out(df).select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_v"),
        nearest_centroid(vec_col, centroids).getField("cid").alias("cid"),
    )

    def score(key, pdf):
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = (mat / norms) @ (mat / norms).T
        # dropped(j) = exists i<j (id-sorted) with sim > tau
        upper = np.triu(sims > tau, k=1)
        dropped = upper.any(axis=0)
        return pd.DataFrame(
            {"vec_id": ids, "cid": int(key[0]), "dropped": dropped}
        )

    out = best.groupBy("cid").applyInPandas(score, "vec_id long, cid long, dropped boolean")
    return out.withColumnRenamed("vec_id", id_col)


def ivf_exact_top_k(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF top-k, fully distributed: every vector probes
    its n_probe nearest cells (literal-centroid ranking), each cell
    scores its (probes x members) block with ONE numpy matmul and
    emits the per-cell top-k (cogroup applyInPandas); a final window
    keeps the global top-k of the <= n_probe*k survivors per query.
    Candidate volume n^2*n_probe/k_cells never materializes — only
    per-cell top-k rows (n * n_probe * k) reach the shuffle."""
    from pyspark.sql import Window as W

    from streaming_cdc_spark.session import ensure_package_on_executors, fan_out

    ensure_package_on_executors(df.sparkSession)
    probes = fan_out(df).select(
        F.col(id_col).cast("long").alias("q"),
        F.col(vec_col).alias("qv"),
        F.explode(centroid_ranking(vec_col, centroids, n_probe)).alias("cid"),
    )
    corpus = fan_out(df).select(
        F.col(id_col).cast("long").alias("neighbor"),
        F.col(vec_col).alias("nv"),
        nearest_centroid(vec_col, centroids).getField("cid").alias("cid"),
    )

    def _norm(col):
        mat = np.stack(col.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return mat / norms

    def score(key, left, right):
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"q": [], "neighbor": [], "sim": []}).astype(
                {"q": "int64", "neighbor": "int64", "sim": "float64"}
            )
        q_ids = left["q"].to_numpy()
        n_ids = right["neighbor"].to_numpy()
        sims = _norm(left["qv"]) @ _norm(right["nv"]).T
        out_q, out_n, out_s = [], [], []
        for i in range(len(q_ids)):
            row = sims[i]
            mask = n_ids != q_ids[i]
            cand = np.nonzero(mask)[0]
            top = cand[np.lexsort((n_ids[cand], -row[cand]))][:k]
            out_q.extend([q_ids[i]] * len(top))
            out_n.extend(n_ids[top])
            out_s.extend(row[top])
        return pd.DataFrame({"q": out_q, "neighbor": out_n, "sim": out_s})

    cand = (
        probes.groupBy("cid")
        .cogroup(corpus.groupBy("cid"))
        .applyInPandas(score, "q long, neighbor long, sim double")
    )
    w = W.partitionBy("q").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "neighbor", "rank", F.round("sim", 6).alias("sim_r"))
    )
