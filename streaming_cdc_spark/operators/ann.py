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
from pyspark.sql import DataFrame
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
