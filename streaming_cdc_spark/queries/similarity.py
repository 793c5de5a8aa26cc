"""Similarity-search queries over `embeddings` (training-data
extensions): brute-force cosine top-k baseline and the sign-LSH
bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.functions.vectors import as_double, cosine, l2_norm
from streaming_cdc_spark.operators.similarity import cosine_top_k, sign_lsh_bucket
from streaming_cdc_spark.queries.registry import query
from streaming_cdc_spark.tables import load

_COS = (
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
)

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
)


@query(
    "cosine_topk",
    oracle=f"""
    SELECT q, neighbor, sim_r, rank FROM (
        SELECT a.vec_id AS q, b.vec_id AS neighbor,
               ROUND({_COS}, 6) AS sim_r,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id < 16 AND b.vec_id <> a.vec_id
    ) WHERE rank <= 5
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors (vec_id < 16):
    broadcast block-matmul, deterministic (sim desc, id asc) ranking."""
    emb = load(spark, sf_dir, "embeddings")
    out = cosine_top_k(emb.filter(F.col("vec_id") < 16), emb, k=5)
    return out.select("q", "neighbor", F.round("sim", 6).alias("sim_r"), "rank")


@query(
    "lsh_bucket_pairs",
    oracle=f"""
    WITH bucketed AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings)
    SELECT a.vec_id AS u, b.vec_id AS v, ROUND({_COS}, 6) AS sim_r
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS} >= 0.2
    """,
)
def lsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale path: sign-LSH bucket (8 hyperplanes = first 8
    coordinate signs) -> bucket equi-join -> exact re-score of
    candidates with the JVM-side cosine expression. Candidate count is
    ~n²/2^bits instead of n²."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", sign_lsh_bucket("embedding", 8)
    )
    a = emb.select(F.col("vec_id").alias("u"), F.col("embedding").alias("ea"), "bucket")
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"), "bucket")
    sim = cosine(as_double("ea"), as_double("eb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("u") < F.col("v"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.2)
        .select("u", "v", F.round("sim", 6).alias("sim_r"))
    )


@query("ivf_topk")  # seeded KMeans index; rows-only check
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path: seeded KMeans cells -> probe 4 of 16 cells
    per query -> exact cosine re-rank (operators/ann.py). Corpus
    scanned per query drops to ~n_probe/k of brute force."""
    from streaming_cdc_spark.operators.ann import fit_ivf_index, ivf_top_k

    emb = load(spark, sf_dir, "embeddings")
    assigned, centroids = fit_ivf_index(emb, k=16, seed=42)
    queries_df = emb.filter(F.col("vec_id") < 16)
    return ivf_top_k(queries_df, assigned, centroids, k=5, n_probe=4)


@query(
    "embedding_norm_stats",
    oracle="""
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 4) AS avg_norm,
           ROUND(MIN(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 6) AS min_norm,
           ROUND(MAX(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 6) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/P11 surface: per-label L2-norm statistics via the codegen'd
    vector expressions."""
    emb = load(spark, sf_dir, "embeddings")
    norm = l2_norm(as_double("embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        # decimal-first sum: exact accumulation, so partition order
        # cannot shift the rounded result (oracle determinism rule)
        F.round(
            F.sum(norm.cast("decimal(28,12)")).cast("double") / F.count("*"), 4
        ).alias("avg_norm"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


@query(
    "kmeans_assign",
    oracle="""
    WITH cent AS (SELECT vec_id AS cid, embedding AS c
                  FROM embeddings ORDER BY vec_id LIMIT 8),
    d AS (SELECT e.vec_id, cent.cid,
                 list_distance(CAST(e.embedding AS DOUBLE[]), CAST(cent.c AS DOUBLE[])) AS dist
          FROM embeddings e CROSS JOIN cent),
    best AS (SELECT vec_id, cid, dist,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
             FROM d)
    SELECT cid, COUNT(*) AS n_assigned,
           ROUND(CAST(SUM(CAST(dist AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 4) AS avg_dist
    FROM best WHERE rn = 1 GROUP BY cid
    """,
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd's assignment step with deterministic
    seeds (the 8 lowest-id vectors as centroids, broadcast): each
    vector goes to its nearest centroid by L2 distance, ties to the
    smaller centroid id. The per-cluster shape of the iteration MLlib
    KMeans runs (the IVF index builder uses the MLlib version; this
    is the exact-oracle twin). Output: cluster sizes + decimal-summed
    mean distance. Physical form: the k centroids are inlined as
    literal arrays (centroid sets are driver-sized by construction in
    Lloyd's), so assignment is one shuffle-free map — no k-times
    crossJoin row expansion, no argmin window shuffle; the only
    shuffle left is the final 8-group aggregate."""
    from streaming_cdc_spark.operators.ann import collect_seed_centroids, nearest_centroid

    emb = load(spark, sf_dir, "embeddings")
    cents = collect_seed_centroids(emb, 8)
    best = emb.select(nearest_centroid("embedding", cents).alias("b")).select(
        F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist")
    )
    return best.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.round(
            F.sum(F.col("dist").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_dist"),
    )


@query(
    "embedding_quantization",
    oracle="""
    WITH s AS (
        SELECT label,
               greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-12) / 127.0 AS scale,
               CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ),
    err AS (
        SELECT label,
               list_max(list_transform(e, x -> abs(x - floor(x / scale + 0.5) * scale))) AS max_err
        FROM s
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(max_err AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*), 6) AS avg_max_err,
           ROUND(MAX(max_err), 6) AS worst_err
    FROM err GROUP BY label
    """,
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric scalar quantization quality per label: the
    compression step a billion-vector ANN index applies (4x memory
    cut); reconstruction error bounded by scale/2, verified exactly
    against the SQL twin. Floor-based half-up rounding keeps both
    engines bit-identical."""
    from streaming_cdc_spark.functions.vectors import as_double, quant_abs_error, quant_scale

    emb = load(spark, sf_dir, "embeddings")
    e = as_double("embedding")
    # materialize the scale as a column FIRST: expressions inside
    # transform() lambdas re-evaluate per element, so an inline
    # array_max-based scale would cost O(d^2) per vector
    err = emb.withColumn("_scale", quant_scale(e)).select(
        "label", quant_abs_error(e, F.col("_scale")).alias("max_err")
    )
    return err.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.col("max_err").cast("decimal(28,14)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_max_err"),
        F.round(F.max("max_err"), 6).alias("worst_err"),
    )


_PROBES_SQL = "[bucket" + "".join(f", xor(bucket, {1 << i})" for i in range(8)) + "]"


@query(
    "lsh_multiprobe_pairs",
    oracle=f"""
    WITH bucketed AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
    probing AS (SELECT vec_id, embedding, UNNEST({_PROBES_SQL}) AS probe FROM bucketed)
    SELECT a.vec_id AS u, b.vec_id AS v, ROUND({_COS}, 6) AS sim_r
    FROM probing a JOIN bucketed b ON a.probe = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS} >= 0.2
    """,
)
def lsh_multiprobe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH: each vector probes its own bucket plus
    all Hamming-1 buckets (9 probes at 8 bits), recovering near-miss
    candidates without extra hash tables; candidates are exact
    re-scored. Still an equi-join — candidate volume is
    (n_bits+1) * n^2 / 2^bits."""
    from streaming_cdc_spark.operators.similarity import sign_lsh_probes

    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("u"),
        F.col("embedding").alias("ea"),
        F.explode(sign_lsh_probes("embedding", 8)).alias("bucket"),
    )
    b = emb.select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("eb"),
        sign_lsh_bucket("embedding", 8).alias("bucket"),
    )
    sim = cosine(as_double("ea"), as_double("eb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("u") < F.col("v"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.2)
        .select("u", "v", F.round("sim", 6).alias("sim_r"))
    )


@query(
    "kmeans_update",
    oracle="""
    WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
                  FROM embeddings ORDER BY vec_id LIMIT 8),
    d AS (SELECT e.vec_id, cent.cid, CAST(e.embedding AS DOUBLE[]) AS ev,
                 list_distance(CAST(e.embedding AS DOUBLE[]), cent.c) AS dist
          FROM embeddings e CROSS JOIN cent),
    best AS (SELECT vec_id, cid, ev FROM (
        SELECT vec_id, cid, ev,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d) WHERE rn = 1),
    pos AS (SELECT cid, i AS pos, ev[i + 1] AS val
            FROM best, UNNEST(range(0, len(ev))) AS u(i)),
    newc AS (SELECT cid, pos,
                    CAST(SUM(CAST(val AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS new_val
             FROM pos GROUP BY cid, pos),
    oldp AS (SELECT cid, i AS pos, c[i + 1] AS old_val
             FROM cent, UNNEST(range(0, len(c))) AS u(i)),
    shift AS (SELECT cid,
                     ROUND(sqrt(CAST(SUM(CAST((new_val - old_val) * (new_val - old_val) AS DECIMAL(38,20))) AS DOUBLE)), 6) AS shift
              FROM newc JOIN oldp USING (cid, pos) GROUP BY cid),
    counts AS (SELECT cid, COUNT(*) AS n_assigned FROM best GROUP BY cid)
    SELECT cid, n_assigned, shift FROM counts JOIN shift USING (cid)
    """,
)
def kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full distributed Lloyd's iteration: assignment (as in
    kmeans_assign) followed by the centroid UPDATE — per-position
    means via exact decimal sums (order-free across partitions, the
    only way a float mean hash-matches), reported as each centroid's
    L2 shift. This is the update MLlib runs internally, here with an
    exact cross-engine oracle. Assignment uses the same shuffle-free
    literal-centroid argmin as kmeans_assign."""
    from streaming_cdc_spark.functions.vectors import as_double
    from streaming_cdc_spark.operators.ann import collect_seed_centroids, nearest_centroid

    emb = load(spark, sf_dir, "embeddings")
    cents = collect_seed_centroids(emb, 8)
    spark_cent = spark.createDataFrame(
        [(cid, c) for cid, c in cents], "cid long, c array<double>"
    )
    best = emb.select(
        "vec_id",
        "embedding",
        nearest_centroid("embedding", cents).getField("cid").alias("cid"),
    )
    pos = best.select("cid", F.posexplode(as_double("embedding")).alias("pos", "val"))
    newc = pos.groupBy("cid", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(28,14)")).cast("double")
            / F.count(F.lit(1))
        ).alias("new_val")
    )
    oldp = spark_cent.select("cid", F.posexplode("c").alias("pos", "old_val"))
    dd = (F.col("new_val") - F.col("old_val")) * (F.col("new_val") - F.col("old_val"))
    shift = (
        newc.join(oldp, ["cid", "pos"])
        .groupBy("cid")
        .agg(F.round(F.sqrt(F.sum(dd.cast("decimal(38,20)")).cast("double")), 6).alias("shift"))
    )
    counts = best.groupBy("cid").agg(F.count(F.lit(1)).alias("n_assigned"))
    return counts.join(shift, "cid")


_ASSIGN_CTE = """
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
             FROM embeddings ORDER BY vec_id LIMIT 8),
    dists AS (SELECT e.vec_id, cent.cid, CAST(e.embedding AS DOUBLE[]) AS ev,
                     list_distance(CAST(e.embedding AS DOUBLE[]), cent.c) AS dist
              FROM embeddings e CROSS JOIN cent),
    assigned AS (SELECT vec_id, cid, ev FROM (
        SELECT vec_id, cid, ev,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM dists) WHERE rn = 1)
"""


@query(
    "semantic_dedup",
    oracle=f"""
    WITH {_ASSIGN_CTE},
    drops AS (SELECT DISTINCT b.vec_id
              FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.ev, b.ev) > 0.35),
    flags AS (SELECT s.cid, CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS dr
              FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id)
    SELECT cid, COUNT(*) AS n_vecs,
           CAST(SUM(dr) AS BIGINT) AS n_dropped,
           COUNT(*) - CAST(SUM(dr) AS BIGINT) AS n_kept
    FROM flags GROUP BY cid
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells bound the
    embedding-cosine dedup candidate set — pairwise scans run WITHIN
    cells only, turning O(n^2) into k * O((n/k)^2). Drop rule: any
    vector with a smaller-id same-cell neighbor above tau=0.35 (margin
    to the closest pair sim is 8.4e-5 at sf0.01). Output: per-cell
    totals. Assignment is the shuffle-free literal-centroid argmin;
    each cell scores itself with one Arrow-batched numpy matmul
    (applyInPandas) — the candidate pair set never materializes as
    rows."""
    from streaming_cdc_spark.operators.ann import (
        collect_seed_centroids,
        semantic_dedup_flags_cells,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = collect_seed_centroids(emb, 8)
    flags = semantic_dedup_flags_cells(emb, cents, tau=0.35)
    return flags.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("dropped").cast("int")).cast("long").alias("n_dropped"),
        (F.count(F.lit(1)) - F.sum(F.col("dropped").cast("int")).cast("long")).alias("n_kept"),
    )


@query(
    "ivf_topk_exact",
    oracle=f"""
    WITH {_ASSIGN_CTE},
    probes AS (SELECT vec_id AS q, cid, ev FROM (
        SELECT vec_id, cid, ev,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM dists) WHERE rn <= 2),
    cand AS (SELECT p.q, c.vec_id AS neighbor,
                    list_cosine_similarity(p.ev, c.ev) AS sim
             FROM probes p JOIN assigned c ON p.cid = c.cid AND p.q <> c.vec_id)
    SELECT q, neighbor, rank, sim_r FROM (
        SELECT q, neighbor, ROUND(sim, 6) AS sim_r,
               ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, neighbor) AS rank
        FROM cand) WHERE rank <= 3
    """,
)
def ivf_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a deterministic index (8 lowest-id seed
    centroids), SQL-replayable end to end: every vector probes its 2
    nearest cells (centroid_ranking — shuffle-free literal-centroid
    expression), candidates are an equi-join on cell id, exact cosine
    re-rank keeps top-3. The MLlib-KMeans variant (ivf_topk) remains
    the production index builder; this twin pins the probe/re-rank
    machinery with a full value-hash oracle. Min adjacent-sim gap in
    the top-4 is 1.8e-5 at sf0.01 — rank order cannot flip from
    cross-engine float drift. Physical form: per-cell (probes x
    members) numpy matmul via cogroup applyInPandas emitting only the
    per-cell top-k; a final window ranks <= n_probe*k rows per query,
    so the n^2*n_probe/k candidate volume never becomes rows."""
    from streaming_cdc_spark.operators.ann import collect_seed_centroids, ivf_exact_top_k

    emb = load(spark, sf_dir, "embeddings")
    cents = collect_seed_centroids(emb, 8)
    return ivf_exact_top_k(emb, cents, k=3, n_probe=2)


_ASSIGN_INC_CTE = """
    cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
             FROM embeddings WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8),
    dists AS (SELECT e.vec_id, cent.cid, CAST(e.embedding AS DOUBLE[]) AS ev,
                     list_distance(CAST(e.embedding AS DOUBLE[]), cent.c) AS dist
              FROM embeddings e CROSS JOIN cent),
    assigned AS (SELECT vec_id, cid, ev, vec_id % 2 AS side FROM (
        SELECT vec_id, cid, ev,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM dists) WHERE rn = 1)
"""


@query(
    "incremental_semantic_status",
    oracle=f"""
    WITH {_ASSIGN_INC_CTE},
    hits AS (SELECT n.vec_id,
                    MAX(CASE WHEN p.side = 0 THEN 1 ELSE 0 END) AS best
             FROM assigned n JOIN assigned p
               ON n.cid = p.cid AND n.side = 1
              AND (p.side = 0 OR (p.side = 1 AND p.vec_id < n.vec_id))
             WHERE list_cosine_similarity(n.ev, p.ev) > 0.35
             GROUP BY n.vec_id),
    st AS (SELECT a.cid,
                  CASE WHEN h.best = 1 THEN 'dup_of_corpus'
                       WHEN h.best = 0 THEN 'dup_in_batch'
                       ELSE 'fresh' END AS status
           FROM assigned a LEFT JOIN hits h ON h.vec_id = a.vec_id
           WHERE a.side = 1)
    SELECT cid, status, COUNT(*) AS n_vecs
    FROM st GROUP BY cid, status
    """,
)
def incremental_semantic_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup: a new embedding batch (odd vec_ids)
    deduped against the existing corpus (even ids) and its own
    smaller-id vectors, using the CORPUS's cell index (8 lowest-id
    corpus seeds) — corpus cells are probed, never re-scanned against
    themselves. Per (cell, status) counts; the oracle replays
    assignment, side-filtered pairing, and status priority
    (dup_of_corpus beats dup_in_batch). tau=0.35 with a measured
    4.8e-4 margin to the closest compared-pair sim at sf0.01 —
    cross-engine float drift cannot flip a comparison."""
    from streaming_cdc_spark.operators.ann import (
        collect_seed_centroids,
        incremental_semantic_dedup_cells,
    )

    emb = load(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    cents = collect_seed_centroids(old, 8)
    st = incremental_semantic_dedup_cells(old, new, cents, tau=0.35)
    return st.groupBy("cid", "status").agg(F.count(F.lit(1)).alias("n_vecs"))


_PQ_SLICE = "(s.j * 16 + t)"


def _pq_d2(a: str, b: str) -> str:
    """16-dim subspace squared L2 between list slices — DuckDB side."""
    return (
        "list_sum(list_transform(range(1, 17), "
        f"t -> ({a}[{_PQ_SLICE}] - {b}[{_PQ_SLICE}]) ** 2))"
    )


# Shared PQ replay fragment (codebooks, encode argmin, integer LUTs,
# ADC sums) — used by pq_adc_topk and the RRF fusion oracle.
_PQ_CTES = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
    cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, ev AS cv
           FROM (SELECT vec_id, ev FROM v ORDER BY vec_id LIMIT 8)),
    s AS (SELECT unnest(range(4)) AS j),
    dists AS (
      SELECT v.vec_id, s.j, cb.code, {_pq_d2("v.ev", "cb.cv")} AS d2
      FROM v, s, cb
    ),
    enc AS (SELECT vec_id, j, code FROM (
      SELECT vec_id, j, code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
      FROM dists) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, ev AS qv
          FROM v WHERE vec_id % 2 = 1 ORDER BY vec_id LIMIT 4),
    lut AS (
      SELECT q.qid, s.j, cb.code,
             CAST(ROUND({_pq_d2("q.qv", "cb.cv")} * 1000000) AS BIGINT) AS d2m
      FROM q, s, cb
    ),
    adc AS (
      SELECT l.qid AS q, e.vec_id AS neighbor,
             CAST(SUM(l.d2m) AS BIGINT) AS adc_micro
      FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
      WHERE e.vec_id <> l.qid
      GROUP BY 1, 2
    ),
    pq_ranked AS (
      SELECT q, neighbor, adc_micro,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY adc_micro, neighbor) AS rank
      FROM adc)
"""


def _pq_query_set(emb) -> list[tuple[int, list[float]]]:
    """The PQ family's query set — the 4 lowest odd vec_ids, in
    LOCKSTEP with the _PQ_CTES `q` CTE (vec_id % 2 = 1 ORDER BY
    vec_id LIMIT 4). ONE definition: three queries (pq_adc_topk,
    hybrid_rrf_topk, pq_rerank_topk) previously carried verbatim
    copies, and editing the CTE meant finding all three (review
    r9)."""
    return [
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.filter(F.col("vec_id") % 2 == 1)
        .orderBy("vec_id")
        .limit(4)
        .select("vec_id", "embedding")
        .collect()
    ]


def _pq_prep(emb, m: int = 4, ksub: int = 8):
    """(codebooks, query set) for the PQ family in ONE collect job
    (optimization r9, guide §2.6/§5: the driver should not serialize
    tiny independent jobs): the two TakeOrdered limits —
    collect_pq_codebooks' ksub lowest ids and _pq_query_set's 4 lowest
    odd ids — union into a single tagged plan, so the three PQ
    queries each pay one driver job for their planning scalars
    instead of two. Driver-side sorts rebuild each list's
    deterministic order; structures are identical to the two-call
    form (equality pinned by tests/test_pq.py)."""
    tagged = (
        emb.orderBy("vec_id")
        .limit(ksub)
        .select(F.lit(0).alias("_t"), "vec_id", "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") % 2 == 1)
            .orderBy("vec_id")
            .limit(4)
            .select(F.lit(1).alias("_t"), "vec_id", "embedding")
        )
    )
    rows = tagged.collect()
    cb_rows = sorted((r for r in rows if r[0] == 0), key=lambda r: r[1])
    q_rows = sorted((r for r in rows if r[0] == 1), key=lambda r: r[1])
    dim = len(cb_rows[0][2])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    codebooks = [
        [
            (code, [float(x) for x in r[2][j * sub : (j + 1) * sub]])
            for code, r in enumerate(cb_rows)
        ]
        for j in range(m)
    ]
    qs = [(int(r[1]), [float(x) for x in r[2]]) for r in q_rows]
    return codebooks, qs


@query(
    "pq_adc_topk",
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT q, neighbor, adc_micro, rank FROM pq_ranked WHERE rank <= 10
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. TPAMI'11): deterministic
    codebooks (subvectors of the 8 lowest-id vectors, the IVF seed
    rule), shuffle-free literal-argmin encoding (64 floats -> 4
    codes), and ADC top-10 for the 4 lowest odd-id queries via
    integer micro-unit lookup tables — the ADC sum is pure integer
    addition, so engines cannot drift however they order it. The
    oracle replays codebook construction, encoding argmin, LUT
    quantization and ranking; encode/LUT float margins are pinned by
    tests/test_pq.py. Compression story at 100 TB: 256 B/vector ->
    4 codes, corpus scan moves ints, raw vectors never shuffle."""
    from streaming_cdc_spark.operators.ann import pq_adc_topk

    emb = load(spark, sf_dir, "embeddings")
    cb, qs = _pq_prep(emb, m=4, ksub=8)
    return pq_adc_topk(emb, cb, qs, k=10)


@query(
    "hybrid_rrf_topk",
    oracle=f"""
    WITH {_PQ_CTES},
    dense AS (
      SELECT q, neighbor, rank AS rd FROM (
        SELECT a.vec_id AS q, b.vec_id AS neighbor,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b
          ON a.vec_id IN (SELECT qid FROM q) AND b.vec_id <> a.vec_id
      ) WHERE rank <= 20
    ),
    pqr AS (SELECT q, neighbor, rank AS rp FROM pq_ranked WHERE rank <= 20),
    fused AS (
      SELECT COALESCE(d.q, p.q) AS q,
             COALESCE(d.neighbor, p.neighbor) AS neighbor,
             COALESCE(CAST(1 AS DOUBLE) / (60 + d.rd), 0)
               + COALESCE(CAST(1 AS DOUBLE) / (60 + p.rp), 0) AS score
      FROM dense d FULL OUTER JOIN pqr p
        ON d.q = p.q AND d.neighbor = p.neighbor
    )
    SELECT q, neighbor, rrf_r, rank FROM (
      SELECT q, neighbor, ROUND(score, 9) AS rrf_r,
             ROW_NUMBER() OVER (PARTITION BY q
                                ORDER BY score DESC, neighbor) AS rank
      FROM fused) WHERE rank <= 5
    """,
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fusion (reciprocal rank fusion, Cormack et al.
    SIGIR'09): the exact-cosine top-20 and the PQ/ADC top-20 for the
    same 4 queries fuse by score = sum over lists of 1/(60 + rank) —
    rank arithmetic only, so the fusion layer adds zero float-drift
    surface beyond two identical-order double divisions. The full
    outer join keeps candidates found by either ranker (the point of
    RRF: recall from the cheap list, precision from the exact one).
    Oracle replays both rankers (the PQ fragment is shared with
    pq_adc_topk) and the fusion."""
    from streaming_cdc_spark.operators.ann import pq_adc_topk as pq_op
    from streaming_cdc_spark.operators.similarity import cosine_top_k

    emb = load(spark, sf_dir, "embeddings")
    # derive the query set exactly as the oracle's q CTE does (the 4
    # lowest ODD vec_ids) — a hardcoded literal list would silently
    # diverge from the PQ fragment if testdata ids ever shift
    cb, qs = _pq_prep(emb, m=4, ksub=8)
    qids = [qid for qid, _ in qs]
    dense = cosine_top_k(emb.filter(F.col("vec_id").isin(qids)), emb, k=20).select(
        "q", "neighbor", F.col("rank").alias("rd")
    )
    pq = pq_op(emb, cb, qs, k=20).select("q", "neighbor", F.col("rank").alias("rp"))
    one = F.lit(1.0)
    fused = dense.join(pq, ["q", "neighbor"], "full_outer").select(
        "q",
        "neighbor",
        (
            F.coalesce(one / (F.lit(60) + F.col("rd")), F.lit(0.0))
            + F.coalesce(one / (F.lit(60) + F.col("rp")), F.lit(0.0))
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q").orderBy(F.desc("score"), F.asc("neighbor"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q", "neighbor", F.round("score", 9).alias("rrf_r"), "rank")
    )


@query(
    "ivf_recall_calibration",
    oracle=f"""
    WITH {_ASSIGN_CTE},
    probes AS (SELECT vec_id AS q, cid, rn FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM dists) WHERE rn <= 2),
    pairs AS (SELECT a.vec_id AS q, b.vec_id AS nb,
                     list_cosine_similarity(a.ev, b.ev) AS sim
              FROM assigned a JOIN assigned b ON a.vec_id <> b.vec_id),
    exact AS (SELECT q, nb FROM (
        SELECT q, nb, ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, nb) AS r
        FROM pairs) WHERE r <= 3),
    j AS (SELECT e.q, e.nb, MIN(p.rn) AS best_rn
          FROM exact e
          JOIN assigned na ON na.vec_id = e.nb
          JOIN probes p ON p.q = e.q AND p.cid = na.cid
          GROUP BY e.q, e.nb),
    x AS (SELECT e.q, e.nb, j.best_rn
          FROM exact e LEFT JOIN j ON j.q = e.q AND j.nb = e.nb)
    SELECT n.np AS n_probe,
           CAST(SUM(CASE WHEN x.best_rn IS NOT NULL AND x.best_rn <= n.np
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(COUNT(*) AS BIGINT) AS n_possible
    FROM (SELECT UNNEST([1, 2]) AS np) n CROSS JOIN x
    GROUP BY 1
    """,
)
def ivf_recall_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-recall calibration (the ANN twin of
    minhash_recall_calibration): ground truth = the exact cosine
    top-3 of EVERY vector; an exact neighbor is reachable at
    ``n_probe`` probes iff its assigned cell is among the query's
    n_probe nearest centroids. Output: per probe count, the exact
    integer (hits, possible) pair — the measured recall@3 the
    probe-count dial buys, with no float in the compared columns.
    The exact top-3 identity is rank-stable cross-engine (min adjacent
    sim gap in the top-4 is 1.8e-5 at sf0.01, see ivf_topk_exact).
    Scale: ground truth is corpus-sized only in CALIBRATION (run on a
    sample at 100 TB); the per-probe membership check is an equi-join
    on (query, cell)."""
    from streaming_cdc_spark.operators.ann import (
        assign_cells,
        collect_seed_centroids,
        probe_cells_ranked,
    )
    from streaming_cdc_spark.operators.similarity import cosine_top_k

    emb = load(spark, sf_dir, "embeddings")
    cents = collect_seed_centroids(emb, 8)
    nbcell = assign_cells(emb, cents, "vec_id", "embedding", out_id="nb").select(
        "nb", "cid"
    )
    exact = (
        cosine_top_k(emb, emb, k=3)
        .select("q", F.col("neighbor").alias("nb"))
        .join(nbcell, "nb")  # (q, nb, cid of nb)
    )
    # OPTIMIZATION r9: one RANKED probe pass (rn = probe order) serves
    # every budget — hits at n_probe p are the pairs whose best_rn <= p
    # (exactly the oracle's j/x CTEs). The previous form re-ran the
    # probe assignment, a semi-join and two count jobs PER budget, and
    # needed two localCheckpoints to share `exact`; this form is one
    # plan with a single join and a single aggregate, no eager jobs.
    probes = probe_cells_ranked(
        emb, cents, 2, "vec_id", "embedding", out_id="q", with_rank=True
    ).select("q", "cid", "rn")
    best = (
        exact.join(probes, ["q", "cid"], "left")
        .groupBy("q", "nb")
        .agg(F.min("rn").alias("best_rn"))
    )
    stats = best.agg(
        F.count(F.lit(1)).cast("long").alias("n_possible"),
        # F.sum over zero rows is NULL (r4 lesson) — coalesce so an
        # empty exact set yields (0, 0) like the old count-job form
        F.coalesce(F.sum(F.when(F.col("best_rn") <= 1, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("h1"),
        F.coalesce(F.sum(F.when(F.col("best_rn") <= 2, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("h2"),
    )
    return stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("int").alias("n_probe"),
                    F.col("h1").alias("n_hits"),
                    F.col("n_possible").alias("n_possible"),
                ),
                F.struct(
                    F.lit(2).cast("int").alias("n_probe"),
                    F.col("h2").alias("n_hits"),
                    F.col("n_possible").alias("n_possible"),
                ),
            )
        ).alias("_r")
    ).select("_r.n_probe", "_r.n_hits", "_r.n_possible")


@query(
    "embedding_covariance",
    oracle="""
    WITH q AS (
      SELECT vec_id, i, CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qv
      FROM (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
      )
    ),
    g AS (
      SELECT CAST(a.i AS BIGINT) AS dim_i, CAST(b.i AS BIGINT) AS dim_j,
             CAST(SUM(a.qv * b.qv) AS BIGINT) AS gram_q,
             CAST(SUM(a.qv) AS BIGINT) AS sum_i,
             CAST(SUM(b.qv) AS BIGINT) AS sum_j,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT dim_i, dim_j, gram_q, n,
           ROUND((CAST(gram_q AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(sum_i AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sum_j AS DOUBLE) / CAST(n AS DOUBLE)))
                 / 1000000.0, 6) AS cov_r
    FROM g
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact d x d covariance of the embedding table — the PCA /
    whitening precursor (the reference whitens mention encodings
    before clustering; SURVEY §2 vectorize surface) as a DISTRIBUTED
    LINEAR-ALGEBRA physical: each task folds its rows into one d x d
    int64 partial via a numpy matmul (operators/gram.py), and the
    shuffle moves only d(d+1)/2 tiny partial rows per task batch —
    never the data. The naive relational forms are superlinear in
    shuffle width (explode + dim self-join moves n*d^2 rows; a
    pivoted groupBy still moves n*d), so at 100 TB map-side partial
    accumulation is the only shape that survives; the oracle IS the
    naive explode + self-join — an independent formulation whose
    hash match proves the partial-merge algebra. Floats are
    quantized to milli-units with FLOOR before any accumulation
    (floor(x*1000): exact in double for float32 inputs, no
    round-half tie rule needed, identical in Spark/numpy/DuckDB), so
    every sum is exact integer arithmetic and partition-order free;
    the covariance is one fixed-order double formula per cell,
    rounded 6dp."""
    from streaming_cdc_spark.operators.gram import covariance_matrix

    emb = load(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding")


_GRID_R = 100_000  # radius in micro-units (0.1 in embedding space)
_GRID_K = 3
_GRID_SHIFT = 1_000_000  # makes quantized coords positive: div == floor

_GRID_ORACLE = f"""
    WITH p AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
               + {_GRID_SHIFT} AS qx,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
               + {_GRID_SHIFT} AS qy
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS q, b.vec_id AS neighbor,
             (a.qx - b.qx) * (a.qx - b.qx)
               + (a.qy - b.qy) * (a.qy - b.qy) AS dist2
      FROM p a JOIN p b ON a.vec_id <> b.vec_id
      WHERE (a.qx - b.qx) * (a.qx - b.qx)
              + (a.qy - b.qy) * (a.qy - b.qy)
            < CAST({_GRID_R} AS BIGINT) * CAST({_GRID_R} AS BIGINT)
    ),
    ranked AS (
      SELECT q, neighbor, CAST(dist2 AS BIGINT) AS dist2,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY dist2, neighbor) AS rank
      FROM cand
    )
    SELECT q, neighbor, dist2, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_GRID_K}
"""


@query("grid_knn_join", oracle=_GRID_ORACLE)
def grid_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-ACCELERATED spatial kNN join on the first two embedding
    dims: each point's top-{_GRID_K} neighbors within radius R, the
    2-D sibling of the interval bucket join. Coordinates are
    quantized to EXACT integer micro-units (floor, then a +1e6 shift
    so every value is positive and `div` == floor on both engines —
    Spark div truncates toward zero, the label_centroid_outliers
    negative-operand trap), so the distance predicate and the
    (dist2, id) ranking are pure integer arithmetic — no float
    boundary anywhere. Physical: home-cell assignment (cell width =
    R, so any within-R partner is in the 3x3 neighborhood), probe
    side exploded to its 9 neighbor cells, equi-join on the build
    side's single home cell (each candidate pair generated exactly
    once — no DISTINCT), integer radius filter, then per-probe
    top-k via row_number — Spark plants a map-side WindowGroupLimit
    below the exchange, so the rank shuffle carries at most k rows
    per (probe, input-partition): every shuffle in the plan is
    LINEAR in n even as cell density grows. The quadratic
    within-cell candidate work stays compute inside the join stage —
    at 100 TB the R dial (like tau on similarity graphs) bounds
    cell population; a fixed-radius ALL-PAIRS emit would instead
    have quadratic OUTPUT on densifying data, which is why the
    registered form is top-k. Oracle: the naive theta join + rank,
    grid-free — an independent formulation, so the hash match
    proves 3x3 coverage loses nothing."""
    from streaming_cdc_spark.operators.spatial import grid_knn

    emb = load(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id",
        (
            F.floor(F.col("embedding").getItem(0).cast("double") * 1_000_000)
            .cast("long")
            + _GRID_SHIFT
        ).alias("qx"),
        (
            F.floor(F.col("embedding").getItem(1).cast("double") * 1_000_000)
            .cast("long")
            + _GRID_SHIFT
        ).alias("qy"),
    )
    return grid_knn(p, _GRID_R, _GRID_K)


_GRIDSK_CAP = 8
_GRIDSK_HOT = 5_000_000  # its own cell region, far from the data's [0, 2e6]

_GRIDSK_ORACLE = f"""
    WITH p AS (
      SELECT vec_id,
             CASE WHEN vec_id % 5 < 2
                  THEN {_GRIDSK_HOT} + vec_id % 313
                  ELSE CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000)
                            AS BIGINT) + {_GRID_SHIFT} END AS qx,
             CASE WHEN vec_id % 5 < 2
                  THEN {_GRIDSK_HOT} + vec_id % 331
                  ELSE CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1000000)
                            AS BIGINT) + {_GRID_SHIFT} END AS qy
      FROM embeddings
    ),
    capped AS (
      SELECT vec_id, qx, qy
      FROM (
        SELECT vec_id, qx, qy,
               ROW_NUMBER() OVER (PARTITION BY qx // {_GRID_R}, qy // {_GRID_R}
                                  ORDER BY vec_id) AS cr
        FROM p
      ) WHERE cr <= {_GRIDSK_CAP}
    ),
    cand AS (
      SELECT a.vec_id AS q, b.vec_id AS neighbor,
             (a.qx - b.qx) * (a.qx - b.qx)
               + (a.qy - b.qy) * (a.qy - b.qy) AS dist2
      FROM p a JOIN capped b ON a.vec_id <> b.vec_id
      WHERE (a.qx - b.qx) * (a.qx - b.qx)
              + (a.qy - b.qy) * (a.qy - b.qy)
            < CAST({_GRID_R} AS BIGINT) * CAST({_GRID_R} AS BIGINT)
    ),
    ranked AS (
      SELECT q, neighbor, CAST(dist2 AS BIGINT) AS dist2,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY dist2, neighbor) AS rank
      FROM cand
    )
    SELECT q, neighbor, dist2, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_GRID_K}
"""


@query("grid_knn_skewed", oracle=_GRIDSK_ORACLE)
def grid_knn_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grid_knn_join's SKEW DIAL under a PLANTED HOT CELL — the
    ppjoin_skewed pattern applied to spatial data: 40% of the points
    (vec_id % 5 < 2) are overridden to one geo hotspot (a default
    coordinate / point-of-interest, the classic spatial skew), whose
    cell population would otherwise make the within-cell candidate
    work quadratic in the hot count. max_cell_population={_GRIDSK_CAP}
    admits only the {_GRIDSK_CAP} lowest-id points of each home cell
    into the BUILD index, so hot-cell candidates are cap*n_hot, not
    n_hot^2 — and the cap filter itself is map-side-limited
    (WindowGroupLimit below the cell exchange, plan-pinned), so the
    hot cell never becomes a single-partition sort wall. Every point
    still PROBES: capped points keep their own top-k (over the capped
    index). The cap bites at every sf ({_GRIDSK_CAP} << 20 hot points
    at sf0.001). Membership is deterministic (lowest ids), so the
    oracle replays it exactly: the naive grid-free theta join against
    the capped set — recall-trading but replayable, the
    resource_allocation_links hub-cap contract. Hot offsets
    (vec_id % 313, % 331) give distinct exact-integer distances with
    the (dist2, neighbor) total order breaking residual ties."""
    from streaming_cdc_spark.operators.spatial import grid_knn

    emb = load(spark, sf_dir, "embeddings")
    hot = F.col("vec_id") % 5 < 2
    p = emb.select(
        "vec_id",
        F.when(hot, F.lit(_GRIDSK_HOT) + F.col("vec_id") % 313)
        .otherwise(
            F.floor(F.col("embedding").getItem(0).cast("double") * 1_000_000)
            .cast("long")
            + _GRID_SHIFT
        )
        .alias("qx"),
        F.when(hot, F.lit(_GRIDSK_HOT) + F.col("vec_id") % 331)
        .otherwise(
            F.floor(F.col("embedding").getItem(1).cast("double") * 1_000_000)
            .cast("long")
            + _GRID_SHIFT
        )
        .alias("qy"),
    )
    return grid_knn(p, _GRID_R, _GRID_K, max_cell_population=_GRIDSK_CAP)


@query(
    "pq_rerank_topk",
    oracle=f"""
    WITH {_PQ_CTES},
    short AS (SELECT q, neighbor FROM pq_ranked WHERE rank <= 20),
    rer AS (
      SELECT s.q, s.neighbor,
             list_cosine_similarity(a.ev, b.ev) AS sim
      FROM short s JOIN v a ON a.vec_id = s.q
                   JOIN v b ON b.vec_id = s.neighbor
    )
    SELECT q, neighbor, ROUND(sim, 6) AS sim_r, rank FROM (
      SELECT q, neighbor, sim,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY sim DESC, neighbor)
               AS rank
      FROM rer
    ) WHERE rank <= 5
""",
)
def pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE RETRIEVE-THEN-RERANK — the production ANN serving
    pattern pq_adc_topk and cosine_topk each cover half of: a CHEAP
    compressed-domain shortlist (PQ ADC over integer LUTs, top-20 per
    query — the corpus scan moves 4 codes per row, raw vectors never
    shuffle) followed by an EXACT cosine re-rank of only the
    shortlist (20 pairs per query — the expensive kernel touches
    shortlist-many vectors, not the corpus). The oracle replays both
    stages off the shared _PQ_CTES; ranking follows the cosine_topk
    idiom (raw-sim DESC + neighbor-id tiebreak, 6dp rounded output).
    At 100 TB this is THE latency/recall dial: stage-1 candidates
    per query bound the exact work, and the two stages shuffle
    nothing but (query, candidate-id) pairs."""
    from streaming_cdc_spark.functions.vectors import as_double, cosine
    from streaming_cdc_spark.operators.ann import pq_adc_topk as _adc
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    cb, qs = _pq_prep(emb, m=4, ksub=8)
    short = _adc(emb, cb, qs, k=20).select("q", "neighbor")
    qv = emb.select(F.col("vec_id").alias("q"), F.col("embedding").alias("_qv"))
    nv = emb.select(
        F.col("vec_id").alias("neighbor"), F.col("embedding").alias("_nv")
    )
    rer = (
        short.join(qv, "q")
        .join(nv, "neighbor")
        .select("q", "neighbor", cosine(as_double("_qv"), as_double("_nv")).alias("sim"))
    )
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q", "neighbor", F.round("sim", 6).alias("sim_r"), "rank")
    )
