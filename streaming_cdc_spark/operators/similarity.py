"""Pairwise similarity operators — the reference's O(n^2) score matrix
(nn_thresh.py:112-115 ``torch.mm(E, E^T)``, baseline.py:35-40) recast
for Spark.

Two physical strategies behind one logical operator, picked by size
(the same adaptivity pattern as AQE join selection):

- **broadcast** (build side small): the probe side streams through
  ``mapInPandas`` in Arrow batches; the build side is a broadcast
  numpy matrix, so each batch is one BLAS matmul.
- **blocked** (build side large): exact triangle blocking. Rows are
  hashed into B blocks; each row is replicated to the B block-pairs
  (i, j), i <= j it participates in; ``applyInPandas`` scores each
  block-pair with the same BLAS kernel. No driver collect, per-task
  memory bounded by 2 * block_rows vectors, and the edge set is
  IDENTICAL to the broadcast path — exactness is what the hash gate
  checks, so the scale path must not be approximate. Shuffle volume
  is n * B rows (B ≈ n / block_rows), the known lower bound for
  exact all-pairs with bounded task memory.

``strategy="auto"`` (the default everywhere) counts the input once
and picks broadcast below ``broadcast_max_rows``, blocked above.
Approximate candidate generation (sign-LSH ``sign_lsh_bucket``,
minhash bands in operators.dedup, IVF in operators.ann) remains the
recall-traded alternative for when even n*B replication is too much;
those paths are separate queries so the trade is explicit.

Threshold comparison is strict ``>`` on every path — the reference's
semantics (nn_thresh.py:138-152 links when score > threshold) and
consistent across cosine/blended/greedy/streaming.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# auto-strategy cutover: below this many build rows, broadcast wins
# (1M x 64-d float64 = ~0.5 GB broadcast — the practical ceiling).
BROADCAST_MAX_ROWS = 1_000_000
# blocked path: target rows per block (one block-pair task holds 2x).
# Rows per triangle block. Each block-pair task holds TWO blocks of
# normalized vectors and streams their sims in _CHUNK_ELEMS pieces;
# 16k x 16k work units also give a 1M-row corpus ~2000 independent
# tasks instead of the handful that 250k-row blocks left (r6 stress
# finding: the old value put a 100k-row corpus into ONE block whose
# task tried to allocate the full 80 GB sims matrix).
BLOCK_TARGET_ROWS = 16_384
# Bound on any single sims-matrix allocation inside a kernel task
# (~64 MB of float64).
_CHUNK_ELEMS = 8_000_000


def _prepare(df: DataFrame):
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Collect the build side as (ids, row-normalized float64 matrix).

    Only ever called on the broadcast (small) path — the blocked path
    never materializes anything on the driver."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms


def _norm_rows(pdf: pd.Series) -> np.ndarray:
    mat = np.stack(pdf.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _empty_edges() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "u": np.array([], dtype=np.int64),
            "v": np.array([], dtype=np.int64),
            "sim": np.array([], dtype=np.float64),
        }
    )


def _broadcast_self_edges(
    df: DataFrame,
    vec_cols_weights: list[tuple[str, float]],
    threshold: float,
    id_col: str,
) -> DataFrame:
    """Broadcast block-matmul: build side collected + broadcast, probe
    side streamed in Arrow batches, one BLAS matmul per kernel."""
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
                part = w * (_norm_rows(pdf[vec_col]) @ r_mat.T)
                sims = part if sims is None else sims + part
            li, ri = np.nonzero(sims > threshold)
            u = pdf[id_col].to_numpy()[li]
            v = r_ids[ri]
            keep = u < v
            yield pd.DataFrame({"u": u[keep], "v": v[keep], "sim": sims[li, ri][keep]})

    from streaming_cdc_spark.session import fan_out

    # the probe side inherits the scan's partitioning — a small
    # single-row-group file would run the whole matmul in ONE task
    probe = fan_out(df.select(id_col, *cols))
    return probe.mapInPandas(gen, "u long, v long, sim double")


def _blocked_self_edges(
    df: DataFrame,
    vec_cols_weights: list[tuple[str, float]],
    threshold: float,
    id_col: str,
    n_blocks: int,
) -> DataFrame:
    """Exact triangle blocking: replicate each row to its B block-pairs
    and score each pair group with the same kernel. Distributed end to
    end — no driver collect, no broadcast of the build side."""
    from streaming_cdc_spark.session import fan_out

    _prepare(df)
    B = max(int(n_blocks), 1)
    cols = [vc for vc, _ in vec_cols_weights]
    df = fan_out(df)
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        *cols,
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(B)).cast("int").alias("_blk"),
    )
    # row in block b participates in pairs (min(b,o), max(b,o)) for all
    # o — B distinct pair keys, encoded pk = i * B + j with i <= j.
    pk = F.array(
        *[
            F.least(F.col("_blk"), F.lit(o)) * B + F.greatest(F.col("_blk"), F.lit(o))
            for o in range(B)
        ]
    )
    replicated = base.withColumn("_pk", F.explode(pk))

    def score(key, pdf):
        # CHUNK the matmul: a block-pair task's sims matrix is
        # |left| x |right| doubles — unchunked, a 100k-row block is an
        # 80 GB allocation in ONE python worker (caught live by
        # tools/stress.py r6; same class as the r3 per-cell-kernel
        # finding). Row-chunking the left side bounds any single sims
        # allocation to ~_CHUNK_ELEMS elements while the flop count is
        # unchanged.
        i, j = divmod(int(key[0]), B)
        if len(pdf) < 2:
            return _empty_edges()
        ids = pdf["_id"].to_numpy()
        if i == j:
            lids = rids = ids
            mats = [
                (w, None, _norm_rows(pdf[vc])) for vc, w in vec_cols_weights
            ]
        else:
            lm = pdf["_blk"].to_numpy() == i
            if not lm.any() or lm.all():
                return _empty_edges()
            lids, rids = ids[lm], ids[~lm]
            mats = []
            for vc, w in vec_cols_weights:
                m = _norm_rows(pdf[vc])
                mats.append((w, m[lm], m[~lm]))
        out = []
        step = max(1, _CHUNK_ELEMS // max(len(rids), 1))
        for s in range(0, len(lids), step):
            sims = None
            for w, ml, mr in mats:
                left = mr[s : s + step] if ml is None else ml[s : s + step]
                part = w * (left @ mr.T)
                sims = part if sims is None else sims + part
            li, ri = np.nonzero(sims > threshold)
            lu, rv = lids[li + s], rids[ri]
            if i == j:
                keep = lu < rv
                lu, rv, sv = lu[keep], rv[keep], sims[li, ri][keep]
            else:
                sv = sims[li, ri]
                lu, rv = np.minimum(lu, rv), np.maximum(lu, rv)
            out.append(pd.DataFrame({"u": lu, "v": rv, "sim": sv}))
        return pd.concat(out, ignore_index=True) if out else _empty_edges()

    return replicated.groupBy("_pk").applyInPandas(score, "u long, v long, sim double")


def _self_edges(
    df: DataFrame,
    vec_cols_weights: list[tuple[str, float]],
    threshold: float,
    id_col: str,
    strategy: str,
    broadcast_max_rows: int,
    block_rows: int,
) -> DataFrame:
    if strategy == "auto":
        n = df.count()
        strategy = "broadcast" if n <= broadcast_max_rows else "blocked"
    else:
        n = None
    if strategy == "broadcast":
        return _broadcast_self_edges(df, vec_cols_weights, threshold, id_col)
    if strategy == "blocked":
        if n is None:
            n = df.count()
        n_blocks = max(1, -(-n // max(block_rows, 1)))
        return _blocked_self_edges(df, vec_cols_weights, threshold, id_col, n_blocks)
    raise ValueError(f"unknown strategy {strategy!r}")


def cosine_self_edges(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    block_rows: int = BLOCK_TARGET_ROWS,
) -> DataFrame:
    """All pairs (u < v) with cosine(u, v) > threshold (strict, matching
    nn_thresh.py:138-152).

    Output: (u long, v long, sim double). The similarity graph that
    feeds threshold clustering (C1-C3). ``strategy``: "auto" picks
    broadcast vs exact triangle blocking by build-side size; both
    produce the identical edge set.
    """
    return _self_edges(
        df, [(vec_col, 1.0)], threshold, id_col, strategy, broadcast_max_rows, block_rows
    )


def blended_self_edges(
    df: DataFrame,
    vec_cols_weights: list[tuple[str, float]],
    threshold: float,
    id_col: str = "vec_id",
    strategy: str = "auto",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    block_rows: int = BLOCK_TARGET_ROWS,
) -> DataFrame:
    """P13/C16 combo scoring (baseline.py:35-40, combo.py:21-41): the
    pairwise score is a weighted sum of per-column cosine kernels
    (e.g. 0.8 * mention-bigram + 0.2 * context-tfidf), thresholded
    strictly. Same strategy switch as cosine_self_edges; one matmul
    per kernel on either path."""
    return _self_edges(
        df, vec_cols_weights, threshold, id_col, strategy, broadcast_max_rows, block_rows
    )


def cosine_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    strategy: str = "auto",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    block_rows: int = BLOCK_TARGET_ROWS,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector
    (C9 ``cknn`` grinch_alg.py:213-237 generalized to k>1).

    Output: (q long, neighbor long, sim double, rank int). Ties break
    on neighbor id ascending — fully deterministic.

    ``strategy``: "auto" counts the corpus once and picks "broadcast"
    (corpus collected + broadcast, one BLAS matmul per probe batch)
    below ``broadcast_max_rows``, else "blocked": the corpus is hashed
    into B blocks, each query row is replicated to every block,
    per-block top-k candidates are scored with the same kernel, and a
    window keeps the global top-k. Identical output on both paths; the
    blocked one never materializes the corpus on the driver. IVF
    (operators.ann) remains the recall-traded sublinear alternative.
    """
    if strategy == "auto":
        n = corpus.count()
        strategy = "broadcast" if n <= broadcast_max_rows else "blocked"
    else:
        n = None
    if strategy == "blocked":
        if n is None:
            n = corpus.count()
        n_blocks = max(1, -(-n // max(block_rows, 1)))
        return _blocked_top_k(queries, corpus, k, id_col, vec_col, exclude_self, n_blocks)
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy {strategy!r}")
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

    from streaming_cdc_spark.session import fan_out

    return fan_out(queries.select(id_col, vec_col)).mapInPandas(
        gen, "q long, neighbor long, sim double, rank int"
    )


def _blocked_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool,
    n_blocks: int,
) -> DataFrame:
    """Exact distributed top-k: corpus hashed into B blocks, queries
    replicated to all B, per-block candidates merged by a window.
    Shuffle volume is |Q| * B + |C| rows — the bounded-task-memory
    lower bound for exact all-pairs scoring, same as the blocked
    self-edges path."""
    from pyspark.sql import Window

    from streaming_cdc_spark.session import fan_out

    _prepare(queries)
    B = max(int(n_blocks), 1)
    queries = fan_out(queries)
    c = corpus.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.lit(True).alias("_is_corpus"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(B)).cast("int").alias("_blk"),
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.lit(False).alias("_is_corpus"),
        F.explode(F.array(*[F.lit(b).cast("int") for b in range(B)])).alias("_blk"),
    )

    def score(key, pdf):
        cm = pdf["_is_corpus"].to_numpy()
        if cm.all() or not cm.any():
            return pd.DataFrame(
                {
                    "q": np.array([], dtype=np.int64),
                    "neighbor": np.array([], dtype=np.int64),
                    "sim": np.array([], dtype=np.float64),
                }
            )
        r_ids = pdf["_id"].to_numpy()[cm]
        r_mat = _norm_rows(pdf["_vec"][cm])
        q_ids = pdf["_id"].to_numpy()[~cm]
        sims = _norm_rows(pdf["_vec"][~cm]) @ r_mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids)):
            row = sims[qi]
            mask = r_ids != q_ids[qi] if exclude_self else np.ones_like(row, bool)
            cand = np.nonzero(mask)[0]
            # per-block top-k by (-sim, neighbor id); the global window
            # below re-ranks the B*k survivors with the same order
            order = cand[np.lexsort((r_ids[cand], -row[cand]))][:k]
            out_q.extend([q_ids[qi]] * len(order))
            out_n.extend(r_ids[order])
            out_s.extend(row[order])
        return pd.DataFrame({"q": out_q, "neighbor": out_n, "sim": out_s})

    cand = (
        c.unionByName(q)
        .groupBy("_blk")
        .applyInPandas(score, "q long, neighbor long, sim double")
    )
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def sign_lsh_probes(vec_col: str, n_bits: int = 8) -> F.Column:
    """Multi-probe set for sign-LSH: the vector's own bucket plus
    every bucket at Hamming distance 1 (one hyperplane flipped) —
    n_bits+1 probes. Near-miss neighbors that land one sign-bit away
    are recovered by probing instead of by adding hash tables; the
    candidate join stays an equi-join on the probe value. A (u, v)
    pair matches AT MOST one of u's probes (probes are distinct), so
    the join emits no duplicate pairs."""
    b = sign_lsh_bucket(vec_col, n_bits)
    return F.array(b, *[b.bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)])


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
