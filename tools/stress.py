"""Scale stress harness: synthesize an N-document corpus IN MEMORY
(spark.range + column expressions — no files, no driver data) and
time the corpus-hygiene operators at sizes far beyond the sf0.1
tables, at two sizes, to verify near-linear scaling (time ratio ~
size ratio) and that nothing collects to the driver.

Run: python tools/stress.py [n_docs_small] [n_docs_big]
Default 100k / 400k documents (~10M / ~40M tokens).

r6 (VERDICT r5 #2) adds the r5 flagship operators:
- ppjoin_pairs over the doc corpus with 1% planted near-dup pairs
  (candidates + verify both exercised);
- apply_changelog + changelog_deltas over a synthetic 1M/4M-op log
  with a PLANTED 30%-HOT KEY (the argmax partial-aggregates map-side;
  the deltas window pays one big-partition sort — measured honestly);
- pagerank_exact over 1M/4M synthetic edges (3 iterations);
r6 second session adds the round's new operator families:
- sorted_neighborhood_pairs at 1M/4M records (rank-banded blocking —
  candidate volume n*(window-1) by construction, skew-free bands);
- label_propagation (3 mode-vote iterations) and kcore_peel (3
  peeling rounds) at 1M/4M edges;
- chunk_dedup_stats at 100k/400k docs with planted duplicates.
- the blocked cosine kernel, which is QUADRATIC BY DESIGN (all-pairs
  compute in bounded-memory blocks): its expected time ratio is
  size_ratio^2, asserted as such — the LINEAR corpus-scale paths are
  the candidate-bounded ops above it (cells / bands / prefixes). The
  reference anchor: nn_thresh.py's dense n x n matrix OOMs at these
  sizes; the blocked kernel streams the same math and survives.

Exit 1 if any linear-class op's big/small time ratio exceeds
2 x the size ratio, or the kernel leaves [0.3, 2] x size_ratio^2
(generous slack for fixed per-job overhead at the small size).

This is evidence for SCALING.md, not part of the gate or bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_cdc_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n: int, tokens_per_doc: int = 100, vocab: int = 1000):
    """Deterministic synthetic corpus: doc i's token j is
    w<xxhash64(i, j) % vocab> — generated distributed, never on the
    driver."""
    idx = F.sequence(F.lit(0), F.lit(tokens_per_doc - 1))
    tok = lambda j: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(vocab)).cast("string")
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform(idx, tok), " ").alias("text"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias("source"),
    )


def synth_dup_docs(spark, n: int, dup_every: int = 97, vocab: int = 1000, **kw):
    """Corpus with ~1% planted near-dup pairs: doc i with
    i % dup_every == 1 re-generates doc i-1's token stream (identical
    shingle set, J = 1), so candidate generation AND verification see
    real positives at scale. ``vocab`` sizes the token space — pass
    vocab ∝ n to model Heaps'-law growth (real corpora grow
    vocabulary with size, keeping shingle df flat); a FIXED vocab
    DENSIFIES with n (coincidental shared 3-grams ~ C(total,2)/vocab³
    ∝ n²), which makes any exact similarity join's OUTPUT itself
    superlinear — that is a property of the corpus, not the
    algorithm (r7 ppjoin post-mortem)."""
    base = synth_docs(spark, n, vocab=vocab, **kw)
    seed = F.when(
        F.pmod(F.col("doc_id"), F.lit(dup_every)) == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    idx = F.sequence(F.lit(0), F.lit(99))
    tok = lambda j: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(seed, j), F.lit(vocab)).cast("string")
    )
    return base.select(
        "doc_id", F.array_join(F.transform(idx, tok), " ").alias("text"), "source"
    )


def synth_oplog(spark, n: int, hot_pct: int = 30):
    """Synthetic I/U/D op-log, generated distributed: ``hot_pct``% of
    all ops hit key 0 (the planted hot key); the rest spread over
    n/10 keys. seq = op id (unique), ~6% deletes."""
    key = F.when(F.pmod(F.col("id"), F.lit(100)) < hot_pct, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("id")), F.lit(max(n // 10, 1)))
    )
    op = (
        F.when(F.pmod(F.col("id"), F.lit(17)) == 0, F.lit("D"))
        .when(F.pmod(F.col("id"), F.lit(17)) < 9, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    return spark.range(n).select(
        key.alias("k"),
        F.col("id").alias("seq"),
        op.alias("op"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(10000)).cast("double") / 100.0).alias(
            "value"
        ),
    )


def synth_edges(spark, m: int, n_nodes: int):
    """m candidate edges over n_nodes, generated distributed;
    self-loops dropped, (u, v) normalized to u < v."""
    a = F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes))
    b = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_nodes))
    return (
        spark.range(m)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .filter(F.col("u") < F.col("v"))
    )


def synth_embeddings(spark, n: int, dim: int = 32):
    """Deterministic synthetic embeddings, generated distributed."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    comp = lambda j: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(2000)).cast("double") / 1000.0 - 1.0
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.transform(idx, comp).alias("embedding")
    )


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = 0.0
    print(f"host load average (1m): {load1:.1f}")
    if load1 > 4:
        # r6 post-mortem: a co-tenant window with idle-load ~11 made
        # identical code measure 2.5s vs 32-48s (cdc_deltas 4M) —
        # ratios from such a window are meaningless. Warn loudly; the
        # bands still gate so a genuinely bad op cannot hide behind
        # this message.
        print(
            "WARNING: host is loaded by co-tenants — expect spurious "
            "OUT OF BAND flags; re-run in a quiet window before "
            "believing any ratio here"
        )
    spark = get_spark("stress")

    from streaming_cdc_spark.operators.dedup import (
        minhash_band_candidates,
        simhash_fingerprints,
        simhash_hamming_pairs,
    )
    from streaming_cdc_spark.operators.dedup import minhash_dedup
    from streaming_cdc_spark.operators.text import (
        hash_sample,
        ngram_repetition,
        pack_sequences,
        quality_decile_bins,
        quality_features,
    )

    ops = {
        "hash_sample": lambda d: hash_sample(d, 10),
        "quality_features": lambda d: quality_features(d),
        "ngram_repetition": lambda d: ngram_repetition(d, n=2),
        "pack_sequences": lambda d: pack_sequences(d, budget=2048),
        "quality_deciles": lambda d: quality_decile_bins(d),
        "simhash": lambda d: simhash_fingerprints(d, n_bits=16),
        "minhash_bands": lambda d: minhash_band_candidates(d, num_hashes=4),
        "simhash_hamming": lambda d: simhash_hamming_pairs(d, max_distance=1),
        "minhash_dedup_e2e": lambda d: minhash_dedup(d, jaccard_threshold=0.5),
    }

    results: dict[str, list[float]] = {}
    for n in (n_small, n_big):
        docs = synth_docs(spark, n).persist()
        docs.count()
        for name, fn in ops.items():
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            results.setdefault(name, []).append(round(time.time() - t0, 2))
        docs.unpersist()

        # embedding-space operators: cells sized ~1.5k vectors (k grows
        # with n — the SemDeDup scale knob), n_probe=2 IVF
        from streaming_cdc_spark.operators.ann import (
            collect_seed_centroids,
            ivf_exact_top_k,
            semantic_dedup_flags_cells,
        )

        emb = synth_embeddings(spark, n).persist()
        emb.count()
        k_cells = max(8, n // 1500)
        cents = collect_seed_centroids(emb, k_cells)
        t0 = time.time()
        semantic_dedup_flags_cells(emb, cents, tau=0.9).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("semantic_dedup", []).append(round(time.time() - t0, 2))
        t0 = time.time()
        ivf_exact_top_k(emb, cents, k=3, n_probe=2).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("ivf_exact_topk", []).append(round(time.time() - t0, 2))
        emb.unpersist()

    # --- r6 (VERDICT r5 #2): the r5 flagship operators ------------
    from streaming_cdc_spark.operators.changelog import (
        apply_changelog,
        changelog_deltas,
    )
    from streaming_cdc_spark.operators.clustering import pagerank_exact
    from streaming_cdc_spark.operators.dedup import ppjoin_pairs
    from streaming_cdc_spark.operators.similarity import cosine_self_edges

    sizes: dict[str, float] = {name: n_big / n_small for name in results}

    # ppjoin runs on a Heaps'-law corpus (vocab ∝ n): with a FIXED
    # vocab the corpus densifies and the EXACT join's output grows
    # ~n² (r7 post-mortem: 20s -> 156s at 4x on vocab=1000 — the
    # coincidental-3-gram pair count is quadratic by construction, so
    # the band flagged the corpus, not the operator). The planted 1%
    # dups dominate the scale-invariant corpus's candidates instead.
    for n in (n_small, n_big):
        dup = synth_dup_docs(spark, n, vocab=max(n // 100, 1000)).persist()
        dup.count()
        t0 = time.time()
        ppjoin_pairs(dup, 1, 2).write.format("noop").mode("overwrite").save()
        results.setdefault("ppjoin_pairs", []).append(round(time.time() - t0, 2))
        dup.unpersist()
    sizes["ppjoin_pairs"] = n_big / n_small

    n_ops_small, n_ops_big = 10 * n_small, 10 * n_big  # 1M / 4M default
    for n in (n_ops_small, n_ops_big):
        log = synth_oplog(spark, n).persist()
        log.count()
        t0 = time.time()
        apply_changelog(log, ["k"], "seq", "op", ["value"]).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("cdc_apply_hotkey", []).append(round(time.time() - t0, 2))
        t0 = time.time()
        changelog_deltas(log, ["k"], "seq", "op", "value").write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("cdc_deltas_hotkey", []).append(round(time.time() - t0, 2))
        log.unpersist()
    sizes["cdc_apply_hotkey"] = sizes["cdc_deltas_hotkey"] = n_ops_big / n_ops_small

    m_small, m_big = 10 * n_small, 10 * n_big  # 1M / 4M edges default
    for m in (m_small, m_big):
        e = synth_edges(spark, m, m // 4).persist()
        e.count()
        t0 = time.time()
        pagerank_exact(e, iterations=3).write.format("noop").mode("overwrite").save()
        results.setdefault("pagerank_3it", []).append(round(time.time() - t0, 2))
        e.unpersist()
    sizes["pagerank_3it"] = m_big / m_small

    # --- r6 operators: SNM blocking, LPA + k-core, chunk dedup -----
    from streaming_cdc_spark.operators.clustering import (
        kcore_peel,
        label_propagation,
    )
    from streaming_cdc_spark.operators.linkage import sorted_neighborhood_pairs
    from streaming_cdc_spark.operators.text import chunk_dedup_stats

    # sorted-neighborhood blocking at 1M/4M records, window 8:
    # candidate volume is n*(window-1) BY CONSTRUCTION (rank bands)
    for n in (10 * n_small, 10 * n_big):
        rec = (
            spark.range(n)
            .select(
                F.col("id").alias("rid"),
                F.concat(
                    F.lit("n"),
                    F.pmod(F.xxhash64("id"), F.lit(max(n // 2, 1))).cast("string"),
                ).alias("name"),
            )
            .persist()
        )
        rec.count()
        t0 = time.time()
        sorted_neighborhood_pairs(rec, ["name", "rid"], "rid", 8).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("snm_pairs", []).append(round(time.time() - t0, 2))
        rec.unpersist()
    sizes["snm_pairs"] = n_big / n_small

    # label propagation (3 mode-vote iterations) + k-core peeling
    # (3 rounds) over the same 1M/4M synthetic edge sets as pagerank
    for m in (m_small, m_big):
        e = synth_edges(spark, m, m // 4).persist()
        e.count()
        t0 = time.time()
        label_propagation(e, iterations=3).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("label_prop_3it", []).append(round(time.time() - t0, 2))
        t0 = time.time()
        kcore_peel(e, k=2, rounds=3).write.format("noop").mode("overwrite").save()
        results.setdefault("kcore_3rounds", []).append(round(time.time() - t0, 2))
        e.unpersist()
    sizes["label_prop_3it"] = sizes["kcore_3rounds"] = m_big / m_small

    # content-defined chunking dedup profile at 100k/400k docs with
    # planted duplicates (so the chunk-sharing join sees real matches)
    for n in (n_small, n_big):
        dup = synth_dup_docs(spark, n).persist()
        dup.count()
        t0 = time.time()
        chunk_dedup_stats(dup).write.format("noop").mode("overwrite").save()
        results.setdefault("chunk_dedup", []).append(round(time.time() - t0, 2))
        dup.unpersist()
    sizes["chunk_dedup"] = n_big / n_small

    # --- r6 second session: interval unnest + greedy coverage ------
    from streaming_cdc_spark.operators.sampling import greedy_max_coverage
    from streaming_cdc_spark.operators.temporal import interval_coverage

    # bounded-width interval coverage at 1M/4M intervals (width <= 14
    # days -> explode rows = n * ~8, linear by construction)
    for n in (10 * n_small, 10 * n_big):
        iv = (
            spark.range(n)
            .select(
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + F.pmod(F.xxhash64("id"), F.lit(365)) * 86_400_000_000
                ).alias("start"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(14)).cast("int").alias("w"),
                F.pmod(F.col("id"), F.lit(3)).cast("string").alias("g"),
            )
            .persist()
        )
        iv.count()
        t0 = time.time()
        interval_coverage(iv, "start", "w", "g").write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("interval_coverage", []).append(
            round(time.time() - t0, 2)
        )
        iv.unpersist()
    sizes["interval_coverage"] = n_big / n_small

    # greedy max-coverage (k=3 rounds) over hashed shingles of the
    # duplicated corpus: per round one anti-join + keyed count +
    # global top-1 — linear per round
    from streaming_cdc_spark.operators.dedup import exploded_shingles

    for n in (n_small, n_big):
        dup = synth_dup_docs(spark, n).persist()
        dup.count()
        sh = exploded_shingles(dup, hashed=True)
        t0 = time.time()
        greedy_max_coverage(sh, "doc_id", "shingle", k=3).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("greedy_coverage_k3", []).append(
            round(time.time() - t0, 2)
        )
        dup.unpersist()
    sizes["greedy_coverage_k3"] = n_big / n_small

    # --- r7 (VERDICT r6 #3): the r6 analytics family at 1M/4M ------
    from streaming_cdc_spark.operators.profile import misra_gries_summary

    def synth_events(n: int):
        """n events: ~n/20 users, 5 types, unique seq — distributed."""
        return spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(max(n // 20, 1))).alias("user_id"),
            F.col("id").alias("seq"),
            F.concat(
                F.lit("t"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)).cast("string")
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000)).cast("double") / 100.0)
            .alias("value"),
        )

    from pyspark.sql import Window as W

    for n in (10 * n_small, 10 * n_big):
        ev = synth_events(n).persist()
        ev.count()
        # per-user transition bigrams: window partitions are user-sized
        # (~20 rows) — linear by construction
        t0 = time.time()
        wu = W.partitionBy("user_id").orderBy("seq")
        (
            ev.select(
                F.lag("event_type").over(wu).alias("s1"),
                F.col("event_type").alias("s2"),
            )
            .filter(F.col("s1").isNotNull())
            .groupBy("s1", "s2")
            .agg(F.count(F.lit(1)).alias("n"))
        ).write.format("noop").mode("overwrite").save()
        results.setdefault("transition_matrix", []).append(round(time.time() - t0, 2))
        # Misra-Gries summary: per-partition k-counter fold + one keyed
        # SUM merge — linear, never driver-side
        t0 = time.time()
        misra_gries_summary(ev.select(F.col("event_type").alias("key")), "key", 16)\
            .write.format("noop").mode("overwrite").save()
        results.setdefault("heavy_hitters_mg", []).append(round(time.time() - t0, 2))
        # exact weighted median per type: the cum-sum window partitions
        # by event_type (5 partitions!) — measured honestly; the
        # low-cardinality-group sort is the known wall this row watches
        t0 = time.time()
        wcum = (
            W.partitionBy("event_type")
            .orderBy("value", "seq")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        k = ev.withColumn("wt", (F.col("user_id") % 5 + 1).cast("long"))
        c = k.withColumn("cum", F.sum("wt").over(wcum))
        t = k.groupBy("event_type").agg(F.sum("wt").alias("tot"))
        x = c.join(t, "event_type").filter(F.col("cum") * 2 >= F.col("tot"))
        wrn = W.partitionBy("event_type").orderBy("value", "seq")
        (
            x.withColumn("rn", F.row_number().over(wrn))
            .filter(F.col("rn") == 1)
            .select("event_type", "value", "tot")
        ).write.format("noop").mode("overwrite").save()
        results.setdefault("weighted_median", []).append(round(time.time() - t0, 2))
        ev.unpersist()
    sizes["transition_matrix"] = sizes["heavy_hitters_mg"] = sizes[
        "weighted_median"
    ] = n_big / n_small

    # SNM at window 32 — the realistic wide-band config (candidate
    # volume n*31, still linear by construction)
    for n in (10 * n_small, 10 * n_big):
        rec = (
            spark.range(n)
            .select(
                F.col("id").alias("rid"),
                F.concat(
                    F.lit("n"),
                    F.pmod(F.xxhash64("id"), F.lit(max(n // 2, 1))).cast("string"),
                ).alias("name"),
            )
            .persist()
        )
        rec.count()
        t0 = time.time()
        sorted_neighborhood_pairs(rec, ["name", "rid"], "rid", 32).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("snm_pairs_w32", []).append(round(time.time() - t0, 2))
        rec.unpersist()
    sizes["snm_pairs_w32"] = n_big / n_small

    # r7: interval overlap join at 1M/4M intervals (bucket width =
    # max span -> <= 2 bucket rows per interval; pair volume bounded
    # by planted density) and the 3-round BPE merge trainer at
    # 100k/400k docs (per round: one pair-count shuffle + a doc-local
    # fold)
    from streaming_cdc_spark.operators.temporal import interval_overlap_pairs
    from streaming_cdc_spark.operators.text import bpe_merge_rounds

    for n in (10 * n_small, 10 * n_big):
        iv = (
            spark.range(n)
            .select(
                F.pmod(F.col("id"), F.lit(3)).cast("string").alias("g"),
                F.col("id").alias("iid"),
                (F.pmod(F.xxhash64("id"), F.lit(n // 10))).alias("s"),
                (
                    F.pmod(F.xxhash64("id"), F.lit(n // 10))
                    + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(14))
                ).alias("e"),
            )
            .persist()
        )
        iv.count()
        t0 = time.time()
        interval_overlap_pairs(iv, "g", "iid", "s", "e", 14).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("interval_overlap", []).append(round(time.time() - t0, 2))
        iv.unpersist()
    sizes["interval_overlap"] = n_big / n_small

    for n in (n_small, n_big):
        docs = synth_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        bpe_merge_rounds(docs, rounds=3).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("bpe_3rounds", []).append(round(time.time() - t0, 2))
        docs.unpersist()
    sizes["bpe_3rounds"] = n_big / n_small

    # r7 second session: wide-schema pivot (40 explicit value columns
    # — one Expand-free partial-agg pass), the banded median under a
    # PLANTED HOT BAND (50% of the mass in [50, 50.5): the coarse
    # floor(value) banding would put half the corpus in ONE in-band
    # window partition; band granularity is the documented skew dial,
    # so the stress row measures the x128-finer banding that keeps
    # every partition bounded), and 3-hop BFS over synth edges
    from streaming_cdc_spark.operators.clustering import bfs_distances
    from streaming_cdc_spark.operators.ranking import grouped_weighted_median

    for n in (10 * n_small, 10 * n_big):
        ev40 = (
            spark.range(n)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(max(n // 20, 1))).alias("uid"),
                F.concat(
                    F.lit("t"),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(40)).cast("string"),
                ).alias("etype"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)).alias("v"),
            )
            .persist()
        )
        ev40.count()
        t0 = time.time()
        (
            ev40.groupBy("uid")
            .pivot("etype", [f"t{i}" for i in range(40)])
            .agg(F.sum("v"))
        ).write.format("noop").mode("overwrite").save()
        results.setdefault("pivot_wide40", []).append(round(time.time() - t0, 2))
        ev40.unpersist()
    sizes["pivot_wide40"] = n_big / n_small

    for n in (10 * n_small, 10 * n_big):
        hot = (
            spark.range(n)
            .select(
                F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
                F.col("id").alias("rid"),
                F.lit(1).cast("long").alias("wt"),
                F.when(
                    F.pmod(F.xxhash64("id"), F.lit(2)) == 0,
                    50.0 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(500))
                    .cast("double") / 1000.0,
                )
                .otherwise(
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000))
                    .cast("double") / 100.0
                )
                .alias("value"),
            )
            .persist()
        )
        hot.count()
        t0 = time.time()
        grouped_weighted_median(
            hot, ["g"], "value", "rid", "wt",
            band_expr=F.floor(F.col("value") * 128),
        ).write.format("noop").mode("overwrite").save()
        results.setdefault("banded_median_hotband", []).append(
            round(time.time() - t0, 2)
        )
        hot.unpersist()
    sizes["banded_median_hotband"] = n_big / n_small

    for m in (n_ops_small, n_ops_big):
        g = synth_edges(spark, m, m // 4).persist()
        g.count()
        seeds = (
            g.select(F.col("u").alias("node")).distinct()
            .filter(F.col("node") % 1000 == 0)
        )
        t0 = time.time()
        bfs_distances(g, seeds, rounds=3).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("bfs_3hop", []).append(round(time.time() - t0, 2))
        g.unpersist()
    sizes["bfs_3hop"] = n_ops_big / n_ops_small

    # r7 third session: map-side partial Gram (O(n d^2) numpy flops,
    # d^2-row shuffle — linear in n by construction), grid spatial
    # kNN under the CONSTANT-DENSITY model (area grows with n — the
    # honest scaling model for survey-style spatial data, the Heaps-
    # vocab lesson applied to geometry; a FIXED area with growing n
    # is quadratic candidate work by definition and the radius dial
    # is the documented knob), and the HLL register build (distinct +
    # two keyed aggregates, linear).
    from streaming_cdc_spark.operators.gram import covariance_matrix
    from streaming_cdc_spark.operators.spatial import grid_knn

    for n in (n_small, n_big):
        emb64 = synth_embeddings(spark, n, dim=64).persist()
        emb64.count()
        t0 = time.time()
        covariance_matrix(emb64).write.format("noop").mode("overwrite").save()
        results.setdefault("gram_covariance_d64", []).append(
            round(time.time() - t0, 2)
        )
        emb64.unpersist()
    sizes["gram_covariance_d64"] = n_big / n_small

    for n in (10 * n_small, 10 * n_big):
        side = int(100 * (n ** 0.5))  # area ~ n -> ~100 points/cell at R=1000
        pts = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.pmod(F.xxhash64("id"), F.lit(side)).alias("qx"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(side)).alias("qy"),
            )
            .persist()
        )
        pts.count()
        t0 = time.time()
        grid_knn(pts, 1000, 3).write.format("noop").mode("overwrite").save()
        results.setdefault("grid_knn_k3", []).append(round(time.time() - t0, 2))
        pts.unpersist()
    sizes["grid_knn_k3"] = n_big / n_small

    from streaming_cdc_spark.functions.hashing import md5_long

    for n in (10 * n_small, 10 * n_big):
        ev = synth_events(n).persist()
        ev.count()
        t0 = time.time()
        h = ev.select(
            "event_type", md5_long(F.col("user_id").cast("string")).alias("hv")
        ).distinct()
        r = h.select(
            "event_type",
            (F.col("hv") % 64).alias("reg"),
            F.when(F.expr("hv div 64") == F.lit(0), F.lit(55))
            .otherwise(F.lit(55) - F.length(F.bin(F.expr("hv div 64"))))
            .cast("long")
            .alias("rho"),
        )
        r.groupBy("event_type", "reg").agg(F.max("rho").alias("mreg")).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("hll_registers", []).append(round(time.time() - t0, 2))
        ev.unpersist()
    sizes["hll_registers"] = n_big / n_small

    # r8 (VERDICT r7 #4): retraction-heavy join-view IVM — the
    # ivm_join_fold batch fold on a SIGNED op log with a planted 30%
    # hot key (the cdc_deltas_hotkey pattern): every 9th fact voided
    # half a seq-range later, dim upserts every 13th seq reclassify
    # keyed partials. Per-batch work is O(batch + touched keys) by
    # construction; the hot key stresses the partial-sum groupBys
    # (map-side combine) and the reclassify join.
    from streaming_cdc_spark.operators.changelog import ivm_join_fold

    for n in (n_ops_small, n_ops_big):
        key = F.when(F.pmod(F.col("id"), F.lit(100)) < 30, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.col("id")), F.lit(max(n // 10, 1)))
        )
        base = spark.range(n).select(
            key.alias("user_id"),
            F.col("id").alias("seq"),
            F.lit(1).cast("long").alias("dn"),
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100000))
            .cast("long")
            .alias("dc"),
        )
        voids = base.filter(
            (F.col("seq") % 9 == 4) & (F.col("seq") + n // 2 <= n - 1)
        ).select(
            "user_id",
            (F.col("seq") + n // 2).alias("seq"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("dc")).alias("dc"),
        )
        flog = base.unionByName(voids).persist()
        flog.count()
        dims = (
            spark.range(0, n, 13)
            .select(
                key.alias("user_id"),
                F.col("id").alias("seq"),
                F.concat(
                    F.lit("s"), F.pmod(F.xxhash64("id", F.lit(5)), F.lit(7))
                ).alias("new_seg"),
            )
            .persist()
        )
        dims.count()
        t0 = time.time()
        ivm_join_fold(flog, dims, 0, n - 1, n_batches=4).write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("ivm_retract_hotkey", []).append(
            round(time.time() - t0, 2)
        )
        flog.unpersist()
        dims.unpersist()
    sizes["ivm_retract_hotkey"] = n_ops_big / n_ops_small

    # r9 (VERDICT r8 #8): three new rows.
    # (1) grid kNN with a PLANTED 40% hot cell under the
    # max_cell_population cap — the skew dial must keep wall time
    # linear even when 40% of all points share one coordinate (the
    # registered grid_knn_skewed geometry at 10x the scale).
    from streaming_cdc_spark.operators.spatial import grid_knn as _gknn

    for n in (10 * n_small, 10 * n_big):
        side = int(100 * (n ** 0.5))
        hot = F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) < 40
        pts = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.when(hot, F.lit(500))
                .otherwise(F.pmod(F.xxhash64("id"), F.lit(side)))
                .alias("qx"),
                F.when(hot, F.lit(500))
                .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(side)))
                .alias("qy"),
            )
            .persist()
        )
        pts.count()
        t0 = time.time()
        _gknn(pts, 1000, 3, max_cell_population=8).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("grid_knn_hotcell", []).append(
            round(time.time() - t0, 2)
        )
        pts.unpersist()
    sizes["grid_knn_hotcell"] = n_big / n_small

    # (2) two-epoch salted global shuffle rank (epoch_shuffle_positions
    # geometry): two full range sorts + mono-id decode per epoch —
    # the range exchange is the only data movement, linear.
    from streaming_cdc_spark.functions.hashing import md5_long as _md5l
    from streaming_cdc_spark.operators.ranking import (
        grouped_order_statistics as _gos,
        row_number_global as _rng,
    )

    for n in (10 * n_small, 10 * n_big):
        d = spark.range(n).select(F.col("id").alias("doc_id")).persist()
        d.count()
        t0 = time.time()
        for e in (0, 1):
            hv = _md5l(F.col("doc_id").cast("string"), salt=f"ep{e}:")
            _rng(d.withColumn("_hv", hv), ["_hv", "doc_id"], "pos").write.format(
                "noop"
            ).mode("overwrite").save()
        results.setdefault("epoch_shuffle_2ep", []).append(
            round(time.time() - t0, 2)
        )
        d.unpersist()
    sizes["epoch_shuffle_2ep"] = n_big / n_small

    # (3) winsorized banded order statistics with a PLANTED 50%-hot
    # group (the banded_median_hotband pattern at the P5/P95 ranks):
    # the band granularity keeps the crossing-band row-rank tiny even
    # when one group holds half the data.
    for n in (10 * n_small, 10 * n_big):
        ev = (
            spark.range(n)
            .select(
                F.when(F.pmod(F.col("id"), F.lit(100)) < 50, F.lit("hot"))
                .otherwise(
                    F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(7)))
                )
                .alias("grp"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).alias("v"),
                F.col("id").alias("rid"),
            )
            .persist()
        )
        ev.count()
        t0 = time.time()
        _gos(
            ev,
            ["grp"],
            "v",
            "rid",
            [(5, 99, 100), (95, 99, 100)],
            band_expr=F.expr("v div 1000"),
        ).write.format("noop").mode("overwrite").save()
        results.setdefault("winsorized_hotgroup", []).append(
            round(time.time() - t0, 2)
        )
        ev.unpersist()
    sizes["winsorized_hotgroup"] = n_big / n_small

    # (4) multi-touch attribution at 1M/4M events under CONSTANT
    # per-user event density (users grow with n, ~40 events each over
    # a fixed 90-day span — the grid_knn constant-density lesson
    # applied to time): clicks-in-window per purchase stays constant,
    # so the pair relation and the whole query are linear.
    _SPAN_US = 90 * 86400 * 1_000_000
    _GAP_US = 7 * 86400 * 1_000_000
    for n in (10 * n_small, 10 * n_big):
        users = max(n // 40, 1)
        ev = (
            spark.range(n)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(users)).alias("user_id"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(_SPAN_US)).alias("tus"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10)).alias("kind"),
                F.col("id").alias("eid"),
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100000)).alias("cents"),
            )
            .persist()
        )
        ev.count()
        t0 = time.time()
        p = ev.filter(F.col("kind") == 0).select(
            F.col("eid").alias("pid"), "user_id",
            F.col("tus").alias("pus"), "cents",
        )
        c = ev.filter(F.col("kind") >= 5).select(
            F.col("eid").alias("cid"), "user_id", F.col("tus").alias("cus")
        )
        j = (
            p.join(c, "user_id")
            .withColumn("gap", F.col("pus") - F.col("cus"))
            .filter((F.col("gap") >= 0) & (F.col("gap") <= _GAP_US))
        )
        wn = W.partitionBy("pid")
        wr = W.partitionBy("pid").orderBy(F.desc("cus"), F.desc("cid"))
        scored = j.select(
            "pid", "cid", "cents",
            F.count(F.lit(1)).over(wn).alias("n"),
            F.row_number().over(wr).alias("rnk"),
        ).withColumn(
            "credit",
            F.expr("(cents * 1000000) div n")
            + F.when(
                F.col("rnk") == 1,
                F.col("cents") * F.lit(1_000_000)
                - F.expr("(cents * 1000000) div n") * F.col("n"),
            ).otherwise(F.lit(0)),
        )
        scored.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n_p"), F.sum("credit").alias("cr")
        ).write.format("noop").mode("overwrite").save()
        results.setdefault("multi_touch_attr", []).append(
            round(time.time() - t0, 2)
        )
        ev.unpersist()
    sizes["multi_touch_attr"] = n_big / n_small

    # (5) CUSUM changepoint at 1M/4M events with a PLANTED 30% hot
    # user (the changelog_deltas hot-key class: one window partition
    # holds 1.2M rows at the big size). Measured sub-linear (1.30 at
    # 4x in a quiet window): the rows entering the per-user sort are
    # NARROW (4 longs), so the single hot task's in-memory sort is
    # not the wall the banded-lag fix targeted. Values stay < 9e5 so
    # the statistic's bound |S_t*n| <= n^2*max(x) = (1.2e6)^2 * 9e5
    # ~ 1.3e18 keeps a 7x margin under the int64 cap on the
    # million-row planted series — do NOT scale rows OR the value
    # range up without redoing this arithmetic (ANSI overflow throws).
    for n in (10 * n_small, 10 * n_big):
        users = max(n // 50, 1)
        ev = (
            spark.range(n)
            .select(
                F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 3, F.lit(0))
                .otherwise(
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(users))
                )
                .alias("user_id"),
                F.col("id").alias("event_id"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10**12)).alias("tus"),
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(900_000)).alias("x"),
            )
            .persist()
        )
        ev.count()
        t0 = time.time()
        ordw = W.partitionBy("user_id").orderBy("tus", "event_id")
        full = W.partitionBy("user_id")
        w = ev.select(
            "user_id",
            F.row_number().over(ordw).cast("long").alias("t"),
            F.sum("x")
            .over(ordw.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("long")
            .alias("s_t"),
            F.count(F.lit(1)).over(full).cast("long").alias("n"),
            F.sum("x").over(full).cast("long").alias("s_n"),
        )
        dev = F.abs(F.col("s_t") * F.col("n") - F.col("t") * F.col("s_n"))
        d = w.select(
            "user_id",
            "t",
            "n",
            dev.alias("dev"),
            F.row_number()
            .over(W.partitionBy("user_id").orderBy(F.desc(dev), F.asc("t")))
            .alias("pick"),
        )
        d.filter(F.col("pick") == 1).write.format("noop").mode(
            "overwrite"
        ).save()
        results.setdefault("cusum_hotuser", []).append(
            round(time.time() - t0, 2)
        )
        ev.unpersist()
    sizes["cusum_hotuser"] = n_big / n_small

    # the raw blocked kernel is QUADRATIC by design (all-pairs compute
    # in bounded-memory blocks) — expected ratio is size_ratio^2.
    # Default sizes keep the default run short; STRESS_KERNEL_ROWS=a,b
    # overrides for the big SCALING.md measurement.
    k_env = os.environ.get("STRESS_KERNEL_ROWS", "")
    k_small, k_big = (
        [int(x) for x in k_env.split(",")] if k_env else (n_small, 2 * n_small)
    )
    for n in (k_small, k_big):
        emb = synth_embeddings(spark, n).persist()
        emb.count()
        t0 = time.time()
        cosine_self_edges(emb, 0.95, strategy="blocked").write.format(
            "noop"
        ).mode("overwrite").save()
        results.setdefault("cosine_kernel_blocked", []).append(
            round(time.time() - t0, 2)
        )
        emb.unpersist()
    sizes["cosine_kernel_blocked"] = k_big / k_small

    print(f"\ndocs {n_small}/{n_big}, ops+edges {n_ops_small}/{n_ops_big}, "
          f"kernel rows {k_small}/{k_big}")
    print(f"{'op':22s} {'t_small':>8s} {'t_big':>8s} {'ratio':>6s} "
          f"{'size_x':>6s} {'law':>10s}")
    failures = []
    for name, (a, b) in results.items():
        ratio = b / max(a, 0.01)
        sr = sizes[name]
        if name == "cosine_kernel_blocked":
            law, lo, hi = "quadratic", 0.3 * sr * sr, 2.0 * sr * sr
        else:
            law, lo, hi = "linear", 0.0, 2.0 * sr
        ok = lo <= ratio <= hi
        if not ok:
            failures.append(name)
        print(f"{name:22s} {a:8.2f} {b:8.2f} {ratio:6.2f} {sr:6.1f} "
              f"{law:>10s}{'' if ok else '  << OUT OF BAND'}")
    print("\ndriver-side data: none (noop sink; localCheckpoints are "
          "executor-side; ANN centroid collects bounded by k)")
    spark.stop()
    if failures:
        print(f"SCALING OUT OF BAND: {', '.join(failures)}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
