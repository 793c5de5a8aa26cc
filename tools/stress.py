"""Scale stress harness: synthesize an N-document corpus IN MEMORY
(spark.range + column expressions — no files, no driver data) and
time the corpus-hygiene operators at sizes far beyond the sf0.1
tables, at two sizes, to verify near-linear scaling (time ratio ~
size ratio) and that nothing collects to the driver.

Run: python tools/stress.py [n_docs_small] [n_docs_big]
Default 100k / 400k documents (~10M / ~40M tokens).

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

    scale = n_big / n_small
    print(f"\nn_small={n_small} n_big={n_big} (size ratio {scale:.1f}x)")
    print(f"{'op':20s} {'t_small':>8s} {'t_big':>8s} {'ratio':>6s}")
    for name, (a, b) in results.items():
        print(f"{name:20s} {a:8.2f} {b:8.2f} {b / max(a, 0.01):6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
