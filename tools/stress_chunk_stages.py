"""Per-stage scaling decomposition of chunk_dedup_stats (VERDICT r8
#3): the r8 stress battery measured the end-to-end op at 6.29x for 4x
data — in band (gate 8x) but the worst row, and the same code had
measured 2.5x earlier, so the question is whether any STAGE is
genuinely superlinear or the drift is environmental. The ppjoin r7
protocol: time each stage off a persisted input for both sizes and
compare PER-STAGE ratios — stage ratios survive host noise far better
than one end-to-end number because a co-tenant stall lands on one
stage, not proportionally on all of them.

Stages (operators/text.py chunk_dedup_stats):
  s1_chunks    content-defined chunking (posexplode narrow rows +
               per-doc lag window + join back) — scan-heavy
  s2_per_doc   groupBy (doc, chunk_hash) multiplicity/len aggregate
  s3_freq_join chunk-hash doc-frequency + join back + final per-doc
               aggregate (the only chunk-keyed shuffle pair)

Each stage is timed CUMULATIVELY off the persisted docs (s1 alone,
then s1+s2 materialized via persist at the boundary, etc. would
change plans); instead each stage's input is persisted + counted
before the timer so the timer covers exactly that stage's jobs.

Usage: python tools/stress_chunk_stages.py [n_small] [n_big]
Prints a per-stage table; exit 1 if any stage ratio > 2x size ratio.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = 0.0
    print(f"host load average (1m): {load1:.1f}")
    if load1 > 4:
        print("WARNING: loaded host — per-stage ratios are the point, "
              "but re-run quiet before believing any single number")

    spark = get_spark("stress-chunk")
    from streaming_cdc_spark.operators.text import content_defined_chunks
    from tools.stress import synth_dup_docs

    stages: dict[str, list[float]] = {}
    for n in (n_small, n_big):
        docs = synth_dup_docs(spark, n).persist()
        docs.count()

        t0 = time.time()
        ch = content_defined_chunks(docs)
        ch.write.format("noop").mode("overwrite").save()
        stages.setdefault("s1_chunks", []).append(round(time.time() - t0, 2))

        ch = ch.persist()
        ch.count()
        t0 = time.time()
        per_doc = ch.groupBy("doc_id", "chunk_hash").agg(
            F.count(F.lit(1)).alias("_occ"),
            F.max("chunk_len").alias("_len"),
        )
        per_doc.write.format("noop").mode("overwrite").save()
        stages.setdefault("s2_per_doc", []).append(round(time.time() - t0, 2))

        per_doc = per_doc.persist()
        per_doc.count()
        t0 = time.time()
        freq = per_doc.groupBy("chunk_hash").agg(
            F.count(F.lit(1)).alias("_ndocs")
        )
        j = per_doc.join(freq, "chunk_hash")
        j.groupBy("doc_id").agg(
            F.sum("_occ").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("_ndocs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
            F.sum(F.when(F.col("_ndocs") > 1, F.col("_len")).otherwise(0))
            .cast("long")
            .alias("shared_len"),
        ).write.format("noop").mode("overwrite").save()
        stages.setdefault("s3_freq_join", []).append(round(time.time() - t0, 2))

        # row-count evidence: chunk volume must scale linearly too
        stages.setdefault("rows_chunks", []).append(float(ch.count()))
        per_doc.unpersist()
        ch.unpersist()
        docs.unpersist()

    sr = n_big / n_small
    print(f"\ndocs {n_small}/{n_big} (size ratio {sr:.1f})")
    print(f"{'stage':14s} {'small':>9s} {'big':>9s} {'ratio':>6s}")
    failures = []
    for name, (a, b) in stages.items():
        ratio = b / max(a, 0.01)
        flag = ""
        if name.startswith("s") and ratio > 2 * sr:
            failures.append(name)
            flag = "  << OUT OF BAND"
        print(f"{name:14s} {a:9.2f} {b:9.2f} {ratio:6.2f}{flag}")
    spark.stop()
    if failures:
        print(f"STAGE OUT OF BAND: {', '.join(failures)}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
