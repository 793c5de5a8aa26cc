"""Regenerate PLANS.md: formatted physical plans for representative
queries, annotated with the property each demonstrates (pushdown,
pruning, broadcast, equi-join candidate generation, partial
aggregation, two-pass global ordering). tests/test_plans.py PINS these
properties; this artifact makes them legible without running Spark.

Run: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

# (query, what the plan demonstrates, regexes that must appear)
SHOWCASE = [
    (
        "partitioned_pruning_roundtrip",
        "Hive partition pruning: the partition-column predicate lands in "
        "PartitionFilters — whole directories are pruned at planning "
        "time, before any footer or page is read (the corrupted-"
        "unselected-partition test proves the skip at execution).",
        [r"PartitionFilters: \[", r"event_type"],
    ),
    (
        "heaps_vocab_growth",
        "Heaps vocabulary growth: one range exchange for the global doc "
        "rank (mono-id decode, no single-partition Window), token-keyed "
        "MIN for first occurrences, sequence-fanned 10-row prefix sums — "
        "no windows, no nested-loop joins.",
        [r"rangepartitioning"],
    ),

    (
        "t_closeness_risk",
        "t-closeness without the cross join: the absent-sensitive-value "
        "terms telescope into one N*n_g constant, so the plan holds only "
        "keyed equi-joins over the present-cell relation plus the 5-row "
        "sensitive-marginal broadcast — no CartesianProduct, no "
        "BroadcastNestedLoopJoin, N folded as a planning scalar.",
        [r"BroadcastHashJoin", r"HashAggregate"],
    ),
    (
        "quartile_interp_stats",
        "percentile_cont by banded order statistics: all six bracketing "
        "ranks (lo+hi per quartile) share one scan and one band "
        "aggregate; windows are keyed by group (never a single global "
        "sort), and the interpolation is a projection over the tiny "
        "crossing-band rows.",
        [r"HashAggregate", r"Window"],
    ),
    (
        "pricing_summary",
        "TPC-H Q1 scan-agg: filter pushdown to the parquet scan, column "
        "pruning (ReadSchema carries only the 7 referenced columns), "
        "partial aggregation (HashAggregate x2) inside whole-stage codegen.",
        [r"PushedFilters: \[IsNotNull\(l_shipdate\)", r"HashAggregate"],
    ),
    (
        "revenue_by_nation",
        "Star join: region/nation/customer dims broadcast "
        "(BroadcastHashJoin), shuffle only on the fact-side keys.",
        [r"BroadcastHashJoin"],
    ),
    (
        "band_join_pairs",
        "Range/band join rewritten as an equi-join on the quantized band "
        "key — no BroadcastNestedLoopJoin / CartesianProduct anywhere.",
        [r"Join"],
    ),
    (
        "minhash_band_candidates",
        "LSH candidate generation: banded signatures equi-join on bucket "
        "values; the all-pairs comparison never appears.",
        [r"Join"],
    ),
    (
        "quality_decile_curriculum",
        "Two-pass global ordering: ONE range exchange moves the corpus; "
        "the local rank is decoded from monotonically_increasing_id (no "
        "second hashpartitioning of the data), offsets broadcast back.",
        [r"rangepartitioning", r"BroadcastExchange"],
    ),
    (
        "pipeline_manifest",
        "The whole preprocessing DAG (filter -> exact dedup -> MinHash "
        "dedup -> split -> pack) as one plan: every join is keyed, the "
        "hot-bucket cap prunes before the LSH self-join, and packing "
        "windows are keyed by split.",
        [],
    ),
    (
        "ngram_repetition_stats",
        "Doc-local array fold: zero exchanges between scan and the final "
        "aggregation of per-doc results (no hashpartitioning on an "
        "exploded ngram key).",
        [],
    ),
    (
        "edit_distance_pairs",
        "Ed-Join prefix filtering (r4): candidates are an equi-join on "
        "the rarest-(q*d+1) hashed gram prefixes + a length band; the "
        "banded levenshtein verify runs on candidates only — no "
        "CartesianProduct, no BroadcastNestedLoopJoin.",
        [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    ),
    (
        "zorder_layout",
        "Z-order clustering keys (r4): global min/max bounds ride as a "
        "one-row broadcast; the Morton interleave is 32 codegen'd "
        "shift/add terms fused into the projection — zero data-sized "
        "exchanges.",
        [r"BroadcastExchange"],
    ),
    (
        "pq_adc_topk",
        "Product-quantization ADC (r4): encoding is a literal-argmin "
        "projection fused into the scan; every query's integer LUT is a "
        "literal, so the only shuffle ranks the per-query candidate "
        "rows (Window over q).",
        [r"Window"],
    ),
    (
        "cdc_log_apply",
        "CDC change-log apply (r5): the whole I/U/D materialization is "
        "ONE keyed argmax — partial max_by BEFORE the exchange (shuffle "
        "carries one row per key per map task, never the log volume), "
        "final max_by + tombstone filter after.",
        [r"max_by", r"(?s)Aggregate.*Exchange hashpartitioning\(user_id"],
    ),
    (
        "record_linkage_scores",
        "Record linkage (r6): sorted-neighborhood blocking = one RANGE "
        "exchange (the global rank's mono-id decode, materialized by "
        "localCheckpoint so both pair sides reuse it — the downstream "
        "plan reads the ranked RDD), then a bucket-banded EQUI-join on "
        "the rank bucket (hash join, no theta join); Fellegi-Sunter "
        "u-stats ride in as a one-row broadcast.",
        # the banded equi-join keys (the audited one-row u-stats
        # BNLJ is whitelisted in audit_plans, so the blanket
        # join-showcase BNLJ assert is not triggered here)
        [r"\[_bkt#\d+L?\], \[_bkt", r"Scan ExistingRDD"],
    ),
    (
        "pareto_front_docs",
        "2-D skyline (r6): the distributed sweep — group max per x, "
        "exclusive two-pass running max over the small per-x relation, "
        "join-back filter. ONE shuffle over the data; the O(n^2) "
        "NOT-EXISTS definitional form exists only in the oracle.",
        [r"HashAggregate", r"rangepartitioning"],
    ),
    (
        "interval_coverage_counts",
        "Point-in-interval coverage (r6): bounded-width intervals UNNEST "
        "into covered days (Generate/explode) and hash-aggregate — the "
        "range join exists ONLY in the oracle's naive BETWEEN "
        "formulation; this plan has zero joins of any kind.",
        [r"Generate explode", r"HashAggregate"],
    ),
    (
        "kcore_peel_rounds",
        "K-core peeling (r6): three rounds, each one keyed degree "
        "aggregate plus two LeftSemi equi-joins of the surviving edges "
        "against the keep set; every round localCheckpoints (the "
        "recompute-tree fix), so the FINAL plan is the last degree "
        "aggregate over the materialized survivor RDD — the per-round "
        "semi-join physicals are pinned by tests/test_analytics.py "
        "goldens, not visible here (the sorted_neighborhood "
        "ExistingRDD effect).",
        [r"HashAggregate", r"Scan ExistingRDD"],
    ),
    (
        "unpivot_metric_stats",
        "UNPIVOT/melt (r7): DataFrame.unpivot lowers to ONE Expand (x4 "
        "rows) feeding a partial aggregate — one scan and one shuffle "
        "profile all four measures; the oracle's four-scan UNION ALL "
        "formulation exists only in DuckDB.",
        [r"Expand", r"HashAggregate"],
    ),
    (
        "mad_outlier_stats",
        "MAD outliers (r7): two chained banded exact medians — each "
        "median is a tiny (type, band) prefix-weight window plus an "
        "in-band rank window (every Window partition band-bounded), "
        "and the 5-row med/mad relations come back as broadcast hash "
        "joins; the cents base is one localCheckpointed scan shared by "
        "all three passes.",
        [r"Window", r"BroadcastHashJoin", r"Scan ExistingRDD"],
    ),
    (
        "basket_part_pairs",
        "Apriori pair mining (r7): the frequent-item semi-prune is a "
        "keyed equi-join BEFORE the quadratic step, and pair generation "
        "self-joins the pruned baskets CO-PARTITIONED on the basket key "
        "(both sides hashpartition on okey, one shuffle each); the "
        "one-row order total rides in as a whitelisted scalar broadcast.",
        [r"hashpartitioning\(okey"],
    ),
    (
        "embedding_covariance",
        "Map-side partial Gram (r7 third session): the O(n d^2) matmul "
        "work happens inside ONE MapInPandas stage reading the scan; "
        "the only exchange aggregates d(d+1)/2-row partials per task "
        "batch (dim_i, dim_j keys) — the shuffle never carries data "
        "rows, which is the whole point of the physical.",
        [r"MapInPandas", r"hashpartitioning\(dim_i"],
    ),
    (
        "grid_knn_join",
        "Grid spatial kNN (r7 third session): 9-cell probe explode "
        "equi-joined to single home cells (no theta join anywhere), "
        "then the per-probe rank passes through WindowGroupLimit BOTH "
        "map-side and reduce-side — the rank exchange carries at most "
        "k rows per (probe, input partition), keeping every shuffle "
        "linear while within-cell candidate work stays compute.",
        [r"WindowGroupLimit", r"Generate explode"],
    ),
    (
        "hll_replay_distinct",
        "HLL register build (r7 third session): register maxes are a "
        "keyed aggregate with a map-side partial (shuffle carries "
        "(type, reg) partials), the 64-register grid comes from a "
        "sequence explode (Generate) — no CartesianProduct — and the "
        "register file joins back as a broadcast hash join.",
        [r"HashAggregate", r"Generate explode"],
    ),
    (
        "grid_knn_skewed",
        "Hot-cell-capped spatial kNN (r8): the cell-population cap is "
        "a SECOND rank predicate and gets its own map-side "
        "WindowGroupLimit below the cell exchange — the planted hot "
        "cell (40% of points) ships at most cap rows per input "
        "partition into the build index, so the skew dial never "
        "becomes a single-partition sort wall; four WindowGroupLimit "
        "nodes total (cap + top-k, each map- and reduce-side).",
        [r"(?s)(WindowGroupLimit.*){4}", r"Generate explode"],
    ),
    (
        "winsorized_stats",
        "Banded exact order statistics (r8): the P5/P95 clamp bounds "
        "come from windows over the TINY (type, band) relation plus "
        "row-ranking only inside each crossing band — no per-type "
        "full-group sort anywhere; the bounds join back as one-row-"
        "per-type broadcast hash joins into a single clamp-aggregate "
        "scan.",
        [r"BroadcastHashJoin", r"HashAggregate"],
    ),
]


def main() -> None:
    from streaming_cdc_spark.queries import QUERIES
    from streaming_cdc_spark.session import get_spark

    spark = get_spark("plans")
    out = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        f"Source: `{SF_DIR}`; plans are the pre-execution AQE initial plans.",
        "tests/test_plans.py asserts these properties on every run; regenerate",
        "with `python tools/dump_plans.py` after plan-affecting changes.",
        "",
    ]
    for name, caption, must in SHOWCASE:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for pat in must:
            assert re.search(pat, plan), f"{name}: expected /{pat}/ in plan"
        if any("Join" in p for p in must):
            # scalar one-row crossJoin(broadcast(agg)) legitimately
            # plans as a BroadcastNestedLoopJoin — only the join
            # showcases must be free of non-equi join strategies
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name
        # keep the skeleton: drop codegen ids and trailing column lists
        lines = [
            re.sub(r"\[plan_id=\d+\]", "", l).rstrip()
            for l in plan.splitlines()
            if l.strip()
        ]
        skeleton = [l[:160] for l in lines[:40]]
        out += [f"## {name}", "", caption, "", "```", *skeleton, "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w", encoding="utf-8") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
