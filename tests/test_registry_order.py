"""The driver correctness gate checks only the first 50 registered
queries — pin the priority ordering so refactors can't silently push
a judged family out of the checked window."""

from streaming_cdc_spark.queries import ORACLES, QUERIES
from streaming_cdc_spark.queries import _PRIORITY


def test_priority_is_50_unique_known():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert all(n in QUERIES for n in _PRIORITY)


def test_first_50_match_priority():
    assert list(QUERIES)[:50] == _PRIORITY


def test_every_family_in_checked_window():
    first = set(list(QUERIES)[:50])
    # r8 rotation (VERDICT r7 #1/#5): 27 window slots hold
    # never-before-driver-verified oracles — the streaming/composition
    # long tail (outer join, stream-static fixed + evolving dim,
    # longstream compaction, leakage splits, incremental dedup both
    # sides, meta-blocking, fuzzy names, RRF fusion), the graph tail,
    # attribution analytics, window-function semantics, spatial kNN
    # (+ the new hot-cell cap), Gram covariance, z-order layout.
    # Every rotated-out query holds a green CORRECTNESS_r07 row and
    # stays registered + locally gated + benched. Family reps below
    # reflect the post-rotation window.
    families = {
        "relational": {"revenue_by_nation"},
        "cdc_metrics": {"b3_prf"},
        "dedup": {"ppjoin_skewed_pairs",
                  "chunk_dedup_profile", "pipeline_manifest",
                  "leakage_safe_splits", "incremental_dedup_status",
                  "incremental_semantic_status", "meta_blocking_pairs"},
        "ann": {"hybrid_rrf_topk", "grid_knn_join", "grid_knn_skewed"},
        "semantic_dedup": {"semantic_dedup"},
        "linalg": {"embedding_covariance"},
        "text": {"bpe_merge_table", "epoch_shuffle_positions",
                 "tfidf_topk_terms"},
        "privacy": {"k_anonymity_risk"},
        # packing stays in-window inside pipeline_manifest's DAG
        "packing": {"pipeline_manifest"},
        "temporal": {"funnel_conversion", "purchase_attribution",
                     "event_transition_matrix"},
        "streaming_state": {"streaming_sessions_custom_state",
                            "streaming_bloom_status",
                            "progressive_longstream_compacted",
                            "streaming_stream_join",
                            "streaming_join_then_window",
                            "streaming_outer_join",
                            "streaming_full_outer_join",
                            "stream_static_enrich",
                            "stream_static_enrich_evolving",
                            "streaming_update_mode_counts"},
        "changelog": {"cdc_streaming_apply", "ivm_hotkey_sums",
                      "ivm_join_view", "ivm_join_retract"},
        "linkage": {"record_linkage_scores", "fuzzy_name_join"},
        "analytics": {"winsorized_stats", "unpivot_metric_stats",
                      "windowed_rank_family", "rank_tie_semantics",
                      "cube_returnflag_status", "grouping_sets_custom",
                      "equidepth_histogram"},
        "graph": {"graph_modularity", "clustering_coefficients",
                  "triangle_counts", "personalized_pagerank"},
        "layout": {"zorder_layout", "zorder_streaming_ingest"},
        "skew": {"ppjoin_skewed_pairs", "grid_knn_skewed"},
    }
    for fam, members in families.items():
        assert members <= first, f"family {fam} dropped from driver-checked window"


def test_registry_consistency():
    # every oracle belongs to a registered query; rows-only queries
    # are intentional (non-SQL-expressible semantics)
    assert set(ORACLES) <= set(QUERIES)
