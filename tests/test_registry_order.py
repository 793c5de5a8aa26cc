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
    # r9 rotation (VERDICT r8 #1): ALL 50 slots hold never-before-
    # driver-verified full oracles — the remaining backlog after r8
    # (62 queries) minus 12 with close already-verified siblings.
    # Rotated-out queries all hold archived CORRECTNESS_r01-r08 rows
    # and stay registered + locally gated + benched. Family reps
    # below reflect the post-rotation window.
    families = {
        "streaming_output_modes": {"streaming_complete_mode_topk"},
        "profile": {"column_profile", "constraint_checks",
                    "fk_candidate_profile"},
        "sketch_bounds": {"approx_distinct_bounds",
                          "minhash_recall_calibration"},
        "dedup": {"near_dup_resolution", "benchmark_contamination",
                  "normalized_dedup", "span_dedup_stats",
                  "progressive_resolution", "bloom_incremental_matches"},
        "text_quality": {"ngram_repetition_stats", "quality_filter",
                         "redaction_stats"},
        "retrieval": {"phrase_match_postings"},
        "ann": {"lsh_multiprobe_pairs", "embedding_quantization",
                "kmeans_update", "ivf_recall_calibration"},
        "coref_ep2": {"ep2_cluster_summary",
                      "ep2_streaming_linker_replay"},
        "temporal": {"user_sessions", "scd2_user_value",
                     "hourly_ffill_series", "time_to_convert",
                     "time_weighted_value", "ewma_user_value"},
        "windows": {"hopping_window_counts", "hopping_distinct_users",
                    "user_range_frame_sums"},
        "analytics": {"value_histogram_bins", "weighted_median_value",
                      "benford_digit_profile", "robust_outliers",
                      "user_series_similarity", "event_path_trigrams"},
        "graph": {"resource_allocation_links"},
        "clustering": {"label_centroid_outliers"},
        "training_pipeline": {"token_budget_selection", "doc_chunks",
                              "sequence_packing", "training_mix_counts",
                              "corpus_shards", "temperature_mix",
                              "length_curriculum", "negative_pair_sample"},
        "tokenizer": {"unigram_logprob"},
        "sampling": {"stratified_sample_counts", "weighted_sample_topk"},
    }
    for fam, members in families.items():
        assert members <= first, f"family {fam} dropped from driver-checked window"


def test_registry_consistency():
    # every oracle belongs to a registered query; rows-only queries
    # are intentional (non-SQL-expressible semantics)
    assert set(ORACLES) <= set(QUERIES)
