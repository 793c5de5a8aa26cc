"""Registry-wide physical-plan audit: build every registered query's
plan at sf0.001 and fail on scale red flags.

Red flags:
- CartesianProduct anywhere (an unkeyed all-pairs join);
- a Window fed directly by an Exchange SinglePartition (global-order
  window collapsing to one task);
- BroadcastNestedLoopJoin outside the whitelist below (legitimate
  only for one-row scalar broadcasts: metric denominators, corpus
  totals, mean-weight pruning thresholds — and the explicitly
  documented small-n series self-join).

Run: python tools/audit_plans.py    (exit 0 = clean)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# BroadcastNestedLoopJoin is acceptable here: every entry joins a
# ONE-ROW (or documented tiny) broadcast side.
# Spark interposes a Sort between a Window and its Exchange
# (requiredChildOrdering), so match Window -> (Sort ->)? Exchange
# SinglePartition. Line prefixes are tree-drawing runs that differ by
# branch position — '+- ' on a straight spine but ':  +- ' / ':- '
# inside a join's LEFT branch — so consume any mix of space/':'/'+'/'-'
# before the operator name ('*(n)' codegen tags too).
_PREFIX = r"[\s:+\-]*(?:\*\(\d+\) )?"
SINGLE_PARTITION_WINDOW_RE = re.compile(
    r"Window .*\n(?:" + _PREFIX + r"Sort .*\n)?" + _PREFIX + r"Exchange SinglePartition"
)


def has_single_partition_window(plan: str) -> bool:
    return SINGLE_PARTITION_WINDOW_RE.search(plan) is not None


BNLJ_WHITELIST = {
    "muc_prf",  # scalar metric denominator
    "conflation_errors",  # scalar denominator
    "grinch_purity",  # scalar p* total
    "dendrogram_purity_fixture",  # same scalar p* total, fixture tree
    "quality_decile_curriculum",  # scalar corpus count
    "meta_blocking_pairs",  # scalar mean edge weight
    "cdc_capture_diff",  # scalar mid-log seq (one-row MAX//2 broadcast)
    "phrase_match_postings",  # one-row phrase (w1, w2) broadcast filter
    "ivf_recall_calibration",  # one-row x one-row (hits, possible) scalar join
    "unigram_logprob",  # scalar vocab totals
    "bigram_logprob",  # scalar vocab totals
    "user_series_similarity",  # documented small-n series self-join
    "bm25_topk",  # one-row corpus-stats broadcast (N, sum_dl, df_t)
    "zorder_layout",  # one-row global min/max bounds broadcast
    "record_linkage_scores",  # one-row Fellegi-Sunter u-stats broadcast
    "ari_score",  # four one-row scalar sums (P, A, B, n) crossJoined
    "approx_quantile_bounds",  # one-row (n, approx, rank) scalar broadcasts
    "equidepth_histogram",  # one-row global row count broadcast (bin sizing)
    "category_drift_chisq",  # one-row N total + one-row chi2 total broadcasts
    "heavy_hitters_bounds",  # one-row stream-total (bound) broadcast
    "collocation_pmi",  # one-row token/bigram corpus totals broadcasts
    "value_histogram_bins",  # one-row global min/max bounds broadcast
    "streaming_heavy_hitters",  # one-row stream-total (bound) broadcast
    "basket_part_pairs",  # one-row order-total broadcast (lift denominator)
    "benford_digit_profile",  # one-row grand-total broadcast (proportion denom)
}


def main() -> int:
    from streaming_cdc_spark.queries import QUERIES
    from streaming_cdc_spark.session import get_spark

    spark = get_spark("audit_plans")
    bad: list[str] = []
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: plan build failed: {str(e)[:100]}")
            continue
        if "CartesianProduct" in plan:
            bad.append(f"{name}: CartesianProduct")
        if has_single_partition_window(plan):
            bad.append(f"{name}: single-partition Window")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_WHITELIST:
            bad.append(f"{name}: BroadcastNestedLoopJoin (not whitelisted)")
    if bad:
        print("\n".join(bad))
        print(f"{len(bad)} violations")
        return 1
    print(f"clean: {len(QUERIES)} query plans, 0 violations")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
