"""Hash-projection encoder (V4-V6 surface) + P8 recentring."""

import numpy as np
import pytest

from streaming_cdc_spark.operators.encoder import hash_encode_mentions, recenter_tokens


def test_recenter_budget_spillover():
    # P8: underused right budget spills to the left (utils.py:78-104)
    left = [f"l{i}" for i in range(10)]
    right = ["r0"]
    l, r = recenter_tokens(left, right, budget_per_side=4)
    assert r == ["r0"]
    assert l == left[-7:]  # 4 + (4 - 1) spilled
    # symmetric case
    l2, r2 = recenter_tokens(["l0"], [f"r{i}" for i in range(10)], 4)
    assert l2 == ["l0"] and len(r2) == 7
    # both sides rich: exactly the budget
    l3, r3 = recenter_tokens(left, [f"r{i}" for i in range(10)], 4)
    assert len(l3) == 4 and len(r3) == 4


def test_hash_encoder(spark):
    rows = [
        (0, "Barack Obama", "president", "spoke"),
        (1, "Barack Obama", "president", "spoke"),
        (2, "xylophone", "weird", "noise"),
    ]
    df = spark.createDataFrame(
        rows, "mention_index long, mention string, left_context string, right_context string"
    )
    got = {r["mention_index"]: np.array(r["embedding"]) for r in hash_encode_mentions(df, dim=16).collect()}
    # identical inputs -> identical embeddings (deterministic)
    assert np.allclose(got[0], got[1])
    # unit norm
    for v in got.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)
    # different content -> different direction
    assert float(got[0] @ got[2]) < 0.9
