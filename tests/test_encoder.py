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


def test_encode_mentions_dispatch(spark):
    """encode_mentions: model_name=None takes the hash path (identical
    embeddings); a model name without torch/transformers fails fast
    with an install hint BEFORE any Spark job."""
    from streaming_cdc_spark.operators.encoder import (
        encode_mentions,
        hash_encode_mentions,
        have_transformers,
    )

    rows = [(0, "Barack Obama", "president", "spoke")]
    df = spark.createDataFrame(
        rows,
        "mention_index long, mention string, left_context string, right_context string",
    )
    a = encode_mentions(df, dim=16).collect()[0]["embedding"]
    b = hash_encode_mentions(df, dim=16).collect()[0]["embedding"]
    assert np.allclose(a, b)
    if not have_transformers():
        with pytest.raises(RuntimeError, match="transformers"):
            encode_mentions(df, model_name="bert-base-uncased")


def test_encode_mentions_real_model(spark):
    """Real transformer path (skips without torch/transformers): unit
    norm, determinism, and the (id, array<double>) contract match the
    hash path's."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from streaming_cdc_spark.operators.encoder import encode_mentions

    rows = [
        (0, "Barack Obama", "president", "spoke"),
        (1, "Barack Obama", "president", "spoke"),
    ]
    df = spark.createDataFrame(
        rows,
        "mention_index long, mention string, left_context string, right_context string",
    )
    got = {
        r["mention_index"]: np.array(r["embedding"])
        for r in encode_mentions(
            df, model_name="sshleifer/tiny-distilbert-base-cased"
        ).collect()
    }
    assert np.allclose(got[0], got[1])
    for v in got.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-6)
