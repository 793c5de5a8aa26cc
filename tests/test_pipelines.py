"""End-to-end EP pipelines on crafted mention/embedding fixtures."""

import pytest

MENTIONS = [
    # (idx, mention, left, right, entity)
    (0, "Barack Obama", "president", "spoke today", "E_OBAMA"),
    (1, "Barack Obama", "the leader", "visited", "E_OBAMA"),
    (2, "B. Obama", "president", "spoke", "E_OBAMA"),
    (3, "Paris", "city of", "in France", "E_PARIS"),
    (4, "Paris", "went to", "France", "E_PARIS"),
    (5, "quantum xylophone", "weird", "artifact", "E_QX"),
]


@pytest.fixture(scope="module")
def mentions_df(spark):
    return spark.createDataFrame(
        MENTIONS,
        "mention_index long, mention string, left_context string, right_context string, entity_id string",
    )


def test_ep1_feature_baseline(spark, mentions_df):
    from streaming_cdc_spark.pipelines import ep1_feature_baseline

    out = ep1_feature_baseline(mentions_df, threshold=0.55)
    assign = {r["mention_index"]: r["cluster_id"] for r in out["assignments"].collect()}
    # identical surfaces cluster; near-identical ('B. Obama') joins via bigrams
    assert assign[0] == assign[1] == assign[2]
    assert assign[3] == assign[4]
    assert assign[5] not in (assign[0], assign[3])
    muc = out["muc"].first()
    assert muc["muc_f1"] == pytest.approx(1.0, abs=1e-6)
    b3 = out["b3"].first()
    assert b3["b3_f1"] == pytest.approx(1.0, abs=1e-6)
    ceaf = out["ceaf_e"].first()
    assert ceaf["ceaf_f1"] == pytest.approx(1.0, abs=1e-6)


def test_ep2_nn_threshold(spark):
    from streaming_cdc_spark.pipelines import ep2_nn_threshold

    rows = [
        (0, [1.0, 0.0], "A"),
        (1, [0.99, 0.05], "A"),
        (2, [0.0, 1.0], "B"),
        (3, [0.05, 0.99], "B"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = ep2_nn_threshold(df, threshold=0.9)
    assert out["muc"].first()["muc_f1"] == pytest.approx(1.0, abs=1e-6)
    errors = out["errors"].first()
    assert errors["conflated"] == 0 and errors["divided"] == 0


def test_ep3_grinch(spark):
    import numpy as np

    from streaming_cdc_spark.pipelines import ep3_grinch

    rng = np.random.default_rng(2)
    rows = [
        (i, [float(x) for x in (np.eye(3)[i % 3] + rng.normal(scale=0.04, size=3))], f"L{i % 3}")
        for i in range(18)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = ep3_grinch(df, cut_threshold=0.9)
    assert out["purity"].first()["purity"] > 0.95
    assert out["b3"].first()["b3_f1"] == pytest.approx(1.0, abs=1e-3)
    # dendrogram is a proper binary tree: one root, n-1 internal nodes
    edges = out["dendrogram"]
    assert edges.filter("parent_uid is null").count() == 1
