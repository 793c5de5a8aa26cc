"""S12 model persistence + EP2 encode-and-cluster end to end."""

import pytest


def test_vectorizer_save_load(spark, tmp_path):
    from streaming_cdc_spark.operators.vectorize import (
        fit_char_bigram_tf,
        load_model,
        save_model,
        transform_char_bigram,
    )

    df = spark.createDataFrame([(0, "obama"), (1, "osama")], "id long, mention string")
    model = fit_char_bigram_tf(df, "mention")
    path = str(tmp_path / "model")
    save_model(model, path)
    back = load_model(path)
    a = transform_char_bigram(model, df, "mention").select("id", "mention_vec").collect()
    b = transform_char_bigram(back, df, "mention").select("id", "mention_vec").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_ep2_encode_and_cluster(spark):
    from streaming_cdc_spark.pipelines import ep2_encode_and_cluster

    rows = [
        (0, "Barack Obama", "president of the", "United States", "E_OBAMA"),
        (1, "Barack Obama", "president of the", "United States", "E_OBAMA"),
        (2, "Paris", "capital of", "France", "E_PARIS"),
        (3, "Paris", "capital of", "France", "E_PARIS"),
    ]
    df = spark.createDataFrame(
        rows,
        "mention_index long, mention string, left_context string, right_context string, entity_id string",
    )
    out = ep2_encode_and_cluster(df, threshold=0.95)
    assert out["summary"].first()["mean_f1"] == pytest.approx(1.0, abs=1e-6)
