"""Vector Column expressions vs numpy."""

import numpy as np
import pytest

from streaming_cdc_spark.functions import cosine, dot, l2_norm, l2_normalize


def test_vector_expressions(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        cosine("a", "b").alias("c"),
        l2_normalize("a").alias("an"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert row["d"] == pytest.approx(na @ nb)
    assert row["na"] == pytest.approx(np.linalg.norm(na))
    assert row["c"] == pytest.approx(na @ nb / np.linalg.norm(na) / np.linalg.norm(nb))
    assert np.allclose(row["an"], na / np.linalg.norm(na))


def test_cosine_top_k(spark):
    from streaming_cdc_spark.operators.similarity import cosine_top_k

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    got = cosine_top_k(df.filter("vec_id < 3"), df, k=4).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        order = sorted((i for i in range(30) if i != q), key=lambda i: (-sims[q, i], i))[:4]
        rows = sorted((r for r in got if r["q"] == q), key=lambda r: r["rank"])
        assert [r["neighbor"] for r in rows] == order


def test_cosine_top_k_blocked_matches_broadcast(spark):
    """The distributed blocked path must emit the IDENTICAL result set
    as the broadcast path — exactness at scale, not approximation."""
    from streaming_cdc_spark.operators.similarity import cosine_top_k

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 5))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    a = cosine_top_k(df, df, k=3, strategy="broadcast").orderBy("q", "rank").collect()
    b = cosine_top_k(df, df, k=3, strategy="blocked", block_rows=13).orderBy(
        "q", "rank"
    ).collect()
    assert a == b


def test_quantization_roundtrip(spark):
    from streaming_cdc_spark.functions.vectors import (
        quant_abs_error,
        quant_scale,
        quantize,
    )

    df = spark.createDataFrame(
        [([1.0, -0.5, 0.25],), ([0.0, 0.0, 0.0],)], "v array<double>"
    )
    rows = df.select(
        quant_scale("v").alias("s"),
        quantize("v", quant_scale("v")).alias("q"),
        quant_abs_error("v", quant_scale("v")).alias("e"),
    ).collect()
    # max|v|=1.0 -> scale=1/127; codes = round(v*127)
    assert rows[0]["q"] == [127, -63, 32]
    assert rows[0]["e"] <= rows[0]["s"] / 2 + 1e-12  # error bound scale/2
    assert rows[1]["q"] == [0, 0, 0]  # zero vector stays finite


def test_multiprobe_recall_superset(spark):
    """Hamming-1 probing must recover a superset of the single-bucket
    candidates and improve recall vs the exact edge set."""
    import __spark_entry__ as e

    q = e.queries()
    sf = "/root/testdata/sf0.001"
    single = {(r["u"], r["v"]) for r in q["lsh_bucket_pairs"](spark, sf).collect()}
    multi = {(r["u"], r["v"]) for r in q["lsh_multiprobe_pairs"](spark, sf).collect()}
    assert single <= multi
    exact = {
        (r["u"], r["v"])
        for r in q["cosine_edges"](spark, sf).collect()
        if r["sim_r"] >= 0.2
    }
    if exact:
        assert len(multi & exact) / len(exact) > len(single & exact) / len(exact) * 0.99
        assert len(multi & exact) >= len(single & exact)
