"""Dedup operators on crafted micro-fixtures."""

from pyspark.sql import functions as F

from streaming_cdc_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different words entirely here now"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_word_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    row = df.select(D.word_shingles(D.tokens("text")).alias("s")).first()
    assert row["s"] == ["a b c", "b c d"]
    short = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    assert short.select(D.word_shingles(D.tokens("text")).alias("s")).first()["s"] == ["a b"]


def test_exact_dedup(spark):
    got = D.exact_dedup_groups(docs_df(spark), F.col("text")).collect()
    assert len(got) == 1
    assert got[0]["n_dups"] == 2
    assert got[0]["canonical_doc_id"] == 0


def test_ngram_jaccard(spark):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_r"]
        for r in D.ngram_jaccard_pairs(docs_df(spark), threshold=0.1).collect()
    }
    # docs 0 and 3 identical: jaccard 1.0; 0-1 and 1-3 share 6 of 8 shingles
    assert got[(0, 3)] == 1.0
    assert got[(0, 1)] == got[(1, 3)] == 0.75
    assert (0, 2) not in got


def test_minhash_exact_dups_share_all_bands(spark):
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in D.minhash_band_candidates(docs_df(spark), num_hashes=4).collect()
    }
    assert got[(0, 3)] == 4  # identical shingle sets -> all bands agree
    assert (0, 2) not in got or got[(0, 2)] < 4


def test_simhash(spark):
    got = {r["doc_id"]: r["simhash"] for r in D.simhash_fingerprints(docs_df(spark)).collect()}
    assert got[0] == got[3]  # identical text -> identical fingerprint
    assert got[0] != got[2]
    assert all(0 <= v < (1 << 32) for v in got.values())


def test_resolve_near_dups(spark):
    from streaming_cdc_spark.operators.dedup import resolve_near_dups

    docs = spark.createDataFrame(
        [(0, 10), (1, 11), (2, 12), (3, 13)], "doc_id long, n_chars long"
    )
    # 1 dups 0, 3 dups 1 -> greedy min-id keeps 0 and 2; 3 drops even
    # though its partner 1 was itself dropped (star rule, not closure)
    pairs = spark.createDataFrame([(0, 1), (1, 3)], "doc_a long, doc_b long")
    kept = sorted(r["doc_id"] for r in resolve_near_dups(docs, pairs).collect())
    assert kept == [0, 2]


def test_shingle_df_cap(spark):
    from streaming_cdc_spark.operators.dedup import (
        exploded_shingles,
        cap_shingle_df,
        ngram_jaccard_pairs,
    )

    # 10 docs all sharing one stopword run; docs 0/1 are exact dups
    rows = [(i, f"uniq{i} tok{i} the of and the of and") for i in range(2, 10)]
    rows += [(0, "same same same same the of and"), (1, "same same same same the of and")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = exploded_shingles(docs)
    capped = cap_shingle_df(sh, df_cap=5)
    # the 10-doc "the of and" shingle is gone; rarer shingles survive
    assert capped.filter("shingle = 'the of and'").count() == 0
    assert capped.count() < sh.count()
    # exact dups still pair up under the cap (they share rare shingles)
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, df_cap=5)
    assert [(r["doc_a"], r["doc_b"]) for r in pairs.collect()] == [(0, 1)]
