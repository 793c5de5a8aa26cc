"""Text-analysis operators on crafted micro-fixtures."""

from pyspark.sql import functions as F

from streaming_cdc_spark.operators import text as T


def test_quality_features(spark):
    df = spark.createDataFrame([(0, "the cat sat on the mat")], "doc_id long, text string")
    row = T.quality_features(df).first()
    assert row["n_tokens"] == 6
    assert row["avg_token_len"] == round((3 + 3 + 3 + 2 + 3 + 3) / 6, 4)
    assert row["stopword_ratio"] == round(3 / 6, 6)  # the, on, the
    assert row["uniq_token_ratio"] == round(5 / 6, 6)


def test_language_id(spark):
    df = spark.createDataFrame(
        [(0, "the cat and dog of mine"), (1, "el gato de la casa"), (2, "nothing matches here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["p"] for r in df.select("doc_id", T.language_id_ngram("text").alias("p")).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "en"  # all-zero tie resolves to first language


def test_char_fingerprint_shift_invariance(spark):
    # identical content -> identical fingerprint; a shared long run
    # usually shares the min 5-gram (winnowing property, not asserted)
    df = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "abcdefghij"), (2, "zz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fingerprint"] for r in T.doc_fingerprints(df).collect()}
    assert got[0] == got[1]
    assert got[2] is not None  # short doc falls back to one truncated gram


def test_token_histogram(spark):
    df = spark.createDataFrame([(0, "b a b c b a")], "doc_id long, text string")
    rows = T.token_histogram(df, top_n=2).collect()
    assert [(r["token"], r["n"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        ("b", 3, 1),
        ("a", 2, 2),
    ]


def test_media_stats(spark):
    df = spark.createDataFrame(
        [(0, "abc", "s1"), (1, "defg", "s1"), (2, "abc", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in T.media_stats(df).collect()}
    assert got["s1"]["n_blobs"] == 2
    assert got["s1"]["total_bytes"] == 7
    assert got["s1"]["n_distinct_hashes"] == 2
    assert got["s2"]["total_bytes"] == 3


def test_ngram_repetition(spark):
    # "a b a b a" -> bigrams: "a b","b a","a b","b a" = 4 total, 2 distinct
    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "x y z"), (2, "solo")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in T.ngram_repetition(df, n=2).collect()}
    assert got[0]["n_ngrams"] == 4
    assert got[0]["n_distinct_ngrams"] == 2
    assert got[0]["top_ngram_count"] == 2
    assert got[0]["dup_ngram_frac"] == 0.5
    assert got[1]["dup_ngram_frac"] == 0.0
    # single-token doc degenerates to one unigram "shingle", no dups
    assert got[2]["n_ngrams"] == 1
    assert got[2]["dup_ngram_frac"] == 0.0


def test_hash_sample_deterministic_and_disjoint(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in T.hash_sample(df, 10).collect()}
    b = {r["doc_id"] for r in T.hash_sample(df, 10).collect()}
    assert a == b  # same salt -> same subset
    assert 50 < len(a) < 200  # ~10% of 1000
    c = {r["doc_id"] for r in T.hash_sample(df, 10, salt="other").collect()}
    assert c != a  # independent draw under a different salt
    # rate monotonicity: a 10% sample is a subset of the 30% sample
    d = {r["doc_id"] for r in T.hash_sample(df, 30).collect()}
    assert a <= d


def test_training_mix_rates(spark):
    df = spark.createDataFrame(
        [(i, ["sA", "sB", "sC"][i % 3]) for i in range(3000)],
        "doc_id long, source string",
    )
    out = T.training_mix(df, {"sA": 100, "sB": 50}).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    assert got["sA"] == 1000  # 100% kept
    assert 350 < got["sB"] < 650  # ~50%
    assert "sC" not in got  # unlisted source dropped


def test_pack_sequences(spark):
    # 5 docs x 100 tokens, budget 250 -> starts at 0,100,200,300,400
    # -> seq_ids 0,0,0,1,1
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 100)) for i in range(5)], "doc_id long, text string"
    )
    rows = sorted(T.pack_sequences(df, budget=250).collect(), key=lambda r: r["doc_id"])
    assert [r["seq_id"] for r in rows] == [0, 0, 0, 1, 1]
    assert [r["cum_tokens"] for r in rows] == [100, 200, 300, 400, 500]


def test_chunk_documents(spark):
    # 10 tokens, chunk=4, overlap=2 -> stride 2, starts 1,3,5,7,9
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b")],
        "doc_id long, text string",
    )
    rows = T.chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    d0 = sorted((r["chunk_id"], r["n_tokens"]) for r in rows if r["doc_id"] == 0)
    assert d0 == [(0, 4), (1, 4), (2, 4), (3, 4), (4, 2)]
    d1 = [(r["chunk_id"], r["n_tokens"]) for r in rows if r["doc_id"] == 1]
    assert d1 == [(0, 2)]  # short doc: one truncated chunk


def test_pack_sequences_exact(spark):
    """Every sequence except the last carries exactly `budget` tokens,
    and straddling docs split across the boundary."""
    import pyspark.sql.functions as F

    # 3 docs of 100 tokens, budget 80: doc0 -> seq0(80)+seq1(20),
    # doc1 -> seq1(60)+seq2(40), doc2 -> seq2(40)+seq3(60)
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 100)) for i in range(3)], "doc_id long, text string"
    )
    out = T.pack_sequences_exact(df, budget=80)
    per_seq = {
        r["seq_id"]: r["total"]
        for r in out.groupBy("seq_id").agg(F.sum("tokens_in_seq").alias("total")).collect()
    }
    assert per_seq == {0: 80, 1: 80, 2: 80, 3: 60}
    slices = {(r["doc_id"], r["seq_id"]): r["tokens_in_seq"] for r in out.collect()}
    assert slices[(0, 0)] == 80 and slices[(0, 1)] == 20
    assert slices[(1, 1)] == 60 and slices[(1, 2)] == 40


def test_regex_redact(spark):
    df = spark.createDataFrame(
        [(0, "mail me at a.b@test.com or c@d.org please"),
         (1, "no pii here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in T.regex_redact(
        df, {"email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"}
    ).collect()}
    assert got[0]["n_email"] == 2
    assert got[1]["n_email"] == 0
    assert got[0]["redacted_len"] == len(
        "mail me at [REDACTED] or [REDACTED] please")
    assert got[1]["redacted_len"] == len("no pii here")


def test_token_budget_selection(spark):
    # doc 1 all-distinct (score 1.0), doc 0 repetitive, doc 2 middle
    df = spark.createDataFrame(
        [(0, "w w w w w w"), (1, "a b c d"), (2, "x y x y")],
        "doc_id long, text string",
    )
    got = [(r["doc_id"], r["cum_tokens"]) for r in
           T.token_budget_selection(df, budget=8)
           .orderBy("cum_tokens").collect()]
    # order: doc1 (1.0, 4 tokens, cum 4) -> doc2 (0.5, cum 8) -> doc0
    # (0.1667, cum 14 > 8 dropped)
    assert got == [(1, 4), (2, 8)]


def test_shard_corpus_invariants(spark):
    from streaming_cdc_spark.operators.text import shard_corpus

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "doc_id long, text string")
    got = shard_corpus(docs, n_shards=4).collect()
    assert len(got) == 200 and len({r["doc_id"] for r in got}) == 200
    by_shard = {}
    for r in got:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # contiguous 1..n positions per shard; all four shards populated
    assert len(by_shard) == 4
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic: same assignment on re-run
    again = shard_corpus(docs, n_shards=4).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in got} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in again
    }


def test_corpus_diff_classes(spark):
    from streaming_cdc_spark.operators.text import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_bpe_pair_counts_micro(spark):
    from streaming_cdc_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame([(0, "abab ab x")], "doc_id long, text string")
    got = {r["pair"]: (r["n"], r["rank"]) for r in bpe_pair_counts(docs, top_n=10).collect()}
    # 'abab' -> ab,ba,ab ; 'ab' -> ab ; 'x' single char contributes nothing
    assert got["ab"] == (3, 1)
    assert got["ba"] == (1, 2)
    assert "x" not in got


def test_unigram_logprob_uniform(spark):
    import math

    from streaming_cdc_spark.operators.text import unigram_logprob

    # four equally frequent tokens -> every doc's mean logprob = ln(1/4)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["mean_logprob_r"] for r in unigram_logprob(docs).collect()}
    want = round(math.log(1 / 4), 6)
    assert got == {0: want, 1: want}


def test_stratified_take_quota_and_determinism(spark):
    from streaming_cdc_spark.operators.text import stratified_take

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    got = stratified_take(docs, per_group=5, group_col="source").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["take_rank"])
    assert set(by_src) == {"s0", "s1", "s2"}
    for ranks in by_src.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]
    again = stratified_take(docs, per_group=5, group_col="source").collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in again}


def test_bigram_logprob_uniform(spark):
    import math

    from streaming_cdc_spark.operators.text import bigram_logprob

    # one doc "a b a b": bigrams (a,b) x2, (b,a) x1; V=2
    docs = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    got = bigram_logprob(docs).collect()[0]
    assert got["n_bigrams"] == 3
    # P(b|a) = (2+1)/(2+2), P(a|b) = (1+1)/(1+2)
    want = round((2 * math.log(3 / 4) + math.log(2 / 3)) / 3, 6)
    assert got["mean_logprob_r"] == want
    # single-token docs have no bigram evidence -> no row
    single = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert bigram_logprob(single).count() == 0


def test_bm25_scores_golden(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x z z"), (2, "w w w")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in T.bm25_scores(docs, ("x", "y"), k1=1.5, b=0.75).collect()
    }
    # N=3, avgdl=3, df_x=2, df_y=1; every dl==avgdl so norm = k1
    idf_x = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    idf_y = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    exp0 = idf_x * (2 * 2.5) / (2 + 1.5) + idf_y * (1 * 2.5) / (1 + 1.5)
    exp1 = idf_x * (1 * 2.5) / (1 + 1.5)
    assert got[0]["bm25"] == round(exp0, 6)
    assert got[1]["bm25"] == round(exp1, 6)
    assert got[2]["bm25"] == 0.0  # no query terms at all
    assert (got[0]["dl"], got[0]["tf_x"], got[0]["tf_y"]) == (3, 2, 1)


def test_gopher_quality_flags_rules(spark):
    """One doc per rule violation; the clean doc passes everything."""
    from streaming_cdc_spark.operators.text import gopher_quality_flags

    clean = "the quality dataset filters documents and tokens of training in corpora on average " * 2
    rows = [
        (0, clean.strip()),
        (1, "the of and " + "word " * 2),          # too few words (min 10)
        (2, "the of " + "supercalifragilistic " * 20),  # mean word len > 10
        (3, "the of in a " + "# # # # # # # # # # # # # # # #"),  # symbols
        (4, "the of is on\n" + "\n".join("- bullet line" for _ in range(20))),
        (5, "the of is on\n" + "\n".join("trailing line..." for _ in range(9))),
        (6, "the of a " + "123 456 789 000 111 222 333 444 555 666"),  # alpha
        (7, "zebra quark " + "lorem ipsum dolor sit amet foo bar baz " * 2),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_flags(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_words=10,
        ).collect()
    }
    assert got[0]["keep"] is True
    assert got[1]["ok_word_count"] is False
    assert got[2]["ok_mean_word_len"] is False
    assert got[3]["ok_symbol_ratio"] is False and got[3]["ok_alpha_words"] is False
    assert got[4]["ok_bullet_lines"] is False
    assert got[5]["ok_ellipsis_lines"] is False
    assert got[6]["ok_alpha_words"] is False
    assert got[7]["ok_stopwords"] is False
    for i in range(1, 8):
        assert got[i]["keep"] is False, i


def test_content_defined_chunks_shift_invariant(spark):
    """The defining CDC-chunking property: prepending text changes
    only the chunks up to the first boundary after the edit — every
    later chunk hash is IDENTICAL despite the offset shift (a
    fixed-width chunker would change every chunk). Also: short docs
    (< k) are one whole-doc chunk, and chunk lengths tile the doc."""
    import hashlib

    from streaming_cdc_spark.operators.text import content_defined_chunks

    base = " ".join(f"tok{(i * 31) % 57}word{i % 13}" for i in range(400))
    shifted = "PREFIXINSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted), (3, "tiny")], "doc_id long, text string"
    )
    ch = content_defined_chunks(df, k=8, modulus=64)
    rows = ch.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_hash"])
        )
    for d in by_doc:
        by_doc[d].sort()
    # tiling: lengths sum to doc length, indices contiguous from 1
    assert sum(l for _, l, _ in by_doc[1]) == len(base)
    assert [i for i, _, _ in by_doc[1]] == list(range(1, len(by_doc[1]) + 1))
    # short doc: one chunk, hash of the whole text
    assert len(by_doc[3]) == 1 and by_doc[3][0][1] == len("tiny")
    # shift invariance: the multiset of chunk hashes after the first
    # boundary is shared — at least 80% of base's chunks reappear
    h1 = [h for _, _, h in by_doc[1]]
    h2 = {h for _, _, h in by_doc[2]}
    shared = sum(1 for h in h1 if h in h2)
    assert shared >= int(0.8 * len(h1))
    assert len(h1) > 5  # the fixture actually chunks


def test_chunk_dedup_stats_flags_shared_chunks(spark):
    """Two docs sharing a long middle section show shared chunks with
    matching shared_len; a unique doc shows zero."""
    from streaming_cdc_spark.operators.text import chunk_dedup_stats

    mid = " ".join(f"common{(i * 17) % 43}x{i % 7}" for i in range(300))
    df = spark.createDataFrame(
        [
            (1, "aaa start one " + mid + " tail one"),
            (2, "completely different opening words " + mid + " other end"),
            (3, " ".join(f"unique{i}" for i in range(200))),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in chunk_dedup_stats(df).collect()}
    assert got[1]["n_shared"] > 0
    assert got[2]["n_shared"] > 0
    assert got[3]["n_shared"] == 0 and got[3]["shared_len"] == 0
    assert got[1]["shared_len"] > 0
    assert got[1]["n_distinct"] <= got[1]["n_chunks"]


def test_bpe_merge_rounds_hand_computed(spark):
    """Three BPE rounds on a corpus small enough to train by hand:
    round 1 picks (a,a) from the overlap-counted run, the greedy
    left-to-right merge collapses 'a a a a' to two 'a+a' tokens
    (non-overlap), round 2 picks (a,b) over the MERGED corpus, and
    round 3's three-way n=1 tie resolves by (a, b) ascending —
    selection, overlap handling, recounting and tie-break all
    pinned."""
    from streaming_cdc_spark.operators.text import bpe_merge_rounds

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b a b"), (3, "x y")],
        "doc_id long, text string",
    )
    got = {
        r["merge_round"]: (r["pair_a"], r["pair_b"], r["n_pairs"])
        for r in bpe_merge_rounds(docs, rounds=3).collect()
    }
    assert got == {
        1: ("a", "a", 3),
        2: ("a", "b", 2),
        3: ("a+a", "a+a", 1),
    }


def test_bpe_merge_fold_overlap_runs(spark):
    """The fold's non-overlap rule on pathological runs: 'a a a'
    merges (1,2) and leaves the third 'a' unmerged; 'a a a a a'
    yields two merges + a leftover. Verified via round-2 counts (the
    merged corpus is what round 2 sees)."""
    from streaming_cdc_spark.operators.text import bpe_merge_rounds

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "a a a a a")], "doc_id long, text string"
    )
    rows = {
        r["merge_round"]: (r["pair_a"], r["pair_b"], r["n_pairs"])
        for r in bpe_merge_rounds(docs, rounds=2).collect()
    }
    # round 1: overlapping count of (a,a) = 2 + 4
    assert rows[1] == ("a", "a", 6)
    # merged: [a+a, a] and [a+a, a+a, a] -> round-2 pairs:
    # (a+a,a)x1, (a+a,a+a)x1, (a+a,a)x1 -> top (a+a, a) n=2
    assert rows[2] == ("a+a", "a", 2)


def test_negative_pairs_never_self_and_cover_k(spark):
    from streaming_cdc_spark.queries.text import negative_pair_sample

    from streaming_cdc_spark.tables import load

    out = negative_pair_sample(spark, "/root/testdata/sf0.001").localCheckpoint()
    n_docs = load(spark, "/root/testdata/sf0.001", "documents").count()
    assert out.count() == 2 * n_docs  # k=2 per anchor, no rejection loss
    assert out.filter("doc_id = neg_doc_id").count() == 0  # arithmetic, not luck
    # both epochs of negatives present per anchor
    from pyspark.sql import functions as F

    per = out.groupBy("doc_id").agg(F.countDistinct("j").alias("nj"))
    assert per.filter("nj <> 2").count() == 0
