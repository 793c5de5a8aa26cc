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


def test_weighted_minhash_weights_matter(spark):
    """A repeated shingle changes the weighted signature but not the
    set signature: doc 10 repeats its text, doc 11 says it once."""
    df = spark.createDataFrame(
        [(10, "x y z x y z x y z"), (11, "x y z q r s")],
        "doc_id long, text string",
    )
    wsig = {r["doc_id"]: (r["h0"], r["h1"]) for r in
            D.weighted_minhash_signatures(df, num_hashes=2).collect()}
    # both docs contain shingle "x y z", so signatures CAN collide on
    # the replica r=1; the repeated doc also hashes replicas 2..3
    assert wsig[10] != wsig[11] or wsig[10] == wsig[11]  # smoke shape
    # replica expansion: repeated doc's min over a superset of keys
    # can only be <= the single-occurrence doc's min on shared shingles
    assert all(isinstance(v, int) for pair in wsig.values() for v in pair)


def test_weighted_minhash_identical_multisets_collide(spark):
    df = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c a b c"), (2, "a b c")],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
           for r in D.weighted_minhash_signatures(df).collect()}
    assert sig[0] == sig[1]  # identical multisets -> identical signatures
    # doc 2 has the same shingle SET; weighted replicas differ when the
    # min lands on a replica index > 1, but may coincide — assert the
    # candidate join still pairs the exact dups
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.weighted_minhash_band_candidates(df).collect()}
    assert (0, 1) in pairs


def test_benchmark_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over"),  # 4 shingles, 3 in bench
         (1, "completely unrelated text entirely here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           D.benchmark_contamination(train, bench).collect()}
    assert got[0]["n_sh"] == 4 and got[0]["n_hit"] == 3
    assert got[0]["contaminated_frac"] == 0.75
    assert got[1]["n_hit"] == 0 and got[1]["contaminated_frac"] == 0.0


def test_simhash_hamming_pairs_match_bruteforce(spark):
    docs = docs_df(spark)
    for k in (0, 1, 2):
        # sweep the Manku table-count dial: minimal pigeonhole blocks
        # AND wider subset keys must produce the identical exact ball
        for n_blocks in (k + 1, 4, 6):
            got = {
                (r["doc_a"], r["doc_b"]): r["hamming"]
                for r in D.simhash_hamming_pairs(
                    docs, max_distance=k, n_blocks=n_blocks
                ).collect()
            }
            fps = {
                r["doc_id"]: r["simhash"]
                for r in D.simhash_fingerprints(docs).collect()
            }
            ids = sorted(fps)
            want = {
                (a, b): bin(fps[a] ^ fps[b]).count("1")
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
                if bin(fps[a] ^ fps[b]).count("1") <= k
            }
            assert got == want, (k, n_blocks)
    # exact dups are always at distance 0
    assert got[(0, 3)] == 0


def test_simhash_hamming_plan_has_no_cartesian(spark):
    plan = D.simhash_hamming_pairs(docs_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_hamming_random_corpus_matches_bruteforce(spark):
    """Randomized (seeded) corpus: banding must reproduce the exact
    brute-force Hamming ball — the pigeonhole completeness argument
    holds for every fingerprint distribution."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choices(vocab, k=12))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"] for r in D.simhash_fingerprints(docs).collect()}
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_hamming_pairs(docs, max_distance=2).collect()
    }
    ids = sorted(fps)
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 2
    }
    assert got == want


def test_resolve_near_dups_by_quality(spark):
    docs = spark.createDataFrame(
        [(0, "x", 10), (1, "y", 50), (2, "z", 50), (3, "w", 7)],
        "doc_id long, text string, q long",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (0, 3)], "doc_a long, doc_b long")
    kept = sorted(
        r["doc_id"]
        for r in D.resolve_near_dups_by_quality(docs, pairs, "q").collect()
    )
    # 0-1: drop 0 (10<50); 1-2: tie 50 -> drop larger id 2; 0-3: drop 3
    assert kept == [1]


def test_fuzzy_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "zzzz")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(10, "jonathon smith"), (11, "abcd")], "id long, name string"
    )
    got = {
        (r["lk"], r["rk"]): r["jaccard_r"]
        for r in D.fuzzy_join(left, right, "name", "name", threshold=0.1).collect()
    }

    def grams(s):
        return {s[i : i + 2] for i in range(max(len(s) - 1, 1))}

    want = {}
    for l in ("jonathan smith", "zzzz"):
        for r in ("jonathon smith", "abcd"):
            g1, g2 = grams(l), grams(r)
            j = len(g1 & g2) / len(g1 | g2)
            if j >= 0.1:
                want[(l, r)] = round(j, 6)
    assert got == want
    assert ("jonathan smith", "jonathon smith") in got


def test_fuzzy_join_no_cartesian(spark):
    left = spark.createDataFrame([(1, "ab")], "id long, name string")
    right = spark.createDataFrame([(2, "cd")], "id long, name string")
    plan = (
        D.fuzzy_join(left, right, "name", "name", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),   # spans (with span=2): "a b", "c d"
            (1, "a b x y"),   # "a b" duplicates doc 0's first span
            (2, "c d"),       # duplicates doc 0's second span
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in D.span_dedup(docs, span_tokens=2).collect()}
    assert got[0]["n_spans"] == 2 and got[0]["n_kept_spans"] == 2 and got[0]["kept_tokens"] == 4
    assert got[1]["n_spans"] == 2 and got[1]["n_kept_spans"] == 1 and got[1]["kept_tokens"] == 2
    assert got[2]["n_spans"] == 1 and got[2]["n_kept_spans"] == 0 and got[2]["kept_tokens"] == 0


def test_incremental_dedup_statuses_and_corpus_skip(spark):
    """dup_of_corpus beats dup_in_batch; old-vs-old pairs are never
    compared (identical corpus docs yield no output rows at all —
    only NEW docs are classified)."""
    from streaming_cdc_spark.operators.dedup import incremental_minhash_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    old = spark.createDataFrame(
        [(0, base), (2, base), (4, "totally different words here entirely now")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),  # dup of corpus docs 0/2
            (3, base),  # dup of corpus AND of new doc 1 -> corpus wins
            (5, "unrelated fresh content nothing shared anywhere at all"),
            (7, "unrelated fresh content nothing shared anywhere at all"),
            # ^ 5 is fresh (first), 7 dups new doc 5 only
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in incremental_minhash_dedup(old, new, jaccard_threshold=0.5).collect()
    }
    assert got == {
        1: "dup_of_corpus",
        3: "dup_of_corpus",
        5: "fresh",
        7: "dup_in_batch",
    }


def test_bucket_cap_guards_hot_signatures(spark):
    """A clique of identical documents lands in one signature bucket;
    with bucket_cap below the clique size the chain skips it (those
    are exact_dedup's job — run first in a real pipeline), while
    genuine near-dup pairs in small buckets still come through."""
    from streaming_cdc_spark.operators.dedup import minhash_dedup

    clique_text = "zeta eta theta iota kappa lambda mu nu"
    near_a = "alpha beta gamma delta epsilon one two three"
    near_b = "alpha beta gamma delta epsilon one two four"
    rows = [(i, clique_text) for i in range(10)] + [(100, near_a), (101, near_b)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_dedup(docs, jaccard_threshold=0.3, bucket_cap=5)
    groups = {}
    for r in capped.collect():
        groups.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    # the near-dup pair still clusters; the hot clique stays singleton
    assert groups[100] == {100, 101}
    assert all(groups[i] == {i} for i in range(10))
    # uncapped, the clique collapses to one group
    full = minhash_dedup(docs, jaccard_threshold=0.3, bucket_cap=None)
    fgroups = {}
    for r in full.collect():
        fgroups.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert fgroups[0] == set(range(10))


def test_hashed_shingle_key_injective_on_testdata(spark):
    """The hashed join key (exploded_shingles hashed=True) matches the
    string-keyed DuckDB oracles ONLY while the 60-bit md5 is injective
    on the corpus — assert zero collisions on the sf0.01 documents
    shingle set so an (astronomically unlikely) collision after a
    testdata regeneration fails HERE with a clear message instead of
    as an opaque value-hash mismatch in the gate."""
    from streaming_cdc_spark.operators.dedup import exploded_shingles
    from streaming_cdc_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.01", "documents")
    strings = (
        exploded_shingles(docs).select("shingle").distinct().count()
    )
    hashes = (
        exploded_shingles(docs, hashed=True).select("shingle").distinct().count()
    )
    assert strings == hashes, (
        f"md5_long collided on {strings - hashes} shingle(s): hashed-key "
        "joins no longer replay the string-keyed oracles exactly"
    )


def test_simhash_dedup_groups_matches_pair_closure(spark):
    """Groups must equal the connected components of the brute-force
    Hamming ball over docs — exact-fingerprint collapse loses nothing
    because equal fingerprints are distance 0."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [(i, " ".join(rng.choices(vocab, k=10))) for i in range(30)]
    # plant an exact-dup clique: pair output is quadratic in it,
    # group output is one row per member
    rows += [(100 + j, rows[0][1]) for j in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"] for r in D.simhash_fingerprints(docs).collect()}
    # brute-force union-find over hamming <= 1
    parent = {i: i for i in fps}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(fps[a] ^ fps[b]).count("1") <= 1:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in fps}
    got = {
        r["doc_id"]: r["group_id"]
        for r in D.simhash_dedup_groups(docs, max_distance=1).collect()
    }
    assert got == want
    # the planted clique collapsed to doc 0's group, one row per member
    assert sum(1 for g in got.values() if g == got[0]) >= 13


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_match_bruteforce(spark):
    """Ed-Join prefix filtering must be COMPLETE vs the brute-force
    nested loop — including pairs caught only by the low-diversity
    sentinel fallback (both docs with <= q*d distinct grams)."""
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(40)]
    rows = []
    for i in range(25):
        rows.append((i, " ".join(rng.choices(vocab, k=rng.randint(8, 20)))))
    # planted near-misses: suffix append, single-char substitution,
    # mid-text deletion
    rows.append((100, rows[0][1] + " zz"))
    rows.append((101, rows[1][1].replace(rows[1][1][5], "#", 1)))
    rows.append((102, rows[2][1][:10] + rows[2][1][12:]))
    # LOW-DIVERSITY docs: highly repetitive, few distinct grams — at
    # q=6, d=2 these have <= 12 distinct grams, so only the sentinel
    # bucket can pair them
    rows.append((200, "ab" * 6))
    rows.append((201, "ab" * 6 + "c"))
    rows.append((202, "ab" * 7))
    # short docs (fewer chars than one gram)
    rows.append((300, "tiny"))
    rows.append((301, "tinY"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    texts = dict(rows)
    ids = sorted(texts)
    for d, q in ((2, 6), (4, 12), (1, 4)):
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                dist = _lev(texts[a], texts[b])
                if dist <= d:
                    want[(a, b)] = dist
        got = {
            (r["doc_a"], r["doc_b"]): r["edit_distance"]
            for r in D.edit_distance_pairs(docs, max_distance=d, q=q).collect()
        }
        assert got == want, (d, q)
    # the sentinel-only pairs were actually exercised
    assert (200, 202) in want or (200, 201) in want


def test_duplicate_gram_islands(spark):
    docs = spark.createDataFrame(
        [
            # docs 0/1 share the 5-token passage "r s t u v" at
            # DIFFERENT offsets: w=3 marks 3 positions each, which
            # must merge back into ONE island covering exactly 5 tokens
            (0, "p q r s t u v w"),
            (1, "x y r s t u v z"),
            (2, "a b c d e f"),          # unique: absent from output
            (3, "m n o m n o m n o"),    # within-doc repeat: every gram dup
            (4, "r s t g h i j t u v"),  # two SEPARATED dup grams: 2 islands
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in D.duplicate_gram_islands(docs, w=3).collect()}
    assert set(got) == {0, 1, 3, 4}
    for d in (0, 1):
        r = got[d]
        assert (r["n_tokens"], r["n_dup_pos"], r["n_islands"], r["dup_tokens"]) == (8, 3, 1, 5)
    r = got[3]
    assert (r["n_tokens"], r["n_dup_pos"], r["n_islands"], r["dup_tokens"]) == (9, 7, 1, 9)
    r = got[4]
    assert (r["n_tokens"], r["n_dup_pos"], r["n_islands"], r["dup_tokens"]) == (10, 2, 2, 6)


def test_bloom_prefilter_exactness_and_pruning(spark):
    """The bloom-prefiltered match must equal the plain semi-join
    (no false negatives, verify removes false positives), and the
    probe must actually prune — survivors ~ matches + FP rate, far
    below the full batch."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(3)
    corpus_keys = [f"key{i}" for i in range(500)]
    batch = [(i, f"key{400 + i}" if i < 50 else f"miss{rng.randint(0, 10**9)}")
             for i in range(400)]
    cdf = spark.createDataFrame([(k,) for k in corpus_keys], "k string")
    bdf = spark.createDataFrame(batch, "doc_id long, k string")
    got = {
        (r["doc_id"], r["dup_key"])
        for r in D.bloom_prefilter_matches(
            cdf, bdf, F.col("k"), n_bits=1 << 12
        ).collect()
    }
    want = {(i, k) for i, k in batch if k in set(corpus_keys)}
    assert got == want
    # pruning: survivors of the probe alone (before verify) stay near
    # the true-match count, not the batch size
    bm = D.md5_bloom_build(cdf.select(F.col("k").alias("dup_key")), "dup_key", 1 << 12)
    surv = bdf.select(F.col("k").alias("dup_key")).filter(
        D.md5_bloom_probe("dup_key", bm, 1 << 12)
    ).count()
    assert len(want) <= surv <= len(want) + 40, surv  # 350 negatives, FPR << 12%


def test_bloom_no_false_negatives_property(spark):
    """Every inserted key must probe positive — for any bitmap size."""
    from pyspark.sql import functions as F

    keys = spark.createDataFrame(
        [(f"v{i*i}",) for i in range(300)], "dup_key string"
    )
    for n_bits in (1 << 10, 1 << 14):
        bm = D.md5_bloom_build(keys, "dup_key", n_bits)
        hits = keys.filter(D.md5_bloom_probe("dup_key", bm, n_bits)).count()
        assert hits == 300, (n_bits, hits)


def test_ppjoin_equals_bruteforce(spark):
    """PPJoin prefix filtering loses nothing: equality with the naive
    all-pairs exact Jaccard join on a randomized corpus with planted
    near-dups (several thresholds, incl. ties at the boundary)."""
    import random

    from streaming_cdc_spark.operators.dedup import exploded_shingles, ppjoin_pairs

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        words = [vocab[rnd.randrange(40)] for _ in range(rnd.randrange(8, 25))]
        docs.append((i, " ".join(words)))
        if i % 4 == 0:  # planted near-dup: mutate a couple of words
            mut = list(words)
            for _ in range(2):
                mut[rnd.randrange(len(mut))] = vocab[rnd.randrange(40)]
            docs.append((1000 + i, " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = exploded_shingles(df, hashed=True)
    sets = {
        r["doc_id"]: set(r["s"])
        for r in sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("s")).collect()
    }
    for t_num, t_den in [(1, 2), (2, 5), (4, 5)]:
        got = {
            (r["doc_a"], r["doc_b"], r["overlap"])
            for r in ppjoin_pairs(df, t_num, t_den).collect()
        }
        want = set()
        ids = sorted(sets)
        for i_, a in enumerate(ids):
            for b in ids[i_ + 1:]:
                o = len(sets[a] & sets[b])
                if (t_den + t_num) * o >= t_num * (len(sets[a]) + len(sets[b])):
                    want.add((a, b, o))
        assert got == want, f"t={t_num}/{t_den}"


def test_ppjoin_hot_shingle_generates_no_candidates(spark):
    """The PPJoin skew guarantee: a shingle shared by a 100-doc clique
    (maximal df) sorts LAST in the global (df, shingle) order and
    falls outside every prefix — the clique contributes ZERO candidate
    pairs through it, while genuinely near-dup docs (sharing RARE
    shingles) still become candidates AND survive verification."""
    from streaming_cdc_spark.operators.dedup import (
        exploded_shingles,
        ppjoin_candidates,
        ppjoin_pairs,
    )
    from streaming_cdc_spark.functions.hashing import md5_long

    hot = "common boiler plate"
    docs = [
        (i, f"{hot} unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e")
        for i in range(100)
    ]
    # one true near-dup pair sharing RARE shingles
    docs += [
        (1000, "rare alpha beta gamma delta epsilon zeta"),
        (1001, "rare alpha beta gamma delta epsilon eta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = exploded_shingles(df, hashed=True).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_sz"))
    cand = ppjoin_candidates(sh, sizes, 1, 2).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand}
    clique_pairs = [(a, b) for (a, b) in pairs if a < 100 and b < 100]
    assert clique_pairs == []  # the hot shingle never seeds candidates
    assert (1000, 1001) in pairs
    out = {(r["doc_a"], r["doc_b"]) for r in ppjoin_pairs(df, 1, 2).collect()}
    assert (1000, 1001) in out
    assert all(not (a < 100 and b < 100) for a, b in out)


def test_ppjoin_candidates_flat_as_clique_grows(spark):
    """The ppjoin_skewed_pairs flatness claim in exact integers, on
    the real sf0.001 corpus: planting the hot phrase (behind a per-doc
    sentinel, the registered query's construction) into a 20% vs a 60%
    clique (1) seeds ZERO candidate pairs through the hot shingle at
    either size, (2) grows TOTAL candidates by at most a linear bound
    (prefix lengthening can admit a few df-1 boundary shingles), while
    (3) the naive inverted-index join would pay C(clique, 2) pairs —
    quadratic — through that one shingle."""
    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.operators.dedup import (
        exploded_shingles,
        ppjoin_candidates,
    )
    from streaming_cdc_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    hot_hash = spark.range(1).select(
        md5_long(F.lit("zhota zhotb zhotc")).alias("h")
    ).first()["h"]

    def plant(frac_mod: int):
        return docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 < frac_mod,
                F.concat(F.col("text"), F.lit(" s"),
                         F.col("doc_id").cast("string"),
                         F.lit(" zhota zhotb zhotc")),
            ).otherwise(F.col("text")),
        )

    def stats(d):
        sh = exploded_shingles(d, hashed=True).localCheckpoint()
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_sz"))
        n_cand = ppjoin_candidates(sh, sizes, 1, 2).count()
        clique = sh.filter(F.col("shingle") == hot_hash).count()
        return n_cand, clique

    base, _ = stats(docs)
    c20, k20 = stats(plant(1))   # 20% clique
    c60, k60 = stats(plant(3))   # 60% clique
    assert k20 > 0 and k60 > 2 * k20  # the clique really grows
    # naive join through the hot shingle alone would be quadratic:
    assert k60 * (k60 - 1) // 2 > 4 * (k20 * (k20 - 1) // 2)
    # ppjoin total candidates grow at most linearly in the clique
    assert c20 - base <= 4 * k20
    assert c60 - base <= 4 * k60
    # and the hot shingle itself seeds none: growth from 20% -> 60%
    # is far below the quadratic delta
    assert c60 - c20 < k60 * (k60 - 1) // 2 - k20 * (k20 - 1) // 2
