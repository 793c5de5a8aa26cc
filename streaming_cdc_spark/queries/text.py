"""Text-analysis queries over `documents` (training-data extensions):
quality scoring, language ID, token stats, fingerprints, multimodal
byte-column plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.operators import text as T
from streaming_cdc_spark.queries.registry import query
from streaming_cdc_spark.tables import load

_STOP = "'the','a','of','and','to','in','is','on'"

_BM25_TERMS = ("dup", "spark", "hash")


def _bm25_oracle(terms: tuple[str, ...], k: int) -> str:
    """DuckDB BM25 with the EXACT operation order of
    operators/text.bm25_scores (k1=1.5, b=0.75 — binary-exact
    constants), every float expression CAST to DOUBLE so DuckDB never
    silently does quantizing DECIMAL arithmetic (the ceaf_e_prf
    lesson)."""
    tf_cols = ",\n                   ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in terms
    )
    df_cols = ",\n                  ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    score = " + ".join(
        f"(ln(CAST(1.0 AS DOUBLE) + (CAST(n - df_{t} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" / (CAST(df_{t} AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
        f" * (CAST(tf_{t} AS DOUBLE) * CAST(2.5 AS DOUBLE))"
        f" / (CAST(tf_{t} AS DOUBLE) + CAST(1.5 AS DOUBLE) *"
        f" (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)"
        f" * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))))"
        for t in terms
    )
    tf_names = ", ".join(f"tf_{t}" for t in terms)
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tf AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
                   {tf_cols}
           FROM toks),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sum_dl,
                  {df_cols}
           FROM tf)
    SELECT doc_id, dl, {tf_names},
           ROUND({score}, 6) AS bm25
    FROM tf, st
    ORDER BY bm25 DESC, doc_id
    LIMIT {k}
    """


@query("bm25_topk", oracle=_bm25_oracle(_BM25_TERMS, 20))
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 retrieval for the query terms (dup, spark,
    hash) — 'dup' is the planted rare marker (df~5%) so idf actually
    discriminates. Rounded-score margins at the cut (min adjacent gap
    in the top 40): 4.5e-4 / 2.2e-4 / 1.3e-3 at sf0.001/0.01/0.1 —
    orders of magnitude above cross-engine ln() ulp noise; re-verify
    if testdata regenerates. tf/dl are doc-local array expressions (no
    explode),
    corpus stats (N, Σdl, per-term df) are ONE map-side-reduced row
    broadcast back, the cut is TakeOrdered on (rounded score, doc_id).
    The 100 TB shape: one scan + scalar reduce + top-k, zero wide
    shuffles."""
    docs = load(spark, sf_dir, "documents")
    scored = T.bm25_scores(docs, _BM25_TERMS, k1=1.5, b=0.75)
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(20)


@query(
    "redaction_stats",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\b(customer|vector|spark)\b')) AS n_denylist,
           len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS n_email,
           length(regexp_replace(regexp_replace(text,
                    '\b(customer|vector|spark)\b', '[REDACTED]', 'g'),
                    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+', '[REDACTED]', 'g')) AS redacted_len
    FROM documents
    """,
)
def redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / denylist scrubbing over the corpus: per-doc counts for a
    C4-style term denylist and an email pattern, plus the post-
    redaction text length. One scan, pure string expressions."""
    docs = load(spark, sf_dir, "documents")
    return T.regex_redact(
        docs,
        {
            "denylist": r"\b(customer|vector|spark)\b",
            "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+",
        },
    )


@query(
    "token_budget_selection",
    oracle="""
    WITH q AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               -ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / len(string_split(text, ' ')), 6) AS neg_score
        FROM documents
    ),
    o AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY neg_score, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM q
    )
    SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM o WHERE cum_tokens <= 10000
    """,
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-tokens-first corpus curation: rank docs by lexical
    diversity and keep them until a 10k-token budget fills. The
    running total uses the two-pass range-partitioned sum — no
    single-partition global window at scale."""
    docs = load(spark, sf_dir, "documents")
    return T.token_budget_selection(docs, budget=10_000)


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_token_len,
           ROUND(CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP}))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS uniq_token_ratio
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (token count, avg token length,
    stopword ratio, lexical diversity) — all Column expressions."""
    return T.quality_features(load(spark, sf_dir, "documents"))


@query(
    "lang_id_confusion",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(list_filter(list_distinct(string_split(text, ' ')), x -> x IN ('the','and','of'))) AS s_en,
               len(list_filter(list_distinct(string_split(text, ' ')), x -> x IN ('el','la','de'))) AS s_es,
               len(list_filter(list_distinct(string_split(text, ' ')), x -> x IN ('zh0','zh1','zh2'))) AS s_zh
        FROM documents
    )
    SELECT lang,
           CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END AS predicted_lang,
           COUNT(*) AS n
    FROM scored GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic n-gram language ID vs the table's lang column —
    confusion counts."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.language_id_ngram("text").alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


@query(
    "token_histogram",
    oracle="""
    SELECT token, n, rank FROM (
        SELECT token, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
        FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    ) WHERE rank <= 20
    """,
)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token frequencies with a total deterministic order (R4
    frequency-sorted vocab, preprocess_medmentions.py:70-75)."""
    return T.token_histogram(load(spark, sf_dir, "documents"), top_n=20)


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
                    i -> CAST(concat('0x', substr(md5(substr(text, i, 5)), 1, 15)) AS BIGINT))) AS fingerprint,
           CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS content_hash
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash char-5-gram min fingerprint + full content hash."""
    return T.doc_fingerprints(load(spark, sf_dir, "documents"))


@query(
    "pareto_front_docs",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_tokens,
             CAST(length(text) AS BIGINT) AS doc_len
      FROM documents
    )
    SELECT d.doc_id, d.n_distinct_tokens, d.doc_len
    FROM m d
    WHERE NOT EXISTS (
      SELECT 1 FROM m o
      WHERE o.n_distinct_tokens >= d.n_distinct_tokens
        AND o.doc_len >= d.doc_len
        AND (o.n_distinct_tokens > d.n_distinct_tokens
             OR o.doc_len > d.doc_len)
    )
    """,
)
def pareto_front_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE document selection (operators/ranking.py:
    pareto_front): the documents not dominated on (distinct-token
    count, length) — "best on lexical diversity AND volume with no
    arbitrary weighting", the Pareto form of curriculum selection.
    Physical is the distributed sweep: group max per x (one keyed
    agg), exclusive running max over the SMALL per-x relation
    (two-pass, no single-partition window), broadcast-back filter —
    one data shuffle total, while the oracle is the O(n²)
    definitional NOT EXISTS anti-join: an independent formulation,
    so the hash match proves the sweep loses/keeps nothing,
    including both-coordinate ties (mutually non-dominating, all
    kept)."""
    from streaming_cdc_spark.operators.ranking import pareto_front

    docs = load(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("doc_len"),
    )
    return pareto_front(m, "n_distinct_tokens", "doc_len", keep_cols=["doc_id"])


_CDC_K, _CDC_M = 8, 64
_H8 = "CAST(concat('0x', substr(md5(substr(text, i - 7, 8)), 1, 15)) AS BIGINT)"


@query(
    "chunk_dedup_profile",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents),
    pos AS (SELECT doc_id, text, i
            FROM d, UNNEST(range({_CDC_K}, length(text) + 1)) AS u(i)),
    bnd AS (SELECT doc_id, i FROM pos WHERE ({_H8}) % {_CDC_M} = 0),
    ends AS (SELECT doc_id, i AS e FROM bnd
             UNION SELECT doc_id, length(text) FROM d),
    ch AS (SELECT doc_id,
                  COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s,
                  e
           FROM ends),
    ct AS (SELECT c.doc_id, substr(d.text, c.s, c.e - c.s + 1) AS chunk
           FROM ch c JOIN d ON c.doc_id = d.doc_id),
    hashes AS (SELECT doc_id,
                      CAST(concat('0x', substr(md5(chunk), 1, 15)) AS BIGINT) AS h,
                      length(chunk) AS l
               FROM ct),
    pd AS (SELECT doc_id, h, COUNT(*) AS occ, MAX(l) AS l
           FROM hashes GROUP BY doc_id, h),
    fr AS (SELECT h, COUNT(*) AS nd FROM pd GROUP BY h)
    SELECT pd.doc_id,
           CAST(SUM(occ) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN nd > 1 THEN l ELSE 0 END) AS BIGINT) AS shared_len
    FROM pd JOIN fr ON pd.h = fr.h GROUP BY pd.doc_id
    """,
)
def chunk_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (operators/text.py:
    content_defined_chunks / chunk_dedup_stats — the rsync/FastCDC
    boundary rule, k=8 rolling md5 window, avg chunk ~64 chars):
    boundaries move WITH the content, so identical substrings yield
    identical chunks at ANY offset — the substring-granularity dedup
    unit between whole-doc hashing and per-position gram islands.
    Per doc: chunk counts + how many distinct chunks are shared with
    another document + the shared byte volume (what a chunk store
    would dedup away). Spark side is a doc-LOCAL array pipeline
    (zero shuffles until the 8-byte chunk-hash groupBy); the oracle
    rebuilds boundaries row-wise with lag over boundary positions —
    an independent formulation of the same chunking."""
    return T.chunk_dedup_stats(
        load(spark, sf_dir, "documents"), k=_CDC_K, modulus=_CDC_M
    )


@query(
    "doc_chunks",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ch AS (SELECT doc_id, t, i AS chunk_id
           FROM toks, UNNEST(range(0, CAST(FLOOR((len(t) - 1) / 48.0) AS BIGINT) + 1)) AS u(i))
    SELECT doc_id, chunk_id,
           len(t[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS n_tokens,
           CAST(concat('0x', substr(md5(array_to_string(t[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')), 1, 15)) AS BIGINT) AS chunk_hash
    FROM ch
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap over every document —
    chunk boundaries, sizes, and content hashes."""
    from streaming_cdc_spark.operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


@query(
    "sequence_packing",
    oracle="""
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
    SELECT CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c GROUP BY seq_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous token-budget packing (2048/sequence) summarized per
    sequence — docs-per-sequence and token totals. The prefix sum runs
    as the two-pass ranked form, never a single-partition window."""
    from streaming_cdc_spark.operators.text import pack_sequences

    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=2048)
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "sequence_packing_exact",
    oracle="""
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t),
    x AS (SELECT doc_id, n_tokens, cum, s.seq_id
          FROM c, UNNEST(range(CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT),
                               CAST(FLOOR((cum - 1) / 2048.0) AS BIGINT) + 1)) AS s(seq_id))
    SELECT seq_id, COUNT(*) AS n_doc_slices,
           CAST(SUM(least(cum, (seq_id + 1) * 2048) - greatest(cum - n_tokens, seq_id * 2048)) AS BIGINT) AS seq_tokens
    FROM x GROUP BY seq_id
    """,
)
def sequence_packing_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-splitting packing at 2048 tokens: per-sequence slice
    counts and token totals — every sequence except the final one
    totals exactly 2048."""
    from streaming_cdc_spark.operators.text import pack_sequences_exact

    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences_exact(docs, budget=2048)
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_doc_slices"),
        F.sum("tokens_in_seq").cast("long").alias("seq_tokens"),
    )


@query(
    "training_mix_counts",
    oracle="""
    WITH b AS (
        SELECT doc_id, source, lang,
               CAST(concat('0x', substr(md5(concat('mix', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT source, lang, COUNT(*) AS n_sampled
    FROM b
    WHERE bucket < (CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 50
                                WHEN 'src2' THEN 20 ELSE 0 END)
    GROUP BY source, lang
    """,
)
def training_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted deterministic corpus mix (the pretraining
    data-mixture step): hash-mod sampling per source at 80/50/20%,
    counted per (source, lang). Reproducible — md5 bucketing, no RNG
    — so the oracle replays it exactly."""
    docs = load(spark, sf_dir, "documents")
    mix = T.training_mix(docs, {"src0": 80, "src1": 50, "src2": 20})
    return mix.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "quality_filter",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (SELECT doc_id, concat_ws(' ', t[i], t[i+1]) AS ngram
          FROM toks, UNNEST(range(1, greatest(len(t), 2))) AS u(i)),
    per AS (SELECT doc_id, ngram, COUNT(*) AS c FROM g GROUP BY 1, 2),
    rep AS (SELECT doc_id, ROUND(1.0 - (COUNT(*)::DOUBLE / SUM(c)::DOUBLE), 6) AS dup_ngram_frac
            FROM per GROUP BY doc_id),
    q AS (SELECT doc_id, len(t) AS n_tokens,
                 ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS uniq_token_ratio
          FROM toks),
    sig AS (SELECT doc_id, n_tokens, dup_ngram_frac, uniq_token_ratio,
                   CASE WHEN n_tokens < 20 THEN 'short'
                        WHEN dup_ngram_frac > 0.06 THEN 'repetitive'
                        WHEN uniq_token_ratio < 0.33 THEN 'low_diversity'
                        ELSE 'ok' END AS reason
            FROM q JOIN rep USING (doc_id))
    SELECT doc_id, n_tokens, dup_ngram_frac, uniq_token_ratio, reason,
           reason = 'ok' AS keep
    FROM sig
    """,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop document filter with reason codes — the
    decision step a training-data pipeline runs over its quality
    signals (length, duplicate-bigram repetition, lexical diversity).
    First failing rule wins: short -> repetitive -> low_diversity."""
    docs = load(spark, sf_dir, "documents")
    q = T.quality_features(docs).select("doc_id", "n_tokens", "uniq_token_ratio")
    rep = T.ngram_repetition(docs, n=2).select("doc_id", "dup_ngram_frac")
    sig = q.join(rep, "doc_id")
    reason = (
        F.when(F.col("n_tokens") < 20, F.lit("short"))
        .when(F.col("dup_ngram_frac") > 0.06, F.lit("repetitive"))
        .when(F.col("uniq_token_ratio") < 0.33, F.lit("low_diversity"))
        .otherwise(F.lit("ok"))
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "dup_ngram_frac",
        "uniq_token_ratio",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


@query(
    "media_stats",
    oracle="""
    SELECT source, COUNT(*) AS n_blobs,
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           ROUND(CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS DOUBLE) / COUNT(*), 4) AS avg_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_hashes
    FROM documents GROUP BY source
    """,
)
def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column aggregation pattern (multimodal plumbing):
    byte sizes + content hashes per source."""
    return T.media_stats(load(spark, sf_dir, "documents"))


@query(
    "corpus_shards",
    oracle="""
    WITH h AS (SELECT doc_id,
                      CAST(concat('0x', substr(md5(concat('shard', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS _h
               FROM documents)
    SELECT doc_id, _h % 8 AS shard,
           ROW_NUMBER() OVER (PARTITION BY _h % 8 ORDER BY _h, doc_id) AS pos
    FROM h
    """,
)
def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + seeded within-shard
    shuffle order (salted md5 bucket + rank by hash): the reproducible
    corpus->trainer handoff, one hash shuffle, per-shard windows."""
    from streaming_cdc_spark.operators.text import shard_corpus

    return shard_corpus(load(spark, sf_dir, "documents"), n_shards=8)


@query(
    "corpus_diff_status",
    oracle="""
    WITH old AS (SELECT doc_id,
                        CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
                 FROM documents WHERE doc_id % 3 <> 0),
    new AS (SELECT doc_id,
                   CAST(concat('0x', substr(md5(CASE WHEN doc_id % 7 = 0
                                                     THEN concat(text, ' v2')
                                                     ELSE text END), 1, 15)) AS BIGINT) AS h
            FROM documents WHERE doc_id % 5 <> 0)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.h IS NULL THEN 'added'
                WHEN n.h IS NULL THEN 'removed'
                WHEN o.h = n.h THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
    """,
)
def corpus_diff_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest snapshot diff: two synthetic snapshots of
    the documents table (drop id%3 from old, drop id%5 from new,
    rewrite id%7 in new) classified added/removed/changed/unchanged
    by content hash."""
    from streaming_cdc_spark.operators.text import corpus_diff

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    return corpus_diff(old, new)


@query(
    "bpe_pair_counts",
    oracle="""
    WITH w AS (SELECT u.word FROM (SELECT string_split(text, ' ') AS t FROM documents), UNNEST(t) AS u(word)),
    p AS (SELECT substring(word, i, 2) AS pair
          FROM w, UNNEST(range(1, greatest(length(word), 2))) AS u(i)
          WHERE length(word) >= 2),
    c AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair)
    SELECT pair, n, rank FROM (
        SELECT pair, n, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank FROM c
    ) WHERE rank <= 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training kernel: top-50 adjacent character pairs
    within words across the corpus, deterministically ranked."""
    from streaming_cdc_spark.operators.text import bpe_pair_counts as op

    return op(load(spark, sf_dir, "documents"), top_n=50)


@query(
    "unigram_logprob",
    oracle="""
    WITH toks AS (SELECT doc_id, u.token
                  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents), UNNEST(t) AS u(token)),
    freq AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY token),
    total AS (SELECT SUM(tf) AS tot FROM freq)
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(LN(f.tf) - LN((SELECT tot FROM total))), 6) AS mean_logprob_r
    FROM toks t JOIN freq f USING (token)
    GROUP BY t.doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style quality proxy: per-document mean unigram log-prob
    under the corpus's own unigram distribution."""
    from streaming_cdc_spark.operators.text import unigram_logprob as op

    return op(load(spark, sf_dir, "documents"))


@query(
    "stratified_take",
    oracle="""
    SELECT source, doc_id, take_rank FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST(concat('0x', substr(md5(concat('strat', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT),
                            doc_id) AS take_rank
        FROM documents)
    WHERE take_rank <= 10
    """,
)
def stratified_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic quota: the 10 hash-smallest documents
    of every source (seeded-reservoir stand-in for balanced mixing)."""
    from streaming_cdc_spark.operators.text import stratified_take as op

    return op(load(spark, sf_dir, "documents"), per_group=10)


@query(
    "bigram_logprob",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM toks, UNNEST(range(1, greatest(len(t), 2))) AS u(i)
           WHERE i + 1 <= len(t)),
    bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
    cc AS (SELECT w1, COUNT(*) AS cc FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT u.w) AS v
          FROM toks, UNNEST(t) AS u(w))
    SELECT g.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(LN(CAST(bc.cb + 1 AS DOUBLE)) - LN(CAST(cc.cc + (SELECT v FROM v) AS DOUBLE))), 6) AS mean_logprob_r
    FROM bg g JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
              JOIN cc ON g.w1 = cc.w1
    GROUP BY g.doc_id
    """,
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM quality proxy: per-document mean
    conditional log-probability under corpus bigram statistics."""
    from streaming_cdc_spark.operators.text import bigram_logprob as op

    return op(load(spark, sf_dir, "documents"))


@query(
    "normalized_dedup",
    oracle="""
    SELECT dup_key, COUNT(*) AS n_dups, MIN(doc_id) AS canonical_doc_id
    FROM (SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS dup_key
          FROM documents)
    GROUP BY dup_key HAVING COUNT(*) > 1
    """,
)
def normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the NORMALIZED text (lowercase, punctuation
    stripped, whitespace collapsed) — catches cosmetic variants the
    raw-key dedup misses."""
    from streaming_cdc_spark.operators.dedup import exact_dedup_groups
    from streaming_cdc_spark.operators.text import normalize_text

    docs = load(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, normalize_text("text"))


@query(
    "temperature_mix",
    oracle="""
    WITH tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
                 FROM documents),
    per AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
                   COUNT(*) AS n_docs
            FROM tok GROUP BY source),
    r AS (SELECT source, src_tokens, n_docs,
                 least(1.0, 10.0 / sqrt(CAST(src_tokens AS DOUBLE))) AS rate
          FROM per),
    f AS (SELECT t.source, t.n_tok, r.src_tokens, r.n_docs, r.rate,
                 CASE WHEN CAST(concat('0x', substr(md5(concat('tmix', CAST(t.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
                           < CAST(FLOOR(r.rate * 1000000) AS BIGINT)
                      THEN 1 ELSE 0 END AS sel
          FROM tok t JOIN r ON t.source = r.source)
    SELECT source, MIN(n_docs) AS n_docs, MIN(src_tokens) AS src_tokens,
           ROUND(MIN(rate), 6) AS rate_r,
           CAST(SUM(sel) AS BIGINT) AS n_selected,
           CAST(SUM(sel * n_tok) AS BIGINT) AS sel_tokens
    FROM f GROUP BY source
    """,
)
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source balancing (UniMax / mT5 alpha=0.5):
    keep rate min(1, 10/sqrt(source_tokens)) per source, md5-gated per
    doc — the sampling step that flattens a skewed source mix toward
    sqrt-proportional token budgets. Deterministic end to end: the
    rate is a pure function of the EXACT integer token sum, so the
    oracle replays the selection bit-for-bit. Output: per-source mix
    report (docs, tokens, rate, selected docs/tokens)."""
    flagged = T.temperature_mix(load(spark, sf_dir, "documents"), scale=10.0)
    return flagged.groupBy("source").agg(
        F.min("n_docs").alias("n_docs"),
        F.min("src_tokens").alias("src_tokens"),
        F.round(F.min("rate"), 6).alias("rate_r"),
        F.sum("sel").cast("long").alias("n_selected"),
        F.sum(F.col("sel") * F.col("n_tok")).cast("long").alias("sel_tokens"),
    )


@query(
    "length_curriculum",
    oracle="""
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
    b AS (SELECT doc_id, n_tok, length(bin(n_tok)) AS bucket FROM t)
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bucket_tokens,
           MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok
    FROM b GROUP BY bucket
    """,
)
def length_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum binning: documents bucketed by the BIT
    LENGTH of their token count (power-of-two bands — the shortest
    docs train first in a length curriculum). Bit length via integer
    base-2 string conversion, so both engines bucket by exact integer
    semantics — no floating log2 at the band edges. Per bucket: doc
    count, token budget, token range."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    b = docs.select(
        n_tok.alias("n_tok"),
        F.length(F.conv(n_tok.cast("string"), 10, 2)).cast("long").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("bucket_tokens"),
        F.min("n_tok").cast("long").alias("min_tok"),
        F.max("n_tok").cast("long").alias("max_tok"),
    )


@query(
    "quality_decile_curriculum",
    oracle="""
    WITH s AS (SELECT doc_id,
                      len(string_split(text, ' ')) AS n_tok,
                      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')) AS ttr
               FROM documents),
    r AS (SELECT doc_id, n_tok, ttr,
                 ROW_NUMBER() OVER (ORDER BY ttr, doc_id) AS rnk,
                 COUNT(*) OVER () AS n
          FROM s)
    SELECT CAST(FLOOR((10 * (rnk - 1)) / n) AS BIGINT) AS decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS decile_tokens,
           ROUND(MIN(ttr), 6) AS min_ttr_r,
           ROUND(MAX(ttr), 6) AS max_ttr_r
    FROM r GROUP BY decile
    """,
)
def quality_decile_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile curriculum: documents ranked by type-token
    ratio and binned into 10 equal-frequency deciles — the binning a
    quality-ordered training curriculum feeds from (train on the top
    deciles first / weight deciles differently). Exact-rank form with
    a full oracle: the score is one int/int IEEE division (no float
    reduction), the rank a total order via the two-pass
    range-partitioned row_number (never a single-partition window).
    Per decile: doc count, token budget, score range."""
    from streaming_cdc_spark.operators.text import quality_decile_bins

    docs = load(spark, sf_dir, "documents")
    binned = quality_decile_bins(docs, n_bins=10)
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("decile_tokens"),
        F.round(F.min("ttr"), 6).alias("min_ttr_r"),
        F.round(F.max("ttr"), 6).alias("max_ttr_r"),
    )


@query(
    "pipeline_manifest",
    oracle="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    base AS (SELECT doc_id, t, len(t) AS n_tok,
                    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
             FROM toks),
    k0 AS (SELECT doc_id, t, n_tok FROM base WHERE n_tok >= 20 AND ttr >= 0.33),
    pref AS (SELECT doc_id, t, n_tok, array_to_string(t[1:5], ' ') AS pfx FROM k0),
    k1 AS (SELECT p.doc_id, p.t, p.n_tok FROM pref p
           JOIN (SELECT pfx, MIN(doc_id) AS doc_id FROM pref GROUP BY pfx) m
             ON p.pfx = m.pfx AND p.doc_id = m.doc_id),
    sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
           FROM k1, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)),
    mh AS (SELECT doc_id,
                  MIN(CAST(concat('0x', substr(md5(concat('0|', shingle)), 1, 15)) AS BIGINT)) AS h0,
                  MIN(CAST(concat('0x', substr(md5(concat('1|', shingle)), 1, 15)) AS BIGINT)) AS h1,
                  MIN(CAST(concat('0x', substr(md5(concat('2|', shingle)), 1, 15)) AS BIGINT)) AS h2,
                  MIN(CAST(concat('0x', substr(md5(concat('3|', shingle)), 1, 15)) AS BIGINT)) AS h3
           FROM sh GROUP BY doc_id),
    bands0 AS (SELECT doc_id, UNNEST([concat('0_', h0), concat('1_', h1),
                                      concat('2_', h2), concat('3_', h3)]) AS bucket
               FROM mh),
    bkeep AS (SELECT bucket FROM bands0 GROUP BY bucket HAVING COUNT(*) <= 500),
    bands AS (SELECT bands0.* FROM bands0 JOIN bkeep USING (bucket)),
    cand AS (SELECT DISTINCT a.doc_id AS u, c.doc_id AS v
             FROM bands a JOIN bands c ON a.bucket = c.bucket AND a.doc_id < c.doc_id),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT cand.u, cand.v, COUNT(*) AS i
              FROM cand JOIN sh x ON x.doc_id = cand.u
                        JOIN sh y ON y.doc_id = cand.v AND x.shingle = y.shingle
              GROUP BY 1, 2),
    ver AS (SELECT u, v FROM inter JOIN sz sa ON sa.doc_id = u JOIN sz sb ON sb.doc_id = v
            WHERE i / (sa.n + sb.n - i) >= 0.2),
    edges AS (SELECT u, v FROM ver UNION ALL SELECT v, u FROM ver),
    reach(v, l) AS (
        SELECT doc_id, doc_id FROM k1
        UNION
        SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.v),
    assign AS (SELECT v AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY v),
    k2 AS (SELECT k1.doc_id, k1.n_tok FROM k1
           JOIN assign ON assign.doc_id = k1.doc_id
           WHERE assign.cluster_id = k1.doc_id),
    sp AS (SELECT doc_id, n_tok,
                  CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
                       ELSE 'test' END AS split
           FROM (SELECT doc_id, n_tok,
                        CAST(concat('0x', substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 100 AS bkt
                 FROM k2)),
    c AS (SELECT doc_id, n_tok, split,
                 SUM(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM sp)
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT CAST(FLOOR((cum - n_tok) / 2048.0) AS BIGINT)) AS BIGINT) AS n_sequences
    FROM c GROUP BY split
    """,
)
def pipeline_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE preprocessing pipeline as one declarative DAG with one
    differential check: quality filter (length >= 20, TTR >= 0.33 —
    exact int-division predicates) -> exact dedup (keep min-id doc
    per 5-word prefix) -> MinHash near-dup dedup on the survivors
    (banded LSH + hot-bucket cap + verify + CC, keep canonicals) ->
    leakage-safe train/val/test split hashed from the canonical id ->
    2048-token sequence packing per split. Output: the training
    manifest (per split: docs, tokens, packed sequences). The oracle
    replays every stage, so the end-to-end composition — not just
    each operator — is value-hash-checked. Per-split packing uses a
    keyed window (3 partitions); production shards each split before
    packing (split x shard), same math."""
    from pyspark.sql import Window as W

    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.operators.dedup import minhash_dedup

    docs = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    base = docs.select(
        "doc_id",
        "text",
        F.size(t).alias("n_tok"),
        (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias("ttr"),
        F.array_join(F.slice(t, 1, 5), " ").alias("_pfx"),
    )
    k0 = base.filter((F.col("n_tok") >= 20) & (F.col("ttr") >= 0.33))
    firsts = k0.groupBy("_pfx").agg(F.min("doc_id").alias("doc_id"))
    # localCheckpoint (optimization r9): k1 feeds both the MinHash
    # chain and the k2 canonical filter — un-checkpointed, the scan +
    # tokenize + TTR filter + prefix-dedup semi-join ran twice.
    k1 = (
        k0.join(firsts, ["_pfx", "doc_id"], "left_semi")
        .select("doc_id", "text", "n_tok")
        .localCheckpoint()
    )
    assign = minhash_dedup(
        k1.select("doc_id", "text"),
        num_hashes=4,
        rows_per_band=1,
        jaccard_threshold=0.2,
    )
    k2 = (
        k1.join(assign, "doc_id")
        .filter(F.col("cluster_id") == F.col("doc_id"))
        .select("doc_id", "n_tok")
    )
    bkt = F.pmod(md5_long(F.col("doc_id").cast("string"), salt="split|"), F.lit(100))
    sp = k2.withColumn(
        "split",
        F.when(bkt < 80, "train").when(bkt < 90, "val").otherwise("test"),
    )
    w = (
        W.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = sp.withColumn("cum", F.sum("n_tok").over(w))
    seq = F.floor((F.col("cum") - F.col("n_tok")) / 2048.0).cast("long")
    return c.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.countDistinct(seq).alias("n_sequences"),
    )


@query(
    "stratified_sample_counts",
    oracle="""
    WITH h AS (
        SELECT lang, doc_id,
               CAST(concat('0x', substr(md5(concat(lang, '|',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
        FROM documents
    ),
    tot AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    rate AS (SELECT lang, COUNT(*) AS n_rate FROM h
             WHERE hv % 1000 < 250 GROUP BY 1),
    rk AS (SELECT lang, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
           FROM h),
    fixed AS (SELECT lang, COUNT(*) AS n_fixed,
                     CAST(SUM(doc_id) AS BIGINT) AS fixed_id_sum
              FROM rk WHERE rn <= 20 GROUP BY 1)
    SELECT t.lang, t.n_docs,
           CAST(COALESCE(r.n_rate, 0) AS BIGINT) AS n_rate,
           f.n_fixed, f.fixed_id_sum
    FROM tot t LEFT JOIN rate r USING (lang) JOIN fixed f USING (lang)
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/sampling.py): a
    25% hash-rate Bernoulli per language (pure filter — the no-shuffle
    scale path) and an exactly-20-per-language hash-ordered sample
    (row_number window; Spark's WindowGroupLimit pushes the k-limit
    below the exchange, pinned by tests/test_plans.py). Both samples
    are pure functions of (lang, doc_id) via the cross-engine
    md5-chain hash, so reruns, repartitions, and the DuckDB oracle
    all select the SAME rows — fixed_id_sum is the membership witness
    (any substituted row changes it). Integer arithmetic end to end;
    no RNG, no float boundaries."""
    from streaming_cdc_spark.operators.sampling import (
        deterministic_group_topk,
        hash_rate_sample,
    )

    docs = load(spark, sf_dir, "documents").select("lang", "doc_id")
    tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    rate = (
        hash_rate_sample(docs, "lang", "doc_id", 250)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("_n_rate"))
    )
    fixed = (
        deterministic_group_topk(docs, "lang", "doc_id", 20)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_fixed"),
            F.sum("doc_id").cast("long").alias("fixed_id_sum"),
        )
    )
    return (
        tot.join(rate, "lang", "left")
        .join(fixed, "lang")
        .select(
            "lang",
            "n_docs",
            F.coalesce(F.col("_n_rate"), F.lit(0)).cast("long").alias("n_rate"),
            "n_fixed",
            "fixed_id_sum",
        )
    )


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, text, string_split(text, ' ') AS t,
             string_split(text, chr(10)) AS lines
      FROM documents
    ), m AS (
      SELECT doc_id,
        len(t) AS n_words,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(t) AS mean_wl,
        (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
         + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3)
          / len(t) AS symbol_ratio,
        CAST(len(list_filter(lines, x -> x LIKE '-%' OR x LIKE '*%')) AS DOUBLE)
          / len(lines) AS bullet_frac,
        CAST(len(list_filter(lines, x -> x LIKE '%...')) AS DOUBLE)
          / len(lines) AS ellipsis_frac,
        CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
          / len(t) AS alpha_frac,
        len(list_intersect(list_distinct(t), [{_STOP}])) AS n_stop
      FROM w
    )
    SELECT doc_id,
      CAST(n_words AS BIGINT) AS n_words,
      ROUND(mean_wl, 6) AS mean_word_len,
      ROUND(symbol_ratio, 6) AS symbol_ratio,
      ROUND(alpha_frac, 6) AS alpha_frac,
      CAST(n_stop AS BIGINT) AS n_stopwords,
      (n_words >= 40 AND n_words <= 100000) AS ok_word_count,
      (mean_wl >= 3.0 AND mean_wl <= 10.0) AS ok_mean_word_len,
      (symbol_ratio <= 0.1) AS ok_symbol_ratio,
      (bullet_frac <= 0.9) AS ok_bullet_lines,
      (ellipsis_frac <= 0.3) AS ok_ellipsis_lines,
      (alpha_frac >= 0.8) AS ok_alpha_words,
      (n_stop >= 2) AS ok_stopwords,
      ((n_words >= 40 AND n_words <= 100000)
       AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
       AND (symbol_ratio <= 0.1)
       AND (bullet_frac <= 0.9)
       AND (ellipsis_frac <= 0.3)
       AND (alpha_frac >= 0.8)
       AND (n_stop >= 2)) AS keep
    FROM m
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality rule set (Rae et al. 2021 A1.1) as one
    per-document flag row: word-count / mean-word-length bounds,
    symbol-to-word ratio, bullet- and ellipsis-line fractions,
    alphabetic-word fraction, required-stopword count — plus the
    conjunctive keep decision. Pure projection (zero shuffles); flag
    thresholds land on both TRUE and FALSE docs at sf0.01 so the
    driver hash covers both branches. All rule comparisons happen on
    UNROUNDED doubles identically in both engines; only output
    columns are rounded."""
    docs = load(spark, sf_dir, "documents")
    return T.gopher_quality_flags(docs, min_words=40, min_stopwords=2)


@query(
    "weighted_sample_topk",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 1099511627776 AS u40
        FROM documents
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((u40 * 1000000) // greatest(n_tokens, 1) AS BIGINT) AS priority
    FROM d ORDER BY priority, doc_id LIMIT 64
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (operators/sampling.py:
    weighted_priority_sample): bottom-64 documents by the integer
    priority (u40 * 1e6) div token_count — token-heavy documents are
    proportionally likelier to be drawn, the standard
    size-proportional pick for training-mix construction, with the
    random draw replaced by the id hash so the sample is replayable
    and partition-invariant (no ln(u)/w float boundary). Total
    deterministic order (priority, doc_id); all-integer output."""
    from streaming_cdc_spark.operators.sampling import weighted_priority_sample

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return weighted_priority_sample(docs, "doc_id", "n_tokens", k=64).select(
        "doc_id", "n_tokens", "priority"
    )


@query(
    "phrase_match_postings",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2, COUNT(*) AS n
           FROM t, UNNEST(range(1, len(arr))) AS u(i)
           GROUP BY 1, 2),
    top1 AS (SELECT w1, w2 FROM bg ORDER BY n DESC, w1, w2 LIMIT 1),
    pos AS (SELECT doc_id, arr[i] AS tok, i AS pos
            FROM t, UNNEST(range(1, len(arr) + 1)) AS u(i))
    SELECT top1.w1, top1.w2, p1.doc_id, COUNT(*) AS n_occurrences
    FROM pos p1
    JOIN top1 ON p1.tok = top1.w1
    JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
               AND p2.tok = top1.w2
    GROUP BY 1, 2, 3
    """,
)
def phrase_match_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-inverted-index phrase query: find the corpus's most
    frequent adjacent bigram (doc-local zip_with adjacency — ZERO
    joins and zero shuffle beyond the count, the ngram_repetition
    lesson), then answer the phrase query "w1 w2" the way an inverted
    index does — read ONLY the two terms' posting lists
    (posexplode -> semi-filter by the broadcast phrase) and join them
    on (doc_id, consecutive positions). At 100 TB the probe cost
    scales with the phrase terms' document frequency, never the
    corpus: the full postings are never self-joined. Output:
    (w1, w2, doc_id, n_occurrences) for every matching document."""
    from streaming_cdc_spark.session import fan_out

    docs = load(spark, sf_dir, "documents")
    t = fan_out(docs.select("doc_id", F.split("text", " ").alias("arr")))
    adj = t.select(
        F.explode(
            F.zip_with(
                F.expr("slice(arr, 1, greatest(size(arr) - 1, 0))"),
                F.expr("slice(arr, 2, greatest(size(arr) - 1, 0))"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    )
    top1 = (
        adj.groupBy("bg.w1", "bg.w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
        .localCheckpoint()  # referenced by BOTH posting probes below
    )
    pos = t.select(
        "doc_id", F.posexplode("arr").alias("pos", "tok")
    )
    # ONE pass over the corpus postings keeps rows matching EITHER
    # phrase term (one-row broadcast filter — the whitelisted scalar
    # BNLJ shape); both probes below read the tiny checkpointed
    # result instead of re-exploding the corpus each (code-review r5)
    matched = (
        pos.crossJoin(F.broadcast(top1))
        .filter((F.col("tok") == F.col("w1")) | (F.col("tok") == F.col("w2")))
        .localCheckpoint()
    )
    p1 = matched.filter(F.col("tok") == F.col("w1")).select(
        "doc_id", F.col("pos").alias("pos1"), "w1", "w2"
    )
    p2 = matched.filter(F.col("tok") == F.col("w2")).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    return (
        p1.join(
            p2,
            (p1["doc_id"] == p2["doc_id2"]) & (p2["pos2"] == p1["pos1"] + 1),
        )
        .groupBy("w1", "w2", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def _bpe_round(i: int) -> str:
    """One unrolled BPE round: overlapping pair counts -> top pair ->
    greedy non-overlapping merge via gaps-and-islands (odd ranks
    within each run of consecutive candidate positions — exactly the
    left-to-right rule the engine's fold implements)."""
    t, p = f"t{i}", f"top{i}"
    return f"""
    {p} AS (
      SELECT a, b, COUNT(*) AS n FROM (
        SELECT tok AS a,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM {t}) q WHERE b IS NOT NULL
      GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1
    ),
    c{i} AS (
      SELECT t.doc_id, t.pos, t.tok,
             COALESCE(t.tok = {p}.a AND
               lead(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) = {p}.b,
               FALSE) AS cand
      FROM {t} t, {p}
    ),
    i{i} AS (
      SELECT *, CASE WHEN cand THEN pos - ROW_NUMBER() OVER
          (PARTITION BY doc_id, cand ORDER BY pos) END AS isl
      FROM c{i}
    ),
    s{i} AS (
      SELECT *, CASE WHEN cand THEN
          (ROW_NUMBER() OVER (PARTITION BY doc_id, isl ORDER BY pos) % 2 = 1)
          ELSE FALSE END AS sel
      FROM i{i}
    ),
    m{i} AS (
      SELECT doc_id, pos,
             CASE WHEN sel THEN (SELECT a || '+' || b FROM {p})
                  ELSE tok END AS tok,
             COALESCE(lag(sel) OVER (PARTITION BY doc_id ORDER BY pos),
                      FALSE) AS prev_sel
      FROM s{i}
    ),
    t{i + 1} AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
             tok
      FROM m{i} WHERE NOT prev_sel
    )"""


_BPE_ORACLE = f"""
    WITH t1 AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) d
    ),
    {_bpe_round(1)},
    {_bpe_round(2)},
    {_bpe_round(3)}
    SELECT CAST(1 AS BIGINT) AS merge_round, a AS pair_a, b AS pair_b,
           CAST(n AS BIGINT) AS n_pairs FROM top1
    UNION ALL SELECT CAST(2 AS BIGINT), a, b, CAST(n AS BIGINT) FROM top2
    UNION ALL SELECT CAST(3 AS BIGINT), a, b, CAST(n AS BIGINT) FROM top3
"""


@query("bpe_merge_table", oracle=_BPE_ORACLE)
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of the FULL BPE merge-training loop
    (operators/text.py: bpe_merge_rounds) over word-level tokens of
    the documents corpus: per round, corpus-wide overlapping pair
    counts pick the most frequent adjacent pair ((n DESC, a, b) total
    order), every document greedily merges its non-overlapping
    occurrences left-to-right (a doc-local array fold — zero extra
    shuffles), and the next round counts over the MERGED corpus, so
    each output row depends on every prior round's merge. The oracle
    unrolls the three rounds relationally (the kcore/bisect pattern):
    counts via lead(), the greedy merge via gaps-and-islands over the
    candidate positions (odd ranks within each run = the
    left-to-right rule), position renumbering per round. A hash match
    is therefore the whole trainer loop — selection, tie-breaking,
    overlap handling, and recounting — not just one pair count.
    Completes the reference-adjacent tokenizer surface that
    bpe_pair_counts (single step) opened. t4 is built but unread —
    DuckDB prunes it; Spark never constructs it (rounds=3 stops after
    the third count)."""
    from streaming_cdc_spark.operators.text import bpe_merge_rounds
    from streaming_cdc_spark.session import fan_out

    docs = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return bpe_merge_rounds(docs, rounds=3)


_EPSH_ORACLE = """
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT CAST(0 AS BIGINT) AS epoch, doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(concat('0x', substr(md5(concat('ep0:',
                 CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id)
             AS BIGINT) AS pos
      FROM d
    ),
    e1 AS (
      SELECT CAST(1 AS BIGINT) AS epoch, doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(concat('0x', substr(md5(concat('ep1:',
                 CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id)
             AS BIGINT) AS pos
      FROM d
    )
    SELECT epoch, doc_id, pos FROM e0
    UNION ALL
    SELECT epoch, doc_id, pos FROM e1
"""


@query("epoch_shuffle_positions", oracle=_EPSH_ORACLE)
def epoch_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC PER-EPOCH GLOBAL SHUFFLE — the training-loop
    data-order primitive: every epoch needs a DIFFERENT but
    REPRODUCIBLE permutation of the corpus, computed distributed
    (never a driver-side permutation array — at 100 TB there is no
    driver that holds n positions). Position = global rank of the
    salted document hash md5_long('ep{e}:' + doc_id), tiebroken by
    doc_id into a total order; ranking goes through
    operators/ranking.row_number_global (range exchange + in-
    partition sort + monotonic-id decode — the corpus moves ONCE per
    epoch; a Window over a constant or epoch-keyed partition would
    be a 1-or-2-partition sort wall). Epochs are independent range
    sorts unioned after ranking, so epoch count scales jobs, not
    partition pressure. The salt is the epoch seed: epoch orders are
    uncorrelated (a tf.data / torch DataLoader seed-shuffle
    equivalent), and any epoch is replayable from the id alone —
    resume-from-step needs no stored permutation. Oracle: the same
    md5 chain ranked by DuckDB's ROW_NUMBER, both epochs."""
    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.operators.ranking import row_number_global

    docs = load(spark, sf_dir, "documents").select("doc_id")
    outs = []
    for e in (0, 1):
        hv = md5_long(F.col("doc_id").cast("string"), salt=f"ep{e}:")
        ranked = row_number_global(
            docs.withColumn("_hv", hv), ["_hv", "doc_id"], "pos"
        )
        outs.append(
            ranked.select(
                F.lit(e).cast("long").alias("epoch"),
                "doc_id",
                F.col("pos").cast("long").alias("pos"),
            )
        )
    return outs[0].unionByName(outs[1])


_TFIDF_TOPK_ORACLE = """
    WITH toks AS (
      SELECT doc_id, u.token
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(t) AS u(token)
    ),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
           FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(tf.tf * (SELECT n_docs FROM n) AS DOUBLE)
               / CAST(df.df AS DOUBLE) AS s
      FROM tf JOIN df USING (token)
    ),
    ranked AS (
      SELECT doc_id, token, tf, df,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, token) AS rank,
             ROUND(s, 6) AS score_r
      FROM scored
    )
    SELECT doc_id, token, tf, df, CAST(rank AS BIGINT) AS rank, score_r
    FROM ranked WHERE rank <= 3
"""


@query("tfidf_topk_terms", oracle=_TFIDF_TOPK_ORACLE)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOCUMENT KEYWORD EXTRACTION — top-3 terms by raw-ratio
    TF-IDF (tf * N / df, the ln-free form: the registry float rules
    forbid cross-engine ln(), and the RATIO orders identically — the
    score is ONE IEEE division of exact integers, bit-identical on
    both engines, with ties broken by term). The inverse direction
    of bm25_topk (query -> documents): document -> its most
    distinctive terms, the classic tag/topic extraction every corpus
    curation pipeline runs. Physical: token explode -> two keyed
    aggregates (tf per (doc, term); df per term over the DISTINCT
    (doc, term) relation — never the raw occurrence stream) -> a
    term-keyed join (df side is term-cardinality, shuffles narrow) ->
    per-doc top-3 via row_number, which Spark plants a map-side
    WindowGroupLimit for: the rank exchange carries at most 3 rows
    per (doc, input partition). At 100 TB every stage is linear in
    tokens; the df join key is the term (Heaps'-law vocab growth
    keeps it far smaller than the corpus)."""
    from streaming_cdc_spark.session import fan_out

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    from pyspark.sql import Window as W

    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        (
            (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df").cast("double")
        ).alias("s"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("s").desc(), "token")
    return (
        scored.select(
            "doc_id", "token", "tf", "df",
            F.row_number().over(w).cast("long").alias("rank"),
            F.round("s", 6).alias("score_r"),
        )
        .filter(F.col("rank") <= 3)
    )


_NEGPAIR_ORACLE = """
    WITH idx AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    wanted AS (
      SELECT a.doc_id, j.j,
             (a.i + 1 + CAST(concat('0x', substr(md5(concat('neg', j.j, ':',
                CAST(a.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % (a.n - 1)
             ) % a.n AS neg_i
      FROM idx a CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j) j
    )
    SELECT w.doc_id, CAST(w.j AS BIGINT) AS j, b.doc_id AS neg_doc_id
    FROM wanted w JOIN idx b ON w.neg_i = b.i
"""


@query("negative_pair_sample", oracle=_NEGPAIR_ORACLE)
def negative_pair_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC CONTRASTIVE NEGATIVE SAMPLING — the data-side
    companion to the reference's triplet-loss training head (V8,
    declared out of scope as a training op): every anchor document
    gets k=2 pseudo-random negative partners, reproducible from ids
    alone (a rerun, a resumed job, or the oracle re-derives the SAME
    pairs — no stored sample, no RNG state). Construction: docs get
    a dense index i via one global rank (row_number_global — one
    range exchange), then neg_i = (i + 1 + h % (n-1)) % n with
    h = md5_long('neg{j}:' + doc_id) — the +1 shift over a modulus
    of n-1 makes self-pairing IMPOSSIBLE by arithmetic (never a
    rejection loop, which would be a data-dependent number of
    passes), and the index join back to doc ids is an equi-join on
    the dense index. At 100 TB: one range sort + one narrow
    index-keyed join per epoch of negatives; k scales rows, not
    shuffles. Uniformity is the standard hash assumption — the same
    one every LSH family here rides on."""
    from streaming_cdc_spark.functions.hashing import md5_long
    from streaming_cdc_spark.operators.ranking import row_number_global

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    idx = row_number_global(docs, ["doc_id"], "rn").select(
        "doc_id", (F.col("rn") - 1).cast("long").alias("i")
    ).localCheckpoint()
    anchors = idx.withColumn("j", F.explode(F.array(F.lit(0), F.lit(1))))
    h = md5_long(
        F.concat(F.lit("neg"), F.col("j").cast("string"), F.lit(":"),
                 F.col("doc_id").cast("string"))
    )
    wanted = anchors.select(
        "doc_id",
        F.col("j").cast("long").alias("j"),
        ((F.col("i") + 1 + h % F.lit(n - 1)) % F.lit(n)).alias("neg_i"),
    )
    neg = idx.select(F.col("i").alias("neg_i"), F.col("doc_id").alias("neg_doc_id"))
    return wanted.join(neg, "neg_i").select("doc_id", "j", "neg_doc_id")


_HEAPS_BUCKETS = 10


@query(
    "heaps_vocab_growth",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    rn AS (
      SELECT doc_id, t, len(t) AS n_tok,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
             COUNT(*) OVER () AS n_docs
      FROM d
    ),
    db AS (
      SELECT doc_id, n_tok, ((r - 1) * {_HEAPS_BUCKETS}) // n_docs AS b, t
      FROM rn
    ),
    toks AS (
      SELECT b, u.token FROM db, UNNEST(t) AS u(token)
    ),
    firsts AS (
      SELECT token, MIN(b) AS fb FROM toks GROUP BY token
    ),
    per_bucket AS (
      SELECT b,
             SUM(n_tok) AS new_tokens,
             (SELECT COUNT(*) FROM firsts f WHERE f.fb = db2.b) AS new_vocab
      FROM db db2 GROUP BY b
    ),
    cum AS (
      SELECT g.cp AS bucket,
             SUM(p.new_tokens) AS cum_tokens,
             SUM(p.new_vocab) AS cum_vocab
      FROM per_bucket p
      JOIN (SELECT DISTINCT b AS cp FROM per_bucket) g ON p.b <= g.cp
      GROUP BY 1
    )
    SELECT bucket, CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_vocab AS BIGINT) AS cum_vocab
    FROM cum
""",
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW VOCABULARY GROWTH CURVE — the corpus-health profile
    a tokenizer/dedup pipeline reads before choosing vocab size: at
    10 equal-count document checkpoints (docs ordered by doc_id),
    the CUMULATIVE token count vs CUMULATIVE distinct vocabulary.
    A natural corpus grows vocab ~ tokens^beta (beta ~0.5); a
    templated/duplicated corpus flattens early — the same diagnostic
    the r7 ppjoin densification post-mortem ran by hand, as a
    first-class query. Physical: one range exchange for the global
    doc rank (ranking.row_number_global — never a single-partition
    Window), one explode + token-keyed aggregate for first
    occurrences (vocab is counted at the bucket of its FIRST
    appearance — no distinct-per-prefix rescan), then the 10-row
    per-bucket relation explodes each row to the checkpoints it
    feeds (sequence(b, 9) — at most 55 rows; zero windows, zero
    nested-loop joins) for the prefix sums. Every number is an exact
    BIGINT. At 100 TB: two linear shuffles (range + token hash);
    the prefix stage is constant-size."""
    from streaming_cdc_spark.operators.ranking import row_number_global

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    n_docs = docs.count()  # planning scalar
    ranked = row_number_global(docs, ["doc_id"], "r").select(
        "doc_id",
        "t",
        F.size("t").alias("n_tok"),
        ((F.col("r") - 1) * _HEAPS_BUCKETS).cast("long")
        .alias("_num"),
    )
    ranked = ranked.withColumn(
        "b", F.expr(f"_num div {n_docs}").cast("long")
    ).drop("_num")
    toks = ranked.select("b", F.explode("t").alias("token"))
    firsts = toks.groupBy("token").agg(F.min("b").alias("fb"))
    new_vocab = firsts.groupBy(F.col("fb").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("new_vocab")
    )
    new_tokens = ranked.groupBy("b").agg(
        F.sum("n_tok").cast("long").alias("new_tokens")
    )
    per_bucket = new_tokens.join(new_vocab, "b", "left").fillna(
        0, subset=["new_vocab"]
    )
    fanned = per_bucket.select(
        F.explode(
            F.sequence(F.col("b"), F.lit(_HEAPS_BUCKETS - 1))
        ).alias("bucket"),
        "new_tokens",
        "new_vocab",
    )
    return fanned.groupBy("bucket").agg(
        F.sum("new_tokens").cast("long").alias("cum_tokens"),
        F.sum("new_vocab").cast("long").alias("cum_vocab"),
    )
