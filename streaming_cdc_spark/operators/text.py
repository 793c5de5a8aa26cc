"""Text-analysis operators for corpus pipelines (training-data
extensions; BASELINE.json north_star): quality scoring, language
summaries, token statistics, document fingerprinting. All pure Column
expressions — no Python in the hot path — mirroring the reference's
scalar string surface (P1-P7, SURVEY §2.2) generalized to corpus
hygiene.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_cdc_spark.functions.hashing import md5_long
from streaming_cdc_spark.operators.dedup import STOPWORDS, tokens


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality signals: token count, average token
    length, stopword ratio, lexical diversity (distinct/total tokens).
    Output columns rounded for hash-stability."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    stop_lit = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), x -> x IN ({stop_lit}))"))
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(n_nonspace.cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(t)).cast("double") / n_tokens, 6).alias("uniq_token_ratio"),
    )


def language_id_ngram(text_col: str = "text", profiles: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Heuristic n-gram language ID: score each language profile by
    how many of its characteristic words appear; pick the argmax
    (ties -> lexicographically first language). A deterministic,
    SQL-expressible stand-in for a real LID model; the Spark-side
    plumbing (profile broadcast, argmax-over-struct) is the real
    pattern."""
    profiles = profiles or {
        "en": ("the", "and", "of"),
        "es": ("el", "la", "de"),
        "zh": ("zh0", "zh1", "zh2"),
    }
    t = F.array_distinct(tokens(text_col))
    langs = sorted(profiles)
    scores = {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in profiles[lang]])))
        for lang in langs
    }
    # fixed priority on ties: earlier (lexicographically smaller) lang
    # wins — renders as a chained CASE, portable to the SQL oracle
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            later = langs.index(other) > langs.index(lang)
            c = scores[lang] >= scores[other] if later else scores[lang] > scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def char_fingerprint(text_col: str = "text", k: int = 5) -> Column:
    """Rolling-hash document fingerprint: min md5-int64 over all char
    k-grams (winnowing with a single global window). Pure expression:
    sequence -> transform -> array_min."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> CAST(conv(substring(md5(substring({text_col}, i, {k})), 1, 15), 16, 10) AS BIGINT)))"
    )


def token_histogram(
    docs: DataFrame, top_n: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-N tokens by frequency with a total deterministic order
    (count desc, token asc). Output: (token, n, rank)."""
    from streaming_cdc_spark.operators.ranking import row_number_global

    from streaming_cdc_spark.session import fan_out

    counts = (
        fan_out(docs.select(tokens(text_col).alias("_t")))
        .select(F.explode("_t").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    return row_number_global(counts, [F.desc("n"), F.asc("token")], "rank").filter(
        F.col("rank") <= top_n
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.5,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term set — the inverted-index retrieval/decontamination probe
    shape, computed relationally.

    Physical plan: term frequencies and document length are DOC-LOCAL
    array expressions (no explode, no shuffle); the corpus statistics
    BM25 needs (N, Σdl, per-term document frequency) reduce to ONE row
    via map-side partial aggregation and come back as a one-row scalar
    broadcast — so scoring 100 TB of documents is a single scan plus a
    tiny global reduce, and the top-k cut is TakeOrdered (per-partition
    limit before the driver merge).

    Float determinism: k1/b default to binary-exact 1.5/0.75 so every
    constant (k1+1=2.5, 1-b=0.25) is exact; scores are computed with an
    identical operation order on the DuckDB side and rounded to 6 dp
    BEFORE ranking, with doc_id as the total tiebreak.

    Returns one row per doc: (id, dl, tf_<term>..., bm25) — callers
    apply their own ordering/limit.
    """
    from streaming_cdc_spark.session import fan_out

    def _match(term: str):
        # factory, NOT a defaulted second lambda arg: pyspark passes
        # the array index as any second parameter (CLAUDE.md gotcha)
        return lambda x: x == F.lit(term)

    base = fan_out(docs.select(F.col(id_col), tokens(text_col).alias("_t")))
    tf = base.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("dl"),
        *[
            F.size(F.filter("_t", _match(t))).cast("long").alias(f"tf_{t}")
            for t in terms
        ],
    )
    stats = tf.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("dl").cast("long").alias("_sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("long").alias(f"_df_{t}")
            for t in terms
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n").cast("double")
    dl_ratio = F.col("dl").cast("double") / avgdl
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_ratio)
    parts = []
    for t in terms:
        idf = F.log(
            F.lit(1.0)
            + ((F.col("_n") - F.col(f"_df_{t}")).cast("double") + F.lit(0.5))
            / (F.col(f"_df_{t}").cast("double") + F.lit(0.5))
        )
        tfd = F.col(f"tf_{t}").cast("double")
        parts.append(idf * (tfd * F.lit(k1 + 1.0)) / (tfd + norm))
    score = parts[0]
    for p in parts[1:]:  # fixed left-to-right addition order
        score = score + p
    return scored.select(
        F.col(id_col),
        F.col("dl"),
        *[F.col(f"tf_{t}") for t in terms],
        F.round(score, 6).alias("bm25"),
    )


def regex_tokenize(text_col: str = "text") -> Column:
    """P9 analog: a BPE-ish regex tokenization (letter runs, digit
    runs, single punctuation) via regexp_extract_all — the
    SQL-expressible stand-in for a learned subword tokenizer; an HF
    tokenizer slots into the same column via a pandas UDF."""
    # lit() keeps the regex out of the SQL parser's escape handling
    return F.regexp_extract_all(text_col, F.lit(BPE_ISH_PATTERN), F.lit(0))


def media_stats(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Multimodal plumbing over opaque bytes: treats the utf-8 encoding
    of text as a binary media column (the synthetic tables carry no
    real blobs) and aggregates byte sizes + content hashes per group —
    the schema/partitioning pattern for image/audio columns."""
    return docs.groupBy(group_col).agg(
        F.count("*").alias("n_blobs"),
        F.sum(F.octet_length(F.col(text_col)).cast("long")).alias("total_bytes"),
        F.round(
            F.sum(F.octet_length(F.col(text_col)).cast("long")).cast("double") / F.count("*"), 4
        ).alias("avg_bytes"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct_hashes"),
    )


def doc_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    # one md5 per character position: the heaviest per-row expression
    # in the package — fan out first so a single-row-group scan doesn't
    # serialize the whole corpus through one task
    from streaming_cdc_spark.session import fan_out

    docs = fan_out(docs.select(id_col, text_col))
    return docs.select(
        F.col(id_col),
        char_fingerprint(text_col).alias("fingerprint"),
        md5_long(F.col(text_col)).alias("content_hash"),
    )


def content_defined_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING (the rsync/LBFS/FastCDC boundary
    rule): position i ends a chunk iff the rolling k-gram hash at i
    is ≡ 0 (mod ``modulus``) — boundaries move WITH the content, so
    an insertion early in a document shifts only the chunk it lands
    in, and every identical substring longer than ~modulus chars
    yields identical chunks regardless of offset. This is the
    substring-granularity dedup primitive BETWEEN exact-hash (whole
    doc) and gram islands (per-position): chunk hashes are the unit
    of cross-corpus sharing.

    ROW-WISE construction: explode candidate positions, compute each
    position's hash exactly once, filter to boundaries, derive chunk
    [start, end] spans with a per-doc lag window (keyed by doc —
    partition size is boundaries-per-doc, never corpus-sized), then
    one join back to the doc text for slicing + hashing. An array
    pipeline (filter/transform over intermediate columns) is the
    WRONG physical here: Catalyst's project collapsing re-inlines the
    md5 boundary filter at every downstream reference, multiplying
    the per-position hashing ~40x (measured 56s -> ~2s on 500 docs).
    Output: one row per (doc, chunk) with (chunk_idx, chunk_len,
    chunk_hash). Docs shorter than k are one whole-doc chunk."""
    from pyspark.sql import Window as W

    from streaming_cdc_spark.session import fan_out

    d = fan_out(docs.select(id_col, text_col))
    # per-position hash array built by ONE single-reference transform
    # (evaluated once per element), then posexploded so boundary rows
    # are narrow (id, pos, hash) — exploding positions first would
    # copy the full text into every one of the len(text) rows
    harr = F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"transform(sequence({k}, length({text_col})), i -> "
        f"CAST(conv(substring(md5(substring({text_col}, i - {k - 1}, {k})),"
        f" 1, 15), 16, 10) AS BIGINT)) ELSE array() END"
    )
    bnd = (
        d.select(id_col, F.posexplode(harr).alias("_p", "_h"))
        .where(F.pmod(F.col("_h"), F.lit(modulus)) == 0)
        .select(id_col, (F.col("_p") + k).cast("int").alias("_e"))
    )
    ends = bnd.union(
        d.select(id_col, F.length(text_col).cast("int").alias("_e"))
    ).distinct()
    w = W.partitionBy(id_col).orderBy("_e")
    spans = ends.select(
        id_col,
        (F.coalesce(F.lag("_e").over(w), F.lit(0)) + 1).alias("_s"),
        F.col("_e"),
        F.row_number().over(w).alias("chunk_idx"),
    )
    chunk = F.expr(f"substring({text_col}, _s, _e - _s + 1)")
    return spans.join(d, id_col).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("_e") - F.col("_s") + 1).cast("long").alias("chunk_len"),
        md5_long(chunk).alias("chunk_hash"),
    )


def chunk_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """Per-document chunk-sharing profile over content-defined
    chunks: n_chunks (with multiplicity), n_distinct, n_shared
    (distinct chunk hashes that also occur in ANOTHER document) and
    shared_len (their total length — the byte-level overlap a
    chunk-store would dedup away). Physical: doc-local chunking →
    one groupBy on the 8-byte chunk hash (doc-frequency) → one
    hash-key join back → per-doc aggregate. Linear; candidate-free
    (sharing is exact hash equality, no pair enumeration)."""
    ch = content_defined_chunks(docs, id_col, text_col, k, modulus)
    # LAZY lineage cut (optimization r9 residual sweep): per_doc is
    # referenced twice (doc-frequency aggregate + the join back) —
    # without the cut the whole content-defined chunking (rolling md5
    # over every document) re-runs per reference. The narrow
    # (id, hash, occ, len) rows materialize once in the caller's
    # action; no extra driver job.
    per_doc = ch.groupBy(id_col, "chunk_hash").agg(
        F.count(F.lit(1)).alias("_occ"),
        F.max("chunk_len").alias("_len"),
    ).localCheckpoint(eager=False)
    freq = per_doc.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("_ndocs")
    )
    j = per_doc.join(freq, "chunk_hash")
    return j.groupBy(id_col).agg(
        F.sum("_occ").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("_ndocs") > 1, 1).otherwise(0)).cast("long").alias("n_shared"),
        F.sum(F.when(F.col("_ndocs") > 1, F.col("_len")).otherwise(0))
        .cast("long")
        .alias("shared_len"),
    )


def regex_redact(
    docs: DataFrame,
    patterns: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """PII / denylist scrubbing: per-document match counts for each
    named regex plus the length of the text after replacing every
    match (C4-style badword filtering and email/phone/IP redaction are
    both this operator with different pattern tables). Pure codegen'd
    string expressions — the scan's the only pass, no shuffle.

    Patterns are applied in sorted-name order for the redacted text so
    the output is deterministic regardless of dict ordering. Output:
    (id, n_<name> per pattern, redacted_len)."""
    out_cols: list[Column] = [F.col(id_col)]
    red = F.col(text_col)
    for name in sorted(patterns):
        pat = patterns[name]
        out_cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, replacement)
    out_cols.append(F.length(red).alias("redacted_len"))
    return docs.select(*out_cols)


def token_budget_selection(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-ranked token-budget selection: order documents by a
    quality score (lexical diversity, ties on id), keep documents
    while the running token total stays within ``budget`` — the "best
    N tokens" curation step that turns a scored corpus into a training
    set of a fixed size. The running sum uses the two-pass
    range-partitioned form (operators.ranking), so the global order
    never collapses to one partition at scale.

    Output: (id, n_tokens, cum_tokens) for the kept documents."""
    from streaming_cdc_spark.operators.ranking import running_sum_global

    t = tokens(text_col)
    scored = docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        # negated so the ascending two-pass sum visits best-first
        (-F.round(F.size(F.array_distinct(t)).cast("double") / F.size(t), 6)).alias(
            "_neg_score"
        ),
    )
    ranked = running_sum_global(
        scored, ["_neg_score", id_col], "n_tokens", "cum_tokens"
    )
    return (
        ranked.filter(F.col("cum_tokens") <= budget)
        .select(id_col, "n_tokens", "cum_tokens")
    )


def quality_decile_bins(
    docs: DataFrame,
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-decile curriculum binning: rank every document by a
    quality score (type-token ratio — distinct tokens / tokens, the
    lexical-diversity signal quality filters use) and assign decile
    ``floor(n_bins * (rank-1) / N)`` — the binning step of a
    quality-ordered curriculum (lowest decile = weakest documents).

    Determinism: the score is ONE IEEE division of two exact integers
    (bit-identical across engines — no order-dependent float
    reduction), the rank is a total order (score, id), and the decile
    is exact-integer arithmetic whose double quotient is correctly
    rounded, so FLOOR agrees everywhere. Scale: the global rank runs
    as the two-pass range-partitioned form (operators.ranking) — one
    range shuffle, never a single-partition window; the doc total
    joins back as a broadcast scalar. At 100 TB an approxQuantile
    threshold pass would replace the exact rank (driver-sized
    thresholds, no global order needed), at the price of the exact
    oracle.

    Output: one row per doc (id, n_tok, ttr, decile)."""
    from streaming_cdc_spark.operators.ranking import row_number_global

    t = tokens(text_col)
    scored = docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tok"),
        (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias("ttr"),
    )
    ranked = row_number_global(scored, ["ttr", id_col], "_rnk")
    total = scored.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "decile",
            F.floor(F.lit(n_bins) * (F.col("_rnk") - 1) / F.col("_n")).cast("long"),
        )
        .drop("_rnk", "_n")
    )


def hash_sample(
    df: DataFrame, rate_pct: int, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic hash-mod sampling: keep rows whose salted 60-bit
    md5 of the key lands in the first ``rate_pct`` of 100 buckets.
    The reproducible sampling a training pipeline uses instead of
    RNG — same key, same salt, same subset on every engine and run;
    changing the salt draws an independent sample. Pure column
    expression, no shuffle."""
    keep = F.pmod(md5_long(F.col(key_col).cast("string"), salt=salt), F.lit(100)) < rate_pct
    return df.filter(keep)


def training_mix(
    docs: DataFrame,
    source_rates: dict[str, int],
    key_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Source-weighted corpus mix: each source is hash-sampled at its
    own percentage rate (the data-mixture step of a pretraining
    pipeline, expressed as one filter — no per-source unions, one
    scan). Unlisted sources are dropped. Output: the sampled rows."""
    rate = F.lit(0)
    for src, pct in sorted(source_rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(pct)).otherwise(rate)
    bucket = F.pmod(md5_long(F.col(key_col).cast("string"), salt="mix"), F.lit(100))
    return docs.filter(bucket < rate)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token chunking with overlap (stride = chunk_tokens −
    overlap): chunk i covers tokens [i·stride+1, i·stride+chunk], and
    chunks exist while their start position ≤ doc length — the
    long-document splitting step of embedding/RAG pipelines. Pure
    explode + array-slice expressions; the chunk content is emitted as
    a 60-bit md5 (cross-engine checkable) instead of the text itself.

    Output: (id, chunk_id, n_tokens, chunk_hash)."""
    from streaming_cdc_spark.session import fan_out

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = fan_out(docs.select(id_col, tokens(text_col).alias("_t")))
    last = F.floor((F.size("_t") - 1) / stride).cast("int")
    ch = toks.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), last)))
    chunk = F.slice("_t", F.col("chunk_id") * stride + 1, chunk_tokens)
    return ch.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        md5_long(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous sequence packing: concatenate documents in id order
    and split at token-budget boundaries — each doc's sequence is
    floor(exclusive-prefix-tokens / budget), the Megatron-style
    packing step that turns a corpus into fixed-length training rows.
    A doc straddling a boundary belongs to the sequence where it
    starts (the splitter handles the carry). Distributed two-pass
    prefix sum (ranking.running_sum_global) — no single-partition
    window, no driver state.

    Output: (id, n_tokens, cum_tokens, seq_id)."""
    from streaming_cdc_spark.operators.ranking import running_sum_global

    base = docs.select(id_col, F.size(tokens(text_col)).alias("n_tokens"))
    run = running_sum_global(base, [id_col], "n_tokens", "cum_tokens")
    return run.withColumn(
        "seq_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget).cast("long"),
    )


def pack_sequences_exact(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact contiguous packing: the token stream is concatenated in
    id order and cut every ``budget`` tokens, SPLITTING documents that
    straddle a boundary — every sequence except the last carries
    exactly ``budget`` tokens (the invariant a fixed-context trainer
    needs). Each doc occupies token span [cum−n, cum) and is exploded
    to the sequences it overlaps; tokens_in_seq is the overlap length.
    Same two-pass prefix sum as pack_sequences; the explode adds one
    row per boundary crossed, not per token.

    Output: (id, seq_id, tokens_in_seq)."""
    from streaming_cdc_spark.operators.ranking import running_sum_global

    base = docs.select(id_col, F.size(tokens(text_col)).alias("n_tokens"))
    run = running_sum_global(base, [id_col], "n_tokens", "cum_tokens")
    start = F.col("cum_tokens") - F.col("n_tokens")
    first_seq = F.floor(start / budget).cast("long")
    last_seq = F.floor((F.col("cum_tokens") - 1) / budget).cast("long")
    s = run.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    seq_lo = F.col("seq_id") * budget
    seq_hi = seq_lo + budget
    tokens_in_seq = F.least(F.col("cum_tokens"), seq_hi) - F.greatest(start, seq_lo)
    return s.select(
        id_col, "seq_id", tokens_in_seq.cast("long").alias("tokens_in_seq")
    )


def ngram_repetition(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicate-n-gram statistics — the Gopher-style
    repetition quality signal (fraction of n-grams that are repeats,
    plus the most-repeated n-gram's count).

    Output: (id, n_ngrams, n_distinct_ngrams, top_ngram_count,
    dup_ngram_frac[6dp]). Same n-gram construction as the dedup
    shingles (positions 1..greatest(len-(n-1), 1), try_element_at for
    short docs) but WITHOUT the distinct — repetition needs
    multiplicities. ZERO shuffles: the statistic is doc-local, so it
    folds over the per-row n-gram array (array_sort + run-length
    aggregate) instead of exploding the corpus into (id, ngram) rows —
    at 400k docs that explode+groupBy shuffled 40M rows for what one
    map stage computes.
    """
    from streaming_cdc_spark.session import fan_out

    toks = fan_out(docs.select(id_col, tokens(text_col).alias("_t")))
    idx = F.sequence(F.lit(1), F.greatest(F.size("_t") - (n - 1), F.lit(1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.try_element_at(F.col("_t"), i + F.lit(j)) for j in range(n)]),
    )
    # materialize shared arrays FIRST: lambdas re-evaluate inline
    # expressions per element
    base = toks.select(id_col, grams.alias("_g")).select(
        id_col, "_g", F.array_sort("_g").alias("_gs")
    )

    def step(acc, x):
        run = F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    top = F.aggregate(
        F.col("_gs"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        step,
        lambda acc: acc.getField("best"),
    )
    n_ngrams = F.size("_g").cast("long")
    n_distinct = F.size(F.array_distinct("_g")).cast("long")
    return base.select(
        F.col(id_col),
        n_ngrams.alias("n_ngrams"),
        n_distinct.alias("n_distinct_ngrams"),
        top.alias("top_ngram_count"),
        F.round(
            F.lit(1.0) - n_distinct.cast("double") / n_ngrams.cast("double"),
            6,
        ).alias("dup_ngram_frac"),
    )


def shard_corpus(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment + seeded global
    shuffle: shard = salted md5 bucket of the id (uniform, no RNG
    state), within-shard position = rank by (hash, id) — so reading
    shards in position order replays one reproducible permutation of
    the corpus on any engine and any cluster size.

    The window partitions by shard (parallel, no global sort); the
    only shuffle is the shard hash-partition — exactly the write
    pattern of the final corpus->trainer handoff at 100 TB.

    Output: (id, shard, pos)."""
    h = md5_long(F.col(id_col).cast("string"), salt=salt)
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("_h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("_h"))
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff by content hash: classify every id across two
    corpus snapshots as added / removed / changed / unchanged — the
    incremental-ingest primitive (a 100 TB pipeline diffs snapshots
    and reprocesses only the delta). One full-outer join on the id
    comparing md5 content hashes; hashes are computed in the scan
    projection so the join carries 16 bytes per side, not documents.

    Output: (id, status)."""
    a = old.select(F.col(id_col), md5_long(F.col(text_col)).alias("_ha"))
    b = new.select(F.col(id_col), md5_long(F.col(text_col)).alias("_hb"))
    status = (
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .when(F.col("_ha") == F.col("_hb"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return a.join(b, id_col, "full_outer").select(F.col(id_col), status.alias("status"))


def bpe_pair_counts(
    docs: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """First merge step of BPE tokenizer training: corpus-wide counts
    of adjacent symbol pairs (character bigrams WITHIN words, word
    boundaries never pair). The full trainer iterates merge->recount;
    each iteration is this same shape, so the one-step operator is the
    scalable kernel. fan_out then explode (chars x corpus rows);
    groupBy is partial-aggregated; top-N via the two-pass global rank.
    Output: (pair, n, rank)."""
    from streaming_cdc_spark.operators.ranking import row_number_global
    from streaming_cdc_spark.session import fan_out

    words = fan_out(docs.select(tokens(text_col).alias("_w")))
    w = words.select(F.explode("_w").alias("word")).filter(F.length("word") >= 2)
    pairs = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(word) - 1, 1)), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    return row_number_global(counts, [F.desc("n"), F.asc("pair")], "rank").filter(
        F.col("rank") <= top_n
    )


def bpe_merge_rounds(
    docs: DataFrame,
    rounds: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The FULL iterative BPE merge-training loop (Sennrich et al.
    2016) that bpe_pair_counts is one step of: per round, count ALL
    adjacent token pairs corpus-wide (overlapping occurrences count,
    the standard convention), pick the most frequent pair (ties by
    (a, b) ascending — a total order, so training is deterministic),
    then merge every non-overlapping occurrence greedily
    left-to-right in every document and recount. Output: one row per
    round — (merge_round, pair_a, pair_b, n_pairs), the learned merge
    table with its evidence counts (round r's count depends on round
    r-1's merge, so the row set verifies the whole loop, not just
    counting).

    Physical: pair counting is zip_with(toks, toks[2:]) -> explode ->
    one partial-aggregated groupBy + a one-row global top (per round:
    one shuffle + one tiny sort); the merge is a doc-local array FOLD
    (F.aggregate) against the one-row broadcast winner — zero extra
    shuffles, no Python. Greedy non-overlap falls out of the fold:
    after merging, the accumulator's last element is 'a+b', which can
    never equal `a` (it is strictly longer), so a run 'a a a' merges
    positions (1,2) and leaves 3 — exactly the left-to-right rule.
    try_element_at guards the empty accumulator (ANSI). Rounds
    localCheckpoint the token arrays so Catalyst cannot re-inline the
    fold pipeline into the next round's count (the r6 chunk_dedup
    20x trap), and the recompute tree stays flat (the kcore rule).
    At 100 TB: per-round cost is one scan + one pair-count shuffle —
    the loop is rounds x linear, with only one-row collects."""
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    outs = []
    for r in range(1, rounds + 1):
        toks = toks.localCheckpoint()
        bi = toks.select(
            F.explode(
                F.zip_with(
                    "_toks",
                    F.expr("slice(_toks, 2, greatest(size(_toks) - 1, 0))"),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p")
        ).filter(F.col("p.b").isNotNull())
        top = (
            bi.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()
        )
        outs.append(
            top.select(
                F.lit(r).cast("long").alias("merge_round"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.col("n").alias("n_pairs"),
            )
        )
        if r == rounds:
            break
        winner = F.broadcast(
            top.select(F.col("a").alias("_ma"), F.col("b").alias("_mb"))
        )
        merged_tok = F.concat(F.col("_ma"), F.lit("+"), F.col("_mb"))

        def _fold(acc, x):
            hit = (F.try_element_at(acc, F.lit(-1)) == F.col("_ma")) & (
                x == F.col("_mb")
            )
            return F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged_tok)
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        toks = toks.crossJoin(winner).select(
            F.col(id_col),
            F.aggregate(
                "_toks", F.array().cast("array<string>"), _fold
            ).alias("_toks"),
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-probability of
    each document under the corpus's own unigram distribution (the
    KenLM-filter stand-in real pipelines run; a trained LM slots into
    the same shape). Two passes: corpus token frequencies (partial
    agg), then a broadcast-or-shuffle join back to the exploded
    tokens and one mean per doc. Output: (id, n_tokens,
    mean_logprob_r) rounded 6dp."""
    from streaming_cdc_spark.session import fan_out

    toks = fan_out(docs.select(F.col(id_col), tokens(text_col).alias("_t"))).select(
        id_col, F.explode("_t").alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("_total"))
    freq = freq.crossJoin(F.broadcast(total))
    scored = toks.join(freq, "token").select(
        F.col(id_col),
        (F.log(F.col("tf").cast("double")) - F.log(F.col("_total").cast("double"))).alias("_lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob_r"),
    )


def stratified_take(
    docs: DataFrame,
    per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-group quota: keep the ``per_group`` documents
    with the smallest salted md5 of their id within each group — the
    per-domain cap step of a data-mixing pipeline, reproducible across
    engines and runs (hash order stands in for a seeded reservoir).
    One shuffle keyed by the group; the rank window partitions by
    group, so no global sort. Output: group, id, take_rank."""
    from pyspark.sql import Window as W

    h = md5_long(F.col(id_col).cast("string"), salt=salt)
    w = W.partitionBy(group_col).orderBy("_h", id_col)
    return (
        docs.select(F.col(group_col), F.col(id_col), h.alias("_h"))
        .withColumn("take_rank", F.row_number().over(w))
        .filter(F.col("take_rank") <= per_group)
        .select(group_col, id_col, "take_rank")
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram-LM quality score with add-one smoothing: per document,
    the mean of ln P(w_i | w_{i-1}) where
    P = (c(w_{i-1} w_i) + 1) / (c_ctx(w_{i-1}) + V), counts from the
    corpus itself (c_ctx = bigrams starting with the word, V =
    corpus vocabulary size). The next step up from unigram_logprob
    toward the KenLM-filter shape; same physical plan — two
    partial-aggregated count passes + one join back, all shuffles
    keyed by token values. Docs with fewer than 2 tokens emit no row
    (they have no bigram evidence). Output: (id, n_bigrams,
    mean_logprob_r[6dp])."""
    from streaming_cdc_spark.session import fan_out

    base = fan_out(docs.select(F.col(id_col), tokens(text_col).alias("_t")))
    bg = base.select(
        id_col,
        F.explode(
            F.expr(
                # try_element_at (1-based): OOB -> NULL instead of the
                # ANSI error a 1-token doc would raise; filtered below
                "transform(sequence(1, greatest(size(_t) - 1, 1)), "
                "i -> struct(try_element_at(_t, i) AS w1, try_element_at(_t, i + 1) AS w2))"
            )
        ).alias("_b"),
    ).filter(F.col("_b.w2").isNotNull()).select(
        id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2")
    )
    big_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    ctx_counts = bg.groupBy("w1").agg(F.count("*").alias("cc"))
    vocab = base.select(F.explode("_t").alias("w")).agg(
        F.countDistinct("w").alias("_v")
    )
    stats = big_counts.join(ctx_counts, "w1").crossJoin(F.broadcast(vocab))
    scored = bg.join(stats, ["w1", "w2"]).select(
        F.col(id_col),
        (
            F.log((F.col("cb") + 1).cast("double"))
            - F.log((F.col("cc") + F.col("_v")).cast("double"))
        ).alias("_lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob_r"),
    )


def gopher_quality_flags(
    docs: DataFrame,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, A1.1) as
    pure codegen'd Column expressions — one boolean flag per rule plus
    the conjunctive ``keep`` decision, so a pipeline can either filter
    on ``keep`` or audit WHICH rule rejected each document (the flag
    breakdown is what the paper's ablation needs). Word-count bounds,
    mean word length bounds, symbol-to-word ratio (# and ...),
    bullet-start and ellipsis-end line fractions, alphabetic-word
    fraction, and a minimum count of distinct required stopwords.
    Zero shuffles — a pure per-row projection that Catalyst fuses into
    the scan; at 100 TB this is the cheapest possible operator shape.
    Ratios are rounded to 6dp for cross-engine hash stability."""
    t = tokens(text_col)
    n_words = F.size(t)
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    mean_wl = n_nonspace.cast("double") / n_words
    n_hash = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    n_ellip = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellip).cast("double") / n_words
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.startswith("-") | x.startswith("*")))
        .cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: x.endswith("..."))).cast("double") / n_lines
    )
    alpha_frac = (
        F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]"))).cast("double") / n_words
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stop_arr))
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "ok_bullet_lines": bullet_frac <= max_bullet_frac,
        "ok_ellipsis_lines": ellipsis_frac <= max_ellipsis_frac,
        "ok_alpha_words": alpha_frac >= min_alpha_frac,
        "ok_stopwords": n_stop >= min_stopwords,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stopwords"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


def normalize_text(text_col: str = "text") -> Column:
    """Canonical text normalization for dedup keys: lowercase, strip
    every non-alphanumeric-non-space character, collapse whitespace
    runs, trim. Pure codegen'd string expressions — the usual first
    step before exact/near dedup so cosmetic variants collide."""
    c = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def temperature_mix(
    docs: DataFrame,
    scale: float = 10.0,
    key_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-style source balancing (the UniMax / multilingual-T5
    mixing rule, alpha = 0.5): per-source keep rate
    ``min(1, scale / sqrt(source_tokens))`` — big sources are
    downsampled toward sqrt-proportional token budgets, small ones
    kept whole. Deterministic: the rate derives only from the EXACT
    integer per-source token sum (no order-dependent float reduction),
    and selection is md5-bucketed, so a replay selects identical docs.

    Output: per-doc (key, source, n_tok, sel) flags; aggregate for the
    mix report, filter sel for the sampled corpus. One scan + one
    broadcast join of the dimension-sized source table."""
    tok = docs.select(
        F.col(source_col).alias("source"),
        F.col(key_col).alias("key"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
    )
    per_src = tok.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("src_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(scale)) / F.sqrt(F.col("src_tokens").cast("double"))
    )
    flagged = tok.join(F.broadcast(per_src), "source").select(
        "source",
        "key",
        "n_tok",
        "src_tokens",
        "n_docs",
        rate.alias("rate"),
        (
            F.pmod(md5_long(F.col("key").cast("string"), salt="tmix"), F.lit(1_000_000))
            < F.floor(rate * 1_000_000).cast("long")
        ).cast("int").alias("sel"),
    )
    return flagged


def collocation_pmi(
    docs: DataFrame,
    top_n: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """COLLOCATION MINING by pointwise mutual information — the
    corpus-linguistics primitive behind multiword-expression
    detection and tokenizer-vocabulary curation (Church & Hanks '90).
    Scored as the RAW probability ratio
    p(w1,w2) / (p(w1) p(w2)) = n_ab * N^2 / (B * n_a * n_b),
    NOT its log: ln() is not bit-identical across engines (the
    ari_score lesson), while this ratio is ONE fixed-order chain of
    IEEE double multiply/divide over exact BIGINT counts — identical
    bits on Spark and DuckDB, and monotone in log-PMI so the ranking
    is the textbook one.

    Physical: one token explode for unigram counts, one doc-local
    bigram explode for pair counts (both partial-aggregated), a
    min_count frequency cut BEFORE the two unigram-count joins (the
    candidate set shrinks to frequent pairs first), one-row scalar
    broadcasts for the two corpus totals, then the two-pass global
    rank (row_number_global — never a single-partition window).
    Output: (w1, w2, n_ab, n_a, n_b, pmi_ratio, rank), top_n rows."""
    from streaming_cdc_spark.operators.ranking import row_number_global
    from streaming_cdc_spark.session import fan_out

    # the split is referenced by both the unigram and bigram passes
    # (and their totals) — materialize it once instead of re-running
    # the scan+split lineage four times
    base = fan_out(
        docs.select(F.split(F.col(text_col), " ").alias("_t"))
    ).localCheckpoint()
    toks = base.select(F.explode("_t").alias("w"))
    ua = toks.groupBy("w").agg(F.count(F.lit(1)).alias("_n"))
    nn = toks.agg(F.count(F.lit(1)).alias("_n_tok"))
    bg = base.filter(F.size("_t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct(element_at(_t, i) AS w1, "
                "element_at(_t, i + 1) AS w2))"
            )
        ).alias("_b")
    ).select("_b.w1", "_b.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    bb = bg.agg(F.count(F.lit(1)).alias("_n_bg"))
    f = (
        bc.filter(F.col("n_ab") >= min_count)
        .join(ua.select(F.col("w").alias("w1"), F.col("_n").alias("n_a")), "w1")
        .join(ua.select(F.col("w").alias("w2"), F.col("_n").alias("n_b")), "w2")
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(bb))
    )
    pmi = (
        (F.col("n_ab").cast("double") * F.col("_n_tok").cast("double"))
        * F.col("_n_tok").cast("double")
    ) / (
        (F.col("_n_bg").cast("double") * F.col("n_a").cast("double"))
        * F.col("n_b").cast("double")
    )
    s = f.withColumn("_pmi", pmi)
    ranked = row_number_global(
        s, [F.desc("_pmi"), F.asc("w1"), F.asc("w2")], "rank"
    ).filter(F.col("rank") <= top_n)
    return ranked.select(
        "w1",
        "w2",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("_pmi", 6).alias("pmi_ratio"),
        "rank",
    )
