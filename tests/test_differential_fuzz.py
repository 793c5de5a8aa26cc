"""Differential fuzzing: seeded template-generated relational queries
run against BOTH Spark and DuckDB on the sf0.001 tables and compared
with the gate's canonicalization. Extends correctness coverage past
the hand-written oracle pairs (SURVEY §5 test plan: differential
tests for every §2.8 operator family).

Templates only emit constructs both engines define identically:
integer/decimal-cast aggregates, equality/range filters, group-bys,
HAVING, and IN lists — all rounded like the gate queries.
"""

import math
import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

NUMERIC = ["l_quantity", "l_extendedprice", "l_discount"]
GROUPS = [
    ["l_returnflag"],
    ["l_linestatus"],
    ["l_returnflag", "l_linestatus"],
    ["l_linenumber"],
]


def gen_query(rng: random.Random) -> str:
    group = rng.choice(GROUPS)
    col = rng.choice(NUMERIC)
    preds = []
    if rng.random() < 0.7:
        preds.append(f"l_quantity {rng.choice(['<', '>=', '='])} {rng.randint(1, 50)}")
    if rng.random() < 0.5:
        preds.append(f"l_discount >= {rng.choice(['0.01', '0.03', '0.05', '0.08'])}")
    if rng.random() < 0.4:
        flags = rng.sample(["'A'", "'N'", "'R'"], rng.randint(1, 2))
        preds.append(f"l_returnflag IN ({', '.join(flags)})")
    where = f"WHERE {' AND '.join(preds)}" if preds else ""
    having = "HAVING COUNT(*) > 3" if rng.random() < 0.4 else ""
    gcols = ", ".join(group)
    return (
        f"SELECT {gcols}, COUNT(*) AS n, "
        f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE), 2) AS s, "
        f"ROUND(MIN({col}), 4) AS mn, ROUND(MAX({col}), 4) AS mx "
        f"FROM lineitem {where} GROUP BY {gcols} {having}"
    )


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


@pytest.fixture(scope="module")
def engines(spark):
    from streaming_cdc_spark.tables import load

    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")
    yield spark, con
    spark.catalog.dropTempView("lineitem")


@pytest.mark.parametrize("seed", range(25))
def test_differential(engines, seed):
    spark, con = engines
    sql = gen_query(random.Random(seed))
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), sql
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ssig = sorted("\x01".join(canon(r[i]) for i in so) for r in srows)
    dsig = sorted("\x01".join(canon(r[i]) for i in do) for r in drows)
    assert ssig == dsig, f"{sql}\nspark={ssig[:2]}\nduck={dsig[:2]}"


@pytest.fixture(scope="module")
def doc_engines(spark):
    from streaming_cdc_spark.tables import load

    docs = load(spark, SF_DIR, "documents")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    yield spark, docs, con


def _sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(canon(r[i]) for i in order) for r in rows)


def _compare(sdf, con, sql):
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(dcols), sql
    assert _sig(sdf.columns, srows) == _sig(dcols, res.fetchall()), sql


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_ngram_repetition(doc_engines, seed):
    """ngram_repetition at a random n vs generated DuckDB SQL."""
    from streaming_cdc_spark.operators.text import ngram_repetition

    spark, docs, con = doc_engines
    n = random.Random(2000 + seed).choice([2, 3, 4, 5])
    sdf = ngram_repetition(docs, n=n)
    sql = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (SELECT doc_id, concat_ws(' ', {", ".join(f"t[i+{j}]" for j in range(n))}) AS ngram
          FROM toks, UNNEST(range(1, greatest(len(t) - {n - 1}, 1) + 1)) AS u(i)),
    per AS (SELECT doc_id, ngram, COUNT(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
           COUNT(*) AS n_distinct_ngrams, MAX(c) AS top_ngram_count,
           ROUND(1.0 - (COUNT(*)::DOUBLE / SUM(c)::DOUBLE), 6) AS dup_ngram_frac
    FROM per GROUP BY doc_id
    """
    _compare(sdf, con, sql)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_chunking(doc_engines, seed):
    """chunk_documents at random chunk/overlap vs generated SQL."""
    from streaming_cdc_spark.operators.text import chunk_documents

    spark, docs, con = doc_engines
    rng = random.Random(3000 + seed)
    chunk = rng.choice([8, 16, 32, 64])
    overlap = rng.randint(0, chunk // 2)
    stride = chunk - overlap
    sdf = chunk_documents(docs, chunk_tokens=chunk, overlap=overlap)
    sql = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ch AS (SELECT doc_id, t, i AS chunk_id
           FROM toks, UNNEST(range(0, CAST(FLOOR((len(t) - 1) / {stride}.0) AS BIGINT) + 1)) AS u(i))
    SELECT doc_id, chunk_id,
           len(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk}]) AS n_tokens,
           CAST(concat('0x', substr(md5(array_to_string(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk}], ' ')), 1, 15)) AS BIGINT) AS chunk_hash
    FROM ch
    """
    _compare(sdf, con, sql)


def _encoder_oracle_sql(ms, me, ls, le, rs, re_, budget, dim):
    """Parameterized DuckDB replay of hash_encode_mentions incl. P8
    recentring, mirroring the hash_encoded_mentions oracle."""
    return f"""
    WITH m AS (
        SELECT doc_id AS mention_index,
               list_filter(string_split(text, ' ')[{ms}:{me}], x -> x <> '') AS mt,
               list_filter(string_split(text, ' ')[{ls}:{le}], x -> x <> '') AS lt,
               list_filter(string_split(text, ' ')[{rs}:{re_}], x -> x <> '') AS rt
        FROM documents),
    rec AS (
        SELECT mention_index, mt, lt, rt,
               LEAST(len(lt), {budget} + GREATEST(0, {budget} - len(rt))) AS tl,
               LEAST(len(rt), {budget} + GREATEST(0, {budget} - len(lt))) AS tr
        FROM m),
    seq AS (
        SELECT mention_index,
               list_concat(list_concat(lt[len(lt) - tl + 1 : len(lt)], mt), rt[1:tr]) AS toks
        FROM rec),
    tok AS (SELECT mention_index, u.t FROM seq, UNNEST(toks) AS u(t)),
    comp AS (
        SELECT mention_index, j.j,
               AVG(CAST(concat('0x', substr(md5(concat(t, '|', CAST(j.j AS VARCHAR))), 1, 15)) AS BIGINT)
                   / 576460752303423488.0 - 1.0) AS c
        FROM tok, (SELECT UNNEST(range(0, {dim})) AS j) j
        GROUP BY 1, 2),
    vec AS (
        SELECT mention_index, SQRT(SUM(c * c)) AS nrm, SUM(c) AS s,
               SUM(CASE WHEN j = 0 THEN c END) AS c0
        FROM comp GROUP BY 1)
    SELECT mention_index, ROUND(c0 / nrm, 6) AS e0_r, ROUND(s / nrm, 6) AS checksum_r
    FROM vec
    """


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_encoder_differential_fuzz(spark, seed):
    """Random mention/context slicings, dims, and budgets: the Spark
    md5-chain encoder must replay exactly in DuckDB every time, not
    just for the registered query's parameters."""
    from pyspark.sql import functions as F

    from streaming_cdc_spark.operators.encoder import hash_encode_mentions
    from streaming_cdc_spark.tables import load

    rng = random.Random(seed)
    m_len = rng.randint(1, 4)
    l_len = rng.randint(0, 12)
    r_len = rng.randint(1, 12)
    ms, me = 1, m_len
    ls, le = me + 1, me + l_len
    rs, re_ = le + 1, le + r_len
    budget = rng.randint(1, 8)
    dim = rng.choice([8, 16, 24])

    docs = load(spark, SF_DIR, "documents")
    toks = F.split("text", " ")
    mentions = docs.select(
        F.col("doc_id").alias("mention_index"),
        F.array_join(F.slice(toks, ms, m_len), " ").alias("mention"),
        F.array_join(F.slice(toks, ls, max(l_len, 0)), " ").alias("left_context"),
        F.array_join(F.slice(toks, rs, r_len), " ").alias("right_context"),
    )
    enc = hash_encode_mentions(mentions, dim=dim, context_budget=budget)
    got = enc.select(
        "mention_index",
        F.round(F.element_at("embedding", 1), 6).alias("e0_r"),
        F.round(F.expr("aggregate(embedding, 0d, (a, x) -> a + x)"), 6).alias("checksum_r"),
    )
    spark_sig = sorted(
        (r["mention_index"], canon(r["e0_r"]), canon(r["checksum_r"])) for r in got.collect()
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    drows = con.execute(_encoder_oracle_sql(ms, me, ls, le, rs, re_, budget, dim)).fetchall()
    duck_sig = sorted((r[0], canon(r[1]), canon(r[2])) for r in drows)
    assert spark_sig == duck_sig, (m_len, l_len, r_len, budget, dim)


@pytest.mark.parametrize("seed", range(5))
def test_decile_binning_differential(spark, seed):
    """quality_decile_bins vs a DuckDB replay, PER DOCUMENT, on
    tie-heavy corpora (tiny vocab, short docs -> few distinct TTR
    values): equal scores must land in identical deciles on both
    engines via the (ttr, doc_id) total-order tiebreak."""
    import pandas as pd

    from streaming_cdc_spark.operators.text import quality_decile_bins

    rng = random.Random(1000 + seed)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["decile"] for r in quality_decile_bins(df).collect()}
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = dict(
        con.execute(
            """
            WITH s AS (SELECT doc_id,
                              CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                                / len(string_split(text, ' ')) AS ttr
                       FROM docs),
            r AS (SELECT doc_id, ttr,
                         ROW_NUMBER() OVER (ORDER BY ttr, doc_id) AS rnk,
                         COUNT(*) OVER () AS n
                  FROM s)
            SELECT doc_id, CAST(FLOOR((10 * (rnk - 1)) / n) AS BIGINT) FROM r
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_progressive_stream_vs_duckdb(spark, tmp_path, seed):
    """The streaming budgeted resolver replayed cross-engine on random
    corpora: odd shapes (empty docs, one-token docs, exact dups, hot
    shingles) with random monotone bucket splits must match a DuckDB
    replay of the whole schedule — prefix df-cap, per-batch top-B cut,
    capped-Jaccard verify."""
    from streaming_cdc_spark.streaming.progressive import ProgressiveResolver

    rng = random.Random(1000 + seed)
    WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "of"]
    n = rng.randint(8, 30)
    texts = []
    for i in range(n):
        shape = rng.random()
        if shape < 0.1:
            texts.append("")
        elif shape < 0.2:
            texts.append(rng.choice(WORDS))
        elif shape < 0.35 and texts:
            texts.append(texts[rng.randrange(len(texts))])
        else:
            texts.append(" ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 12))))
    n_buckets = rng.randint(2, min(4, n))
    cuts = sorted(rng.sample(range(1, n), n_buckets - 1))
    rows = [(i, t, sum(1 for c in cuts if i >= c)) for i, t in enumerate(texts)]
    budget, df_cap, tau = rng.choice([3, 5, 10]), rng.choice([4, 50]), 0.2

    docs = spark.createDataFrame(rows, "doc_id long, text string, bucket int")
    r = ProgressiveResolver(
        str(tmp_path / f"st{seed}"), budget=budget, df_cap=df_cap, tau=tau
    )
    for b in sorted({x[2] for x in rows}):
        r.apply_batch(docs.filter(f"bucket = {b}"), b)
    got = sorted(tuple(x) for x in r.results(spark).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, bucket INT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(x)
        for x in con.execute(f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
               FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)),
        sbat AS (SELECT sh.doc_id, sh.shingle, d.bucket AS bk
                 FROM sh JOIN docs d USING (doc_id)),
        ks AS (SELECT DISTINCT bucket AS k FROM docs),
        dfk AS (SELECT ks.k, s.shingle, COUNT(*) AS c
                FROM ks JOIN sbat s ON s.bk <= ks.k GROUP BY 1, 2),
        keepk AS (SELECT k, shingle FROM dfk WHERE c <= {df_cap}),
        cand AS (SELECT sb.bk AS batch_id, sa.doc_id AS doc_a, sb.doc_id AS doc_b,
                        COUNT(*) AS cbs
                 FROM sbat sa
                 JOIN sbat sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
                 JOIN keepk kk ON kk.k = sb.bk AND kk.shingle = sa.shingle
                 GROUP BY 1, 2, 3),
        bud AS (SELECT batch_id, doc_a, doc_b, cbs FROM (
                    SELECT batch_id, doc_a, doc_b, cbs,
                           ROW_NUMBER() OVER (PARTITION BY batch_id
                                              ORDER BY cbs DESC, doc_a, doc_b) AS rn
                    FROM cand) WHERE rn <= {budget}),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
        SELECT batch_id, cbs, COUNT(*) AS n_pairs,
               CAST(SUM(CASE WHEN cbs / (x.n + y.n - cbs) >= {tau} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_matches
        FROM bud JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        GROUP BY 1, 2
        """).fetchall()
    )
    assert got == want, f"seed={seed} budget={budget} df_cap={df_cap}\n{got}\n{want}"


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_block_purity(spark, seed):
    """Distributed dendrogram purity on the id-block fixture tree vs
    the arithmetic DuckDB replay, under RANDOM sparse id sets (chain
    nodes) and random labelings — the purity math is rational, so the
    only cross-engine difference is final sum order."""
    from streaming_cdc_spark.metrics.purity import dendrogram_purity_df
    from streaming_cdc_spark.operators.treecut import block_dendrogram

    rng = random.Random(7000 + seed)
    n = rng.randint(4, 24)
    ids = rng.sample(range(64), n)
    labels = [rng.choice("ABC"[: rng.randint(2, 3)]) for _ in ids]
    # need at least one same-label pair or p* = 0 (operator assumes
    # p* > 0, as does the reference)
    labels[0] = labels[1] = "A"
    df = spark.createDataFrame(
        list(zip(ids, labels)), "vec_id long, label string"
    )
    got = dendrogram_purity_df(block_dendrogram(df, label_col="label")).first()["purity"]

    values = ", ".join(f"({i}, '{l}')" for i, l in zip(ids, labels))
    con = duckdb.connect()
    sql = f"""
    WITH emb(vec_id, label) AS (VALUES {values}),
    params AS (SELECT GREATEST(1, CAST(CEIL(LOG2(MAX(vec_id) + 1)) AS INT)) AS L
               FROM emb),
    lv AS (SELECT e.vec_id, e.label, gs.l
           FROM emb e
           CROSS JOIN (SELECT UNNEST(range(0, (SELECT L + 1 FROM params))) AS l) gs),
    hist AS (SELECT l, vec_id >> l AS k, label, COUNT(*) AS h FROM lv GROUP BY 1, 2, 3),
    nl AS (SELECT l, k, CAST(SUM(h) AS BIGINT) AS n FROM hist GROUP BY 1, 2),
    contrib AS (
        SELECT CAST(hl.h * hr.h * hh.h AS DOUBLE) / nl.n AS c
        FROM (SELECT DISTINCT l, k FROM hist WHERE l >= 1) p
        JOIN hist hl ON hl.l = p.l - 1 AND hl.k = 2 * p.k
        JOIN hist hr ON hr.l = p.l - 1 AND hr.k = 2 * p.k + 1 AND hr.label = hl.label
        JOIN hist hh ON hh.l = p.l AND hh.k = p.k AND hh.label = hl.label
        JOIN nl ON nl.l = p.l AND nl.k = p.k
    ),
    tot AS (SELECT SUM(t * (t - 1) / 2.0) AS p_star
            FROM (SELECT label, COUNT(*) AS t FROM emb GROUP BY 1) q)
    SELECT ROUND((SELECT COALESCE(SUM(c), 0.0) FROM contrib)
                 / (SELECT p_star FROM tot), 6) AS purity
    """
    want = con.execute(sql).fetchone()[0]
    assert got == want, (ids, labels, got, want)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_stratified_sample(spark, seed):
    """hash-rate + fixed-k sampling vs generated SQL at random group
    shapes, rates, and k — all integer arithmetic, exact equality."""
    from pyspark.sql import functions as F

    from streaming_cdc_spark.operators.sampling import (
        deterministic_group_topk,
        hash_rate_sample,
    )

    rng = random.Random(8000 + seed)
    n_groups = rng.randint(1, 5)
    rows = [
        (f"g{rng.randint(0, n_groups - 1)}", i)
        for i in range(rng.randint(10, 120))
    ]
    rate = rng.choice([50, 250, 500, 900])
    k = rng.randint(1, 9)
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    srate = {
        tuple(r)
        for r in hash_rate_sample(df, "lang", "doc_id", rate).collect()
    }
    stopk = {
        tuple(r)
        for r in deterministic_group_topk(df, "lang", "doc_id", k).collect()
    }
    values = ", ".join(f"('{g}', {i})" for g, i in rows)
    con = duckdb.connect()
    base = f"""
    WITH d(lang, doc_id) AS (VALUES {values}),
    h AS (SELECT lang, doc_id,
                 CAST(concat('0x', substr(md5(concat(lang, '|',
                      CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
          FROM d)
    """
    drate = set(con.execute(base + f"SELECT lang, doc_id FROM h WHERE hv % 1000 < {rate}").fetchall())
    dtopk = set(con.execute(base + f"""
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
            FROM h) q WHERE rn <= {k}
    """).fetchall())
    assert srate == drate
    assert stopk == dtopk


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_changelog_apply_vs_duckdb(spark, seed):
    """Randomized op-logs (random key counts, op mixes, shuffled
    arrival order, duplicate-free random seqs) applied by
    apply_changelog must equal DuckDB's arg_max/HAVING formulation —
    the CDC semantics fuzzed beyond the hand-written fixture."""
    from streaming_cdc_spark.operators.changelog import apply_changelog

    rng = random.Random(1000 + seed)
    n_keys = rng.randint(3, 25)
    seqs = rng.sample(range(10_000), rng.randint(20, 300))
    rows = []
    for s in seqs:
        k = rng.randrange(n_keys)
        op = rng.choices(["I", "U", "D"], weights=[3, 5, 2])[0]
        v = None if op == "D" and rng.random() < 0.5 else round(rng.uniform(-50, 50), 2)
        rows.append((k, s, op, v))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, seq long, op string, v double")
    got = {
        (r["k"], r["seq"], r["op"], r["v"])
        for r in apply_changelog(df, ["k"], "seq", "op", ["v"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE log(k BIGINT, seq BIGINT, op VARCHAR, v DOUBLE)"
    )
    con.executemany("INSERT INTO log VALUES (?, ?, ?, ?)", rows)
    want = {
        tuple(r)
        for r in con.execute(
            """
            SELECT k, MAX(seq) AS seq, arg_max(op, seq) AS op,
                   arg_max(v, seq) AS v
            FROM log GROUP BY k HAVING arg_max(op, seq) != 'D'
            """
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_ivm_deltas_vs_recompute(spark, seed):
    """Randomized op-logs: sum-of-deltas (changelog_deltas) equals the
    recomputed view over current state for every key — the IVM theorem
    fuzzed, NULL-valued deletes and leading updates included."""
    from streaming_cdc_spark.operators.changelog import (
        apply_changelog,
        changelog_deltas,
    )
    from pyspark.sql import functions as F

    rng = random.Random(2000 + seed)
    seqs = rng.sample(range(5_000), rng.randint(30, 200))
    rows = [
        (
            rng.randrange(12),
            s,
            rng.choices(["I", "U", "D"], weights=[3, 4, 3])[0],
            round(rng.uniform(0, 99), 2),
        )
        for s in seqs
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, seq long, op string, v double")
    d = changelog_deltas(df, ["k"], "seq", "op", "v")
    got = {
        r["k"]: (int(r["live"]), float(r["sv"]))
        for r in d.groupBy("k")
        .agg(F.sum("delta_live").alias("live"), F.sum("delta_value").alias("sv"))
        .collect()
    }
    state = {
        r["k"]: float(r["v"])
        for r in apply_changelog(df, ["k"], "seq", "op", ["v"]).collect()
    }
    for k, (live, sv) in got.items():
        if k in state:
            assert live == 1 and math.isclose(sv, state[k], abs_tol=1e-9), k
        else:
            assert live == 0 and sv == 0.0, k
