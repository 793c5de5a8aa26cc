"""Coverage-closing queries: A2 singletons, P9 regex tokenization,
P12 L2 kernels, V4-V6 encoder pattern, rollup (bonus surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.functions.vectors import as_double, inv_l2_kernel, inv_sql2_kernel
from streaming_cdc_spark.operators.text import regex_tokenize
from streaming_cdc_spark.queries.registry import query
from streaming_cdc_spark.tables import load


@query(
    "singleton_entities",
    oracle="""
    SELECT COUNT(*) AS n_singletons FROM (
        SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) = 1
    )
    """,
)
def singleton_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: entities with exactly one mention
    (scripts/unique_entities.py:13-14)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 1)
        .agg(F.count("*").alias("n_singletons"))
    )


@query(
    "regex_token_stats",
    oracle=r"""
    SELECT len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: BPE-ish regex tokenization — distribution of subtoken
    counts over the corpus."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.size(regex_tokenize("text")).alias("n_subtokens"))
        .groupBy("n_subtokens")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "l2_kernel_pairs",
    oracle="""
    SELECT a.vec_id AS u, b.vec_id AS v,
           ROUND(1.0 / (1.0 + sqrt(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) ** 2)), 6) AS inv_l2_r,
           ROUND(1.0 / (1.0 + list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) ** 2), 6) AS inv_sql2_r
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 50
    """,
)
def l2_kernel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: the reference's alternative similarity kernels
    (grinch_alg.py:70-92): 1/(1+l2) and 1/(1+sql2) on consecutive
    vector pairs."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("u"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"))
    joined = a.join(b, F.col("v") == F.col("u") + 1)
    da, db = as_double("ea"), as_double("eb")
    return joined.select(
        "u",
        "v",
        F.round(inv_l2_kernel(da, db), 6).alias("inv_l2_r"),
        F.round(inv_sql2_kernel(da, db), 6).alias("inv_sql2_r"),
    )


@query(
    "hash_encoded_mentions",
    oracle="""
    WITH m AS (
        SELECT doc_id AS mention_index,
               list_filter(string_split(text, ' ')[1:2], x -> x <> '') AS mt,
               list_filter(string_split(text, ' ')[3:22], x -> x <> '') AS lt,
               list_filter(string_split(text, ' ')[23:42], x -> x <> '') AS rt
        FROM documents),
    rec AS (
        SELECT mention_index, mt, lt, rt,
               LEAST(len(lt), 8 + GREATEST(0, 8 - len(rt))) AS tl,
               LEAST(len(rt), 8 + GREATEST(0, 8 - len(lt))) AS tr
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
        FROM tok, (SELECT UNNEST(range(0, 32)) AS j) j
        GROUP BY 1, 2),
    vec AS (
        SELECT mention_index, SQRT(SUM(c * c)) AS nrm, SUM(c) AS s,
               SUM(CASE WHEN j = 0 THEN c END) AS c0
        FROM comp GROUP BY 1)
    SELECT mention_index,
           ROUND(c0 / nrm, 6) AS e0_r,
           ROUND(s / nrm, 6) AS checksum_r
    FROM vec
    """,
)
def hash_encoded_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4-V6 encoder surface: feature-hashing encoder over synthetic
    mention records (documents split into mention + contexts), P8
    recentring, mean-pool + L2 normalize. The mapInPandas shape is
    exactly a transformer encoder UDF; the md5-chain token vectors
    make the whole encoder hash-checkable against the SQL oracle
    (first component + component checksum of every embedding)."""
    from streaming_cdc_spark.operators.encoder import hash_encode_mentions

    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    mentions = docs.select(
        F.col("doc_id").alias("mention_index"),
        F.array_join(F.slice(toks, 1, 2), " ").alias("mention"),
        F.array_join(F.slice(toks, 3, 20), " ").alias("left_context"),
        F.array_join(F.slice(toks, 23, 20), " ").alias("right_context"),
    )
    enc = hash_encode_mentions(mentions, dim=32, context_budget=8)
    return enc.select(
        "mention_index",
        F.round(F.element_at("embedding", 1), 6).alias("e0_r"),
        F.round(F.expr("aggregate(embedding, 0d, (a, x) -> a + x)"), 6).alias("checksum_r"),
    )


@query(
    "docs_with_token",
    oracle="""
    SELECT lang,
           COUNT(*) FILTER (list_contains(string_split(text, ' '), 'spark')) AS n_with_spark,
           COUNT(*) FILTER (list_contains(string_split(text, ' '), 'query')) AS n_with_query,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def docs_with_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_contains surface (§2.8): membership counts per language."""
    docs = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    return docs.groupBy("lang").agg(
        F.count_if(F.array_contains(t, "spark")).alias("n_with_spark"),
        F.count_if(F.array_contains(t, "query")).alias("n_with_query"),
        F.count("*").alias("n_docs"),
    )


@query(
    "revenue_rollup",
    oracle="""
    SELECT r_name, o_orderstatus,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, o_orderstatus)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bonus surface beyond reference parity (SURVEY §2.8 note):
    hierarchical ROLLUP totals — free from Spark SQL, exposed and
    oracle-checked."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    j = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.rollup("r_name", "o_orderstatus").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
        F.count("*").alias("n_orders"),
    )


@query(
    "salted_event_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation under the gate: the explicit two-phase salted
    aggregation (operators/skew.py, for hot keys AQE can't salt —
    aggregations) must combine to EXACTLY the plain GROUP BY — counts
    and decimal partial sums are re-combinable by summation, which is
    what the oracle checks."""
    from streaming_cdc_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        "event_type",
        {
            "n": F.count(F.lit(1)),
            "_sum_d": F.sum(F.col("value").cast("decimal(18,2)")),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("_sum_d").cast("double"), 2).alias("sum_value"),
    )
