"""Mention-stream I/O and the file formats the reference exchanges
between stages (S1-S5, S11): mention JSONL, embedding TSV, entity
vocab CSV, cluster-pair CSV, dendrogram TSV — each as a schema'd
DataFrame read/write. Engine-native persistence is Parquet; these
readers exist for interchange with reference-format data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from streaming_cdc_spark.sources.schemas import (
    CLUSTER_PAIR_SCHEMA,
    DENDROGRAM_SCHEMA,
    MENTION_SCHEMA,
)


def read_mentions_jsonl(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """S1: mention records from JSONL with the explicit schema
    (baseline.py:76-82 idiom). streaming=True returns a file-stream
    DataFrame for Structured Streaming pipelines."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(MENTION_SCHEMA).json(path)


def with_stream_index(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """R5: assign a contiguous 0-based mention_index by an explicit
    ordering (the reference's implicit line order,
    preprocess_medmentions.py:131). row_number over a global sort —
    use only where the stream-order contract genuinely matters."""
    w = W.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("mention_index", F.row_number().over(w) - 1)


def read_embeddings_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S2: ``uid \\t entity \\t f0..f_{D-1}`` rows -> (mention_index,
    entity_id, embedding array<float>) (nn_thresh.py:157-171).
    Dimension-agnostic: the tail of the split is the vector."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    # try_cast: a malformed uid or vector component nulls out instead
    # of failing the whole read (Spark 4 ANSI mode makes plain cast
    # THROW on bad numerics — interchange files are untrusted input)
    return raw.select(
        parts[0].try_cast("long").alias("mention_index"),
        parts[1].alias("entity_id"),
        F.transform(
            F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0))),
            lambda x: x.try_cast("float"),
        ).alias("embedding"),
    )


def build_entity_vocab(mentions: DataFrame, entity_col: str = "entity_id") -> DataFrame:
    """S3/R4: frequency-descending entity vocabulary with [PAD] at
    index 0 (utils.py:53-75; preprocess_medmentions.py:69-75). Ties
    break on entity_id ascending for determinism (the reference's
    sort is unstable on ties)."""
    spark = mentions.sparkSession
    counts = mentions.groupBy(F.col(entity_col).alias("entity_id")).agg(
        F.count("*").alias("count")
    )
    w = W.orderBy(F.desc("count"), F.asc("entity_id"))
    ranked = counts.select(
        F.row_number().over(w).cast("int").alias("index"), "entity_id", "count"
    )
    pad = spark.createDataFrame([(0, "[PAD]", 0)], "index int, entity_id string, count long")
    return pad.unionByName(ranked)


def write_cluster_pairs(df: DataFrame, path: str) -> None:
    """S4: (mention_index, true_id, pred_id) as CSV (nn_thresh.py:192-194)."""
    df.select("mention_index", "true_id", "pred_id").write.mode("overwrite").csv(path)


def read_cluster_pairs(spark: SparkSession, path: str) -> DataFrame:
    """S5: cluster pairs back as a keyed DataFrame (eval_clusters.py:186-195)."""
    return spark.read.schema(CLUSTER_PAIR_SCHEMA).csv(path)


def write_dendrogram(df: DataFrame, path: str) -> None:
    """S11 sink: edge list as TSV (grinch_alg.py:597-610); null parent
    = root, serialized as the literal 'None' for reference parity."""
    out = df.select(
        F.col("uid"),
        F.coalesce(F.col("parent_uid"), F.lit("None")).alias("parent_uid"),
        F.coalesce(F.col("label"), F.lit("None")).alias("label"),
    )
    out.write.mode("overwrite").option("sep", "\t").csv(path)


def write_embeddings_tsv_stdout(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    out=None,
) -> int:
    """S13 stdout TSV sink (train_el.py:254-256,
    encode_mentions.py:120-122; scripts/cluster.sh:2-9 pipes it into
    the next stage): one ``id\\tlabel\\tv1\\t...\\tvN`` line per row.

    Row formatting runs DISTRIBUTED (one concat_ws expression per
    row); the driver only streams finished strings partition-by-
    partition via toLocalIterator — stdout is inherently a serial
    driver-side sink, so nothing is gained by collecting first and
    nothing larger than one partition is ever resident. Returns the
    line count."""
    import sys

    out = out if out is not None else sys.stdout
    lines = df.select(
        F.concat_ws(
            "\t",
            F.col(id_col).cast("string"),
            F.col(label_col).cast("string"),
            F.concat_ws("\t", F.transform(F.col(vec_col), lambda x: x.cast("string"))),
        ).alias("line")
    )
    n = 0
    for row in lines.toLocalIterator():
        print(row["line"], file=out)
        n += 1
    return n


def read_dendrogram(spark: SparkSession, path: str) -> DataFrame:
    """S11 scan: TSV edge list -> (uid, parent_uid, label) with 'None'
    mapped back to null (dendrogram_purity.py:48-61)."""
    df = spark.read.schema(DENDROGRAM_SCHEMA).option("sep", "\t").csv(path)
    none_to_null = lambda c: F.when(F.col(c) == "None", F.lit(None)).otherwise(F.col(c))  # noqa: E731
    return df.select(
        "uid",
        none_to_null("parent_uid").alias("parent_uid"),
        none_to_null("label").alias("label"),
    )
