"""KILT/BLINK source (S10) — preprocess_kilt.py:19-46: nested-field
projection over JSONL (meta.{left_context,mention,right_context},
output[0].answer) with explicit schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KILT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("left_context", T.StringType()),
                    T.StructField("mention", T.StringType()),
                    T.StructField("right_context", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "output",
            T.ArrayType(T.StructType([T.StructField("answer", T.StringType())])),
        ),
    ]
)


def read_kilt_mentions(spark: SparkSession, path: str) -> DataFrame:
    """Mention records from KILT-format JSONL; rows without an output
    answer are dropped (try_element_at keeps empty arrays null-safe
    under ANSI mode)."""
    raw = spark.read.schema(KILT_SCHEMA).json(path)
    return (
        raw.select(
            F.col("meta.left_context").alias("left_context"),
            F.col("meta.mention").alias("mention"),
            F.col("meta.right_context").alias("right_context"),
            F.try_element_at("output", F.lit(1))["answer"].alias("entity_id"),
        )
        .filter(F.col("entity_id").isNotNull())
    )
