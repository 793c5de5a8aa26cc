"""Kafka mention-stream source (engine extension of S1; SURVEY §1.1).

The reference's premise is a mention STREAM consumed in arrival order
(nn_thresh.py:155-194 iterates the embedding file line by line); its
only transport is files. A real deployment feeds the incremental
linker (streaming/linker.py) from a message bus, so this module
declares the Kafka wrapper: topic -> schema'd mention DataFrame with
a per-partition arrival index.

The Kafka connector jar (spark-sql-kafka) is not part of a plain
PySpark install, and this sandbox has no broker — so construction is
guarded: ``read_mention_stream_kafka`` raises a clear RuntimeError
when the data source is missing, and the VALUE-DECODING logic is
factored into ``parse_mention_payloads`` which is pure DataFrame code
and unit-tested against static binary rows. Ordering note: Kafka
guarantees order only within a topic partition, so the stream
position is (partition, offset) — exactly the per-key arrival order
the linker's keyed state consumes (key = topic partition or an
explicit mention key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_cdc_spark.sources.schemas import MENTION_SCHEMA


def parse_mention_payloads(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode Kafka-shaped records (binary ``value`` JSON payloads +
    ``partition``/``offset`` metadata when present) into schema'd
    mention rows. Pure column expressions — works identically on a
    static DataFrame, which is how it is unit-tested without a
    broker."""
    cols = set(raw.columns)
    out = raw.withColumn(
        "_mention", F.from_json(F.col(value_col).cast("string"), MENTION_SCHEMA)
    )
    meta = []
    if {"partition", "offset"} <= cols:
        meta = [
            F.col("partition").alias("stream_key"),
            F.col("offset").alias("stream_pos"),
        ]
    return out.select(*meta, "_mention.*")


def read_mention_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1-over-Kafka: a streaming mention DataFrame from a topic.

    Requires the spark-sql-kafka connector on the session classpath
    (``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    raises RuntimeError with that hint when the data source is
    absent so callers can fall back to the file stream
    (sources/mentions.read_mentions_jsonl(streaming=True))."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent
        raise RuntimeError(
            "Kafka data source unavailable — add the spark-sql-kafka "
            "connector to spark.jars.packages (org.apache.spark:"
            "spark-sql-kafka-0-10_2.13) or use "
            "read_mentions_jsonl(streaming=True) as the file-based "
            "stream source"
        ) from e
    return parse_mention_payloads(raw)
