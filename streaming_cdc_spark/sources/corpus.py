"""Partitioned corpus layout — the storage pattern a 100 TB
training-data pipeline actually ships: hive-style
``key=value/part-*.parquet`` directories so downstream jobs that
filter on the partition key scan only the matching directories
(partition pruning happens at planning time, before any file I/O).

The reference stages data as flat JSONL/TSV files piped between
processes (scripts/cluster.sh:2-9); on Spark the equivalent staging
surface is a partitioned parquet dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write a hive-partitioned parquet dataset. ``partition_cols``
    should be low-cardinality routing keys (lang, source, date
    bucket); high-cardinality keys explode into millions of tiny
    directories. ``max_records_per_file`` caps file size so one hot
    partition (one dominant language) still splits into parallel
    scan units downstream. ``sort_cols`` clusters rows WITHIN each
    file (sortWithinPartitions — no extra shuffle): parquet then
    stores tight min/max stats per row group, so point/range filters
    on those columns skip row groups a random layout could not."""
    if sort_cols:
        df = df.sortWithinPartitions(*partition_cols, *sort_cols)
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.partitionBy(*partition_cols).parquet(path)


def read_partitioned_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset back; filters on partition columns
    prune directories at plan time (verified in
    tests/test_sources_extra.py)."""
    return spark.read.parquet(path)
