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


def read_partitioned_corpus(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Read a partitioned dataset back; filters on partition columns
    prune directories at plan time (verified in
    tests/test_sources_extra.py). ``merge_schema=True`` unions the
    schemas of all files — the read path for a corpus whose later
    batches added columns (older rows surface NULLs); off by default
    because schema merging reads every file's footer."""
    r = spark.read
    if merge_schema:
        r = r.option("mergeSchema", "true")
    return r.parquet(path)


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_dir: str,
    target_files: int = 1,
) -> int:
    """Compact one hive partition's small files into ``target_files``
    larger ones — the maintenance pass a long-running ingest needs
    (streaming/append writers accumulate tiny files; small files
    multiply scan tasks and footer reads). Rewrites ONLY the given
    partition directory (never the whole dataset). Returns the
    resulting file count.

    Safety: the temp output lives OUTSIDE the dataset root (readers
    listing the dataset never see it as a bogus partition value), and
    new files move in BEFORE old ones are deleted — a crash mid-swap
    leaves duplicate rows (re-runnable) rather than a lost partition.
    True atomic swap needs a table format (Delta/Iceberg); out of
    scope for plain parquet."""
    import os
    import shutil
    import uuid

    full = os.path.join(path, partition_dir)
    old = [f for f in os.listdir(full) if f.startswith("part-")]
    df = spark.read.parquet(full)
    tmp = os.path.join(
        os.path.dirname(os.path.normpath(path)),
        f".compact_tmp_{uuid.uuid4().hex[:8]}",
    )
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    moved = 0
    for f in os.listdir(tmp):
        if f.startswith("part-"):
            shutil.move(os.path.join(tmp, f), os.path.join(full, f"compacted-{f}"))
            moved += 1
    for f in old:
        os.remove(os.path.join(full, f))
    shutil.rmtree(tmp)
    return moved
