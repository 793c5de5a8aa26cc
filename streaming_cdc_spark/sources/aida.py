"""AIDA CoNLL/TSV source (S7) — preprocess_aida_yago2.py:25-64.

``-DOCSTART-`` delimits documents; BIO tags mark mention spans over
the accumulated token text. Span offsets are a running sum over
tokens, so the per-block parse runs in an Arrow-batched pandas
function (``mapInPandas``) — Python per BLOCK, not per token-row, and
blocks parallelize across partitions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AIDA_DOC_SCHEMA = (
    "document_id string, text string, "
    "mentions array<struct<start:int, end:int, entity_id:string>>"
)


def _parse_block(block: str):
    lines = [l for l in block.split("\n") if l.strip()]
    if not lines:
        return None
    m = re.search(r"\((.*?)\)", lines[0])
    if not m:
        return None
    document_id = m.group(1)
    text_parts: list[str] = []
    length = 0
    mentions: list[dict] = []
    body = lines[1:]
    for i, line in enumerate(body):
        split = line.split("\t")
        token = split[0]
        bio = split[1] if len(split) > 1 else None
        entity = split[3] if len(split) > 3 else None
        if bio == "B":
            mentions.append({"start": length, "end": None, "entity_id": entity})
        text_parts.append(token)
        length += len(token)
        if bio in ("B", "I") and mentions:
            mentions[-1]["end"] = length
        if i < len(body) - 1:
            text_parts.append(" ")
            length += 1
    return {
        "document_id": document_id,
        "text": "".join(text_parts),
        "mentions": [(mm["start"], mm["end"], mm["entity_id"]) for mm in mentions],
    }


def read_aida(spark: SparkSession, path: str) -> DataFrame:
    """Documents from an AIDA CoNLL file: (document_id, text,
    mentions array<struct<start,end,entity_id>>)."""
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    raw = spark.read.option("lineSep", "-DOCSTART-").text(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for r in (_parse_block(b) for b in pdf["value"]) if r]
            yield pd.DataFrame(
                rows, columns=["document_id", "text", "mentions"]
            )

    return raw.mapInPandas(gen, AIDA_DOC_SCHEMA)


def aida_mentions(docs: DataFrame, drop_nme: bool = True) -> DataFrame:
    """Mention records with context splits and per-document stream
    position; P3 filter drops '--NME--' rows
    (preprocess_aida_yago2.py:89-90)."""
    m = docs.select("document_id", "text", F.posexplode("mentions").alias("pos", "m"))
    out = m.select(
        "document_id",
        F.col("pos").alias("mention_pos"),
        F.expr("substring(text, 1, m.start)").alias("left_context"),
        F.expr("substring(text, m.start + 1, m.end - m.start)").alias("mention"),
        F.expr("substring(text, m.end + 1, length(text) - m.end)").alias("right_context"),
        F.col("m.entity_id").alias("entity_id"),
    )
    if drop_nme:
        out = out.filter(F.col("entity_id") != "--NME--")
    return out
