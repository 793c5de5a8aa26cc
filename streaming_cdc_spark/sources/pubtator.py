"""PubTator document source (S6) — medmentions.py:9-53 re-expressed.

Spark-first design: the file is read with ``lineSep='\\n\\n'`` so each
row is one blank-line-delimited document block, then the block is
parsed ENTIRELY with Column expressions (split / transform / filter /
substring) — no Python per row, whole-stage codegen, parallel over
blocks regardless of file size. The reference's deque-based
sequential parser (medmentions.py:26-53) becomes a per-row expression
tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_block(block: Column) -> Column:
    lines = F.filter(F.split(block, "\n"), lambda l: F.length(l) > 0)
    # try_element_at: a malformed/truncated block yields nulls instead
    # of an ANSI out-of-bounds error
    title_parts = F.split(F.try_element_at(lines, F.lit(1)), r"\|")
    abstract_parts = F.split(F.try_element_at(lines, F.lit(2)), r"\|")
    mention_lines = F.slice(lines, 3, F.greatest(F.size(lines) - 2, F.lit(0)))
    # try_element_at + try_cast: a truncated or non-numeric mention
    # line yields null fields instead of an ANSI out-of-bounds /
    # cast error killing the whole file (untrusted interchange input).
    # Two-stage transform: lambdas re-evaluate per use, so split each
    # line ONCE in the inner pass, then index the parts array.
    mentions = F.transform(
        F.transform(mention_lines, lambda l: F.split(l, "\t")),
        lambda p: F.struct(
            F.try_element_at(p, F.lit(2)).try_cast("int").alias("start"),
            F.try_element_at(p, F.lit(3)).try_cast("int").alias("end"),
            F.try_element_at(p, F.lit(4)).alias("text"),
            F.split(F.try_element_at(p, F.lit(5)), ",").alias("semantic_types"),
            F.try_element_at(p, F.lit(6)).alias("entity_id"),
        ),
    )
    return F.struct(
        title_parts[0].alias("pmid"),
        # title/abstract may themselves contain '|' — rejoin the tail
        F.array_join(F.slice(title_parts, 3, F.greatest(F.size(title_parts) - 2, F.lit(1))), "|").alias("title"),
        F.array_join(F.slice(abstract_parts, 3, F.greatest(F.size(abstract_parts) - 2, F.lit(1))), "|").alias("abstract"),
        mentions.alias("mentions"),
    )


def read_pubtator(spark: SparkSession, path: str) -> DataFrame:
    """Documents from a PubTator file: (pmid, title, abstract,
    mentions array<struct<start,end,text,semantic_types,entity_id>>)."""
    raw = spark.read.option("lineSep", "\n\n").text(path)
    parsed = raw.filter(F.length(F.trim("value")) > 0).select(
        _parse_block(F.col("value")).alias("doc")
    )
    return parsed.select("doc.*")


def pubtator_mentions(docs: DataFrame) -> DataFrame:
    """Explode documents into mention records with context splits —
    P1 (preprocess_medmentions.py:58-65): full text = title + ' ' +
    abstract; left/mention/right via substring arithmetic."""
    full = F.concat_ws(" ", F.col("title"), F.col("abstract"))
    m = docs.select(
        "pmid", full.alias("full_text"), F.posexplode("mentions").alias("pos", "m")
    )
    return m.select(
        F.col("pmid").alias("document_id"),
        F.col("pos").alias("mention_pos"),
        F.expr("substring(full_text, 1, m.start)").alias("left_context"),
        F.expr("substring(full_text, m.start + 1, m.end - m.start)").alias("mention"),
        F.expr("substring(full_text, m.end + 1, length(full_text) - m.end)").alias("right_context"),
        F.col("m.semantic_types").alias("type"),
        F.col("m.entity_id").alias("entity_id"),
    )
