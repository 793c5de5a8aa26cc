"""Zeshel join-source (S9) — preprocess_zeshel.py:15-76 re-expressed
as a pure DataFrame DAG: the reference's in-memory dict probe becomes
a broadcast hash join; token-index context splits become slice()
expressions; the per-label self-mentions become a unionByName branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def zeshel_mentions(documents: DataFrame, mentions: DataFrame) -> DataFrame:
    """documents: (document_id, title, text, category);
    mentions: (context_document_id, label_document_id, start_index,
    end_index) with end_index INCLUSIVE (reference semantics).

    Returns mention records with left/mention/right token splits,
    entity_id = label document title, plus one self-mention per
    distinct label document, ordered by category with a contiguous
    mention_index (R5; ties broken deterministically by document_id
    and start_index — the reference relies on file order here).
    """
    docs = documents.select(
        "document_id",
        "title",
        "text",
        "category",
        F.split("text", " ").alias("toks"),
    )
    ctx = F.broadcast(
        docs.select(
            F.col("document_id").alias("context_document_id"),
            F.col("toks"),
            F.col("category"),
        )
    )
    lab = F.broadcast(
        docs.select(
            F.col("document_id").alias("label_document_id"),
            F.col("title").alias("entity_id"),
        )
    )
    m = (
        mentions.join(ctx, "context_document_id")
        .join(lab, "label_document_id")
        .select(
            F.array_join(F.slice("toks", 1, F.col("start_index")), " ").alias("left_context"),
            F.array_join(
                F.slice(
                    "toks",
                    F.col("start_index") + 1,
                    F.col("end_index") - F.col("start_index") + 1,
                ),
                " ",
            ).alias("mention"),
            F.array_join(
                F.slice(
                    "toks",
                    F.col("end_index") + 2,
                    F.greatest(F.size("toks") - F.col("end_index") - 1, F.lit(0)),
                ),
                " ",
            ).alias("right_context"),
            "entity_id",
            "category",
            F.col("context_document_id").alias("document_id"),
            F.col("start_index").alias("_order2"),
        )
    )
    # one self-mention per referenced label document (J5 union,
    # preprocess_zeshel.py:60-71): title removed at its FIRST
    # occurrence only (replace-first via locate+substring surgery —
    # Spark's replace() is replace-all)
    used_labels = mentions.select("label_document_id").distinct()
    pos = F.expr("instr(text, title)")
    self_m = (
        used_labels.join(
            docs.select("document_id", "title", "text", "category"),
            F.col("label_document_id") == F.col("document_id"),
        )
        .select(
            F.lit("").alias("left_context"),
            F.col("title").alias("mention"),
            F.trim(
                F.when(
                    pos > 0,
                    F.concat(
                        F.expr("substring(text, 1, instr(text, title) - 1)"),
                        F.expr("substring(text, instr(text, title) + length(title), length(text))"),
                    ),
                ).otherwise(F.col("text"))
            ).alias("right_context"),
            F.col("title").alias("entity_id"),
            "category",
            "document_id",
            F.lit(-1).alias("_order2"),
        )
    )
    out = m.unionByName(self_m)
    w = W.orderBy("category", "document_id", "_order2", "mention")
    return out.withColumn("mention_index", F.row_number().over(w) - 1).drop("_order2")
