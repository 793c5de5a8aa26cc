"""ECB+ XML source (S8) — preprocess_ecbplus.py:40-123: XML documents
with <token>, <Markables>, <Relations> sections become mention records
(cross-document coreference relations as gold entity ids).

Whole-file XML cannot split on a line delimiter, so files are read
with wholetext and parsed per file with ElementTree inside an
Arrow-batched pandas function — Python per FILE, files parallelize
across partitions.
"""

from __future__ import annotations

from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MENTION_SCHEMA = (
    "left_context string, mention string, right_context string, "
    "entity_id string, document_id string"
)


def _parse_ecb_xml(content: str, doc_id: str, gold_sentences: set[str] | None):
    root = ElementTree.fromstring(content)
    token_list = list(root.iter("token"))
    tokens = {t.attrib["t_id"]: t for t in token_list}
    full_text = [t.text or "" for t in token_list]
    order = {t.attrib["t_id"]: i for i, t in enumerate(token_list)}

    markables = root.find("Markables")
    relations = root.find("Relations")
    if markables is None or relations is None:
        return
    mentions = {}
    for m in markables:
        t_ids = [a.attrib["t_id"] for a in m.findall("token_anchor")]
        mentions[m.attrib.get("m_id")] = (m.tag, t_ids)
    for r in relations:
        r_id = r.attrib.get("r_id")
        for anchor in r:
            m_id = anchor.attrib.get("m_id")
            if m_id not in mentions:
                continue
            tag, t_ids = mentions[m_id]
            # P4 validity filter (preprocess_ecbplus.py:73-80)
            if "ACT" in tag or "NEG" in tag or not t_ids:
                continue
            first, last = tokens.get(t_ids[0]), tokens.get(t_ids[-1])
            if first is None or last is None:
                continue
            if gold_sentences is not None:
                # P5 gold-sentence filter (preprocess_ecbplus.py:110-117)
                if (
                    first.attrib.get("sentence") not in gold_sentences
                    or last.attrib.get("sentence") not in gold_sentences
                ):
                    continue
            s, e = order[t_ids[0]], order[t_ids[-1]] + 1
            yield {
                "left_context": " ".join(full_text[:s]),
                "mention": " ".join(full_text[s:e]),
                "right_context": " ".join(full_text[e:]),
                "entity_id": r_id,
                "document_id": doc_id,
            }


def read_ecbplus(
    spark: SparkSession, path: str, gold_sentences: set[str] | None = None
) -> DataFrame:
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    raw = spark.read.text(path, wholetext=True).selectExpr(
        "value", "input_file_name() as fname"
    )
    gold = set(gold_sentences) if gold_sentences is not None else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content, fname in zip(pdf["value"], pdf["fname"]):
                doc_id = fname.rsplit("/", 1)[-1]
                rows.extend(_parse_ecb_xml(content, doc_id, gold))
            yield pd.DataFrame(
                rows,
                columns=[
                    "left_context",
                    "mention",
                    "right_context",
                    "entity_id",
                    "document_id",
                ],
            )

    return raw.mapInPandas(gen, MENTION_SCHEMA)
