"""Explicit StructTypes for every record type the reference exchanges
via files (SURVEY §1.1). Schemas are fixed and declared — the
reference's implicit json.loads dynamism (utils.py:46-51) is replaced
by permissive reads against these types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The core mention record (preprocess_medmentions.py:59-65, 124-133;
# superset across datasets — absent fields are null).
MENTION_SCHEMA = T.StructType(
    [
        T.StructField("mention_index", T.LongType()),
        T.StructField("document_id", T.StringType()),
        T.StructField("document_index", T.LongType()),
        T.StructField("left_context", T.StringType()),
        T.StructField("mention", T.StringType()),
        T.StructField("right_context", T.StringType()),
        T.StructField("entity_id", T.StringType()),
        T.StructField("type", T.ArrayType(T.StringType())),
        T.StructField("category", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("split", T.StringType()),
    ]
)

# Cluster-assignment pair (nn_thresh.py:192-194) keyed by stream
# position instead of implicit line order.
CLUSTER_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("mention_index", T.LongType()),
        T.StructField("true_id", T.LongType()),
        T.StructField("pred_id", T.LongType()),
    ]
)

# Dendrogram edge list (grinch_alg.py:597-610; tests/fixtures/tree.tsv).
DENDROGRAM_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("parent_uid", T.StringType()),
        T.StructField("label", T.StringType()),
    ]
)

# PubTator document (medmentions.py:9-23).
PUBTATOR_MENTION_TYPE = T.StructType(
    [
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("semantic_types", T.ArrayType(T.StringType())),
        T.StructField("entity_id", T.StringType()),
    ]
)

PUBTATOR_DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("abstract", T.StringType()),
        T.StructField("mentions", T.ArrayType(PUBTATOR_MENTION_TYPE)),
    ]
)

# Entity vocabulary (utils.py:53-75): index 0 is reserved for [PAD].
ENTITY_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("index", T.IntegerType()),
        T.StructField("entity_id", T.StringType()),
        T.StructField("count", T.LongType()),
    ]
)
