"""streaming_cdc_spark — a PySpark-native analytics engine with the
capability surface of rloganiv/streaming-cdc (streaming cross-document
entity coreference), re-expressed as idiomatic DataFrame / SQL /
Structured Streaming operators, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns) that a 100 TB corpus pipeline needs.

Design stance (SURVEY.md §7): capability port, not a code port.
Everything is declared via the DataFrame API so Catalyst can push
filters/prune columns/choose join strategies; Python only runs inside
Arrow-batched pandas UDFs on genuinely non-relational paths.
"""

__version__ = "0.1.0"

from streaming_cdc_spark.session import get_spark  # noqa: F401
