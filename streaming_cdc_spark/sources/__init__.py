from streaming_cdc_spark.sources.schemas import (  # noqa: F401
    CLUSTER_PAIR_SCHEMA,
    DENDROGRAM_SCHEMA,
    MENTION_SCHEMA,
)
