from streaming_cdc_spark.functions.vectors import (  # noqa: F401
    as_double,
    cosine,
    dot,
    l2_norm,
    l2_normalize,
)
