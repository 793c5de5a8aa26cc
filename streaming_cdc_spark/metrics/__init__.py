from streaming_cdc_spark.metrics.coref import (  # noqa: F401
    b3_df,
    ceaf_e_df,
    conflation_df,
    contingency,
    muc_df,
)
