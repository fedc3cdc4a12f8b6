from streaming_feature_store_spark.functions.exprs import (  # noqa: F401
    dsum,
    davg,
    r4,
    r6,
    ratio,
    clamp01,
)
