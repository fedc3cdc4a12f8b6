from streaming_feature_store_spark.plans.queries import QUERIES, ORACLES  # noqa: F401
