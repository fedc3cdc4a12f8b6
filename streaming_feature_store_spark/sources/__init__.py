from streaming_feature_store_spark.sources.file import TABLES, load_table, load_tables, register_views  # noqa: F401
