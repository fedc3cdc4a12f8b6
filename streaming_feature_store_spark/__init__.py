"""streaming_feature_store_spark — a PySpark-native streaming feature-store engine.

A from-scratch re-expression of the capabilities of the reference system
(`lich2000117/streaming-feature-store`, a Kafka/Flink/Redis real-time feature
store — see SURVEY.md) as an idiomatic Apache Spark engine:

- batch + streaming feature computation share ONE set of DataFrame column
  expressions (the core Spark win over the reference's dual engines,
  reference: streaming/simple/stream_processor.py vs streaming/flink/feature_job.py);
- windowed per-entity aggregations via `F.window` / range frames
  (reference: streaming/core/utils/windowing.py:11-54);
- point-in-time (as-of) joins for training-set assembly
  (reference: feast/feature_utils.py:151-232);
- sessionization via `F.session_window` (reference: streaming/core/processors/clickstream.py:31-65);
- an upsert-able "latest" feature view + append-only feature log
  (reference: streaming/core/sinks/redis_sink.py:96-168);
- large-scale training-data operators beyond the reference surface:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), ANN similarity
  search, text analysis, multimodal column plumbing, drift detection.

Everything is declarative DataFrame/SQL so Catalyst + AQE choose physical
plans; Python UDFs appear only where semantics genuinely require them.
"""

__version__ = "0.1.0"

from streaming_feature_store_spark.session import get_spark  # noqa: F401
