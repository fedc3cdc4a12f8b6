"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (multi-horizon per-entity feature frame)
on sf0.001. ``queries()`` — the full catalog from
streaming_feature_store_spark.plans.queries (one entry per SURVEY.md §2
operator family). ``oracle_sql()`` — DuckDB twins for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _catalog():
    from streaming_feature_store_spark.plans.queries import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-event multi-horizon (5m/30m/24h) feature frame — the
    heart of the feature-store engine (SURVEY.md §2.3 A10, fixed)."""
    qs, _ = _catalog()
    return qs["q05_multi_horizon"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _catalog()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    _, oracles = _catalog()
    return dict(oracles)
