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
    """Flagship: the wide per-event feature frame — multi-horizon counts,
    lag, rolling mean, z-score and scalar flags in one windowed pass (the
    Spark restatement of the reference's per-event feature computation)."""
    qs, _ = _catalog()
    return qs["q46_wide_feature_frame"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _catalog()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    _, oracles = _catalog()
    return dict(oracles)
