"""Batch file sources (parquet), the engine's offline store.

Reference parity: the reference's offline store is a parquet directory read
through Feast (`feast/feature_views.py:22-27`); here parquet/Delta-style
directories are first-class Spark scans with predicate pushdown + column
pruning (verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).

At 100 TB the event/feature tables would be written partitioned by date (and
optionally bucketed by entity id); ``load_table`` is layout-agnostic — Spark's
parquet source discovers partitions and prunes on filter automatically.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The corpus stores timestamps as parquet TIMESTAMP(NANOS); with
# ``spark.sql.legacy.parquet.nanosAsLong`` they surface as LongType nanos and
# we normalize to TimestampType (microsecond, matching DuckDB's read of the
# same files) right at the source. Integer DIV keeps the conversion exact.
_NANO_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


# (applicationId, sf_dir, name) → DataFrame. A DataFrame is an immutable
# logical plan, so reusing one across queries is safe and skips the
# ~0.4 s file-listing + schema-read + py4j round-trip that a fresh
# spark.read.parquet pays per call (measured: >half the catalog-bench
# wall time was repeated table loading).
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def ensure_session_configs(spark: SparkSession) -> None:
    """Settings every query in this engine assumes, enforced defensively for
    externally-created sessions (the driver passes its own SparkSession):

    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark
      otherwise refuses to read;
    - UTC session timezone: window bucketing / hour extraction must be
      engine- and host-independent (the DuckDB oracle is tz-naive).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # already-set/static confs: keep whatever the session has


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` so Catalyst keeps full
    pushdown/pruning freedom; callers filter/select on the returned frame."""
    ensure_session_configs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for c in _NANO_TS_COLUMNS.get(name, ()):
        if c in dtypes and dtypes[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    # Micros-precision columns arrive as TIMESTAMP_NTZ; with the session fixed
    # to UTC an NTZ→LTZ cast preserves the wall clock exactly, and downstream
    # operators can use unix_micros/window uniformly.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    _PLAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so `spark.sql` queries can name the tables."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
