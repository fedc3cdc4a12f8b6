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


def read_files(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-matrix batch read: parquet / orc / csv / json (and any other
    registered DataSource V2 format) behind one call.

    Schema discipline for text formats: csv/json REQUIRE an explicit schema
    (DDL string or StructType). Inference is a full extra pass over the
    data — at 100 TB that doubles the scan — and silently drifts types
    between runs; a declared schema also lets the json/csv readers prune
    columns at parse time (Spark only materializes requested fields).
    Columnar formats (parquet/orc) carry their own schema and keep
    predicate pushdown + column pruning.
    """
    fmt = format.lower()
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema: inference costs a "
            "second full scan and is not type-stable across runs"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load(path)


def write_files(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    sort_by: tuple[str, ...] = (),
    **options,
) -> None:
    """Format-matrix batch write. ``partition_by`` produces the
    hive-layout directory partitioning that makes downstream partition
    pruning work (the 100 TB default is partition-by-date); csv gets a
    header so files round-trip through ``read_files`` with a DDL schema.

    ``sort_by`` clusters rows WITHIN each output file
    (``sortWithinPartitions`` — no extra shuffle) so parquet row-group
    min/max statistics become selective: a point/range filter on the sort
    key then skips row groups at scan time, the second data-skipping
    lever next to directory partitioning.  Sort by the columns your
    selective predicates actually use (entity id, event time)."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.format(format.lower()).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if format.lower() == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.save(path)
