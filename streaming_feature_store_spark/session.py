"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads); the same
configs are what we would ship to a 1000-executor cluster, where only
``spark.sql.shuffle.partitions`` (≈ 2-3× total cores) and memory sizing change.

Key choices (and why they survive a 100 TB scale-up):

- **AQE on** — runtime partition coalescing, skew-join splitting and
  broadcast-join demotion/promotion based on observed sizes. At 100 TB the
  planner's static stats are wrong often enough that AQE is non-negotiable.
- **UTC session timezone** — event-time windows must be deterministic and
  engine-independent (the DuckDB oracle operates on naive timestamps).
- **Arrow enabled** — the few pandas-UDF paths (drift KS, multimodal decode)
  move columnar batches, never rows.
- **Explicit broadcast hints** for genuinely-small dimensions only; we do NOT
  crank ``autoBroadcastJoinThreshold`` because at 100 TB a "small" side
  estimated from stale stats can OOM an executor — AQE's runtime sizes are
  the safer signal.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "streaming-feature-store-spark"


def default_cpus() -> int:
    """Parallelism used for local runs; the driver exports SPARK_GRAFT_CPUS."""
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the local cpu count; on a real cluster
    pass ≈ 2-3× total executor cores (or leave AQE to coalesce down from a
    higher number — coalescing is cheap, splitting is not).
    """
    cpus = default_cpus()
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", str(cpus))
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The test corpus is written with nanosecond parquet timestamps
        # (TIMESTAMP(NANOS)), which vanilla Spark refuses; read them as long
        # nanos and convert in the source layer (sources/file.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MB input splits: at 100 TB that is ~800k tasks — fine for a big
        # cluster; AQE coalesces the small tail.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        # local mode runs driver+executor in ONE JVM with 32 task threads;
        # 8g left ~250 MB/task and GC-thrashed long catalog runs, while an
        # unpinned 32g heap produced rare tens-of-seconds full-GC pauses
        # mid-query (measured: same query 2s or 23s run-to-run). 16g PINNED
        # (-Xms=-Xmx, no resize) with G1 region sizing is the stable point.
        # On a real cluster this is per-executor sizing.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                "-Xms16g -XX:+UseG1GC -XX:G1HeapRegionSize=16m",
            ),
        )
    )
    # Opt-in connector packages (e.g. spark-avro, delta-spark jars):
    #   SPARK_GRAFT_EXTRA_PACKAGES="org.apache.spark:spark-avro_2.13:4.1.2"
    # Resolved from Maven at session start where the environment has network
    # access; this rig is offline, so the Avro/Delta paths stay import-gated
    # and their tests skip (see tests/test_avro.py, test_sinks_metrics.py).
    extra_pkgs = os.environ.get("SPARK_GRAFT_EXTRA_PACKAGES", "")
    if extra_pkgs:
        builder = builder.config("spark.jars.packages", extra_pkgs)
    # Opt-in AQE headroom for data-heavy deployments: start every AQE
    # shuffle at FACTOR x the static partition count and let runtime
    # coalescing shrink it (splitting an oversized partition after the
    # fact is impossible; merging small ones costs nothing — AQE
    # coalesces from map-output stats before reducers launch).
    # Measured both ways at the r6 scaling checkpoint, hence opt-in
    # rather than default: at sf1.0 (10x bench data on the same 32
    # partitions) factor 4 cuts the spill-bound tail (q102 22.0->13.8s,
    # q60 19.4->16.1s, q67 22.7->18.4s); at sf0.1 it costs ~30% on the
    # multi-action persisted-intermediate queries (q101 1.9->5.3s, q119
    # 3.8->7.9s — a cached frame materializes at the PRE-coalesce count,
    # so every extra consumer pays factor x as many tiny-task rounds).
    # Set SPARK_GRAFT_AQE_INITIAL_FACTOR >= 4 on a cluster whose
    # per-partition data volume outgrows the static setting.
    try:
        aqe_factor = int(os.environ.get("SPARK_GRAFT_AQE_INITIAL_FACTOR", "1"))
    except ValueError:
        aqe_factor = 1
    if aqe_factor > 1:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(shuffle * aqe_factor),
        )
    for k, v in (configs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
