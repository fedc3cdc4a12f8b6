"""Feature-store sinks: latest view (upsert), append-only feature log, DLQ.

Reference parity: the Redis sink writes three structures per feature record —
hash (current features), latest-JSON, and a time-series zset, all with 24 h
TTL (streaming/core/sinks/redis_sink.py:96-168). Here:

- **latest view** = one row per entity key, newest event-time wins. Written
  idempotently per micro-batch from ``foreachBatch`` — re-processing a batch
  after restart converges to the same table (effectively-once on top of
  Spark's checkpointing, SURVEY §2.6 T5). On parquet we rewrite the (small,
  one-row-per-entity) table; on Delta/Iceberg this same function becomes a
  keyed MERGE — the call-site contract is identical.
- **feature log** = append-only, date-partitioned; this is the replay/
  backfill source (DesignDoc.md:129-131) and the offline training store.
- **TTL** = retention delete: drop log partitions / latest rows older than
  the retention horizon (redis TTL 24 h → `retention_delete`).
- **DLQ** = malformed records appended to a quarantine table
  (config.py:56-59 declares per-topic DLQs; the reference never wired them —
  feature_job.py:96-105 counts and TODOs).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def delta_available(spark: SparkSession) -> bool:
    """True iff the delta-spark python package AND the Delta jars are both
    loadable in this session — the gate for the ``backend="delta"`` sink
    path (same import-gate pattern as the Avro codec: public Apache-licensed
    tooling that this rig does not ship)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401

        getattr(spark._jvm.io.delta.tables, "DeltaTable")
        return True
    except Exception:
        return False


def _upsert_latest_delta(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    key_cols: list[str],
    ts_col: str,
) -> None:
    """The Delta realization of ``upsert_latest``: a keyed ``MERGE INTO``
    with newest-``ts_col``-wins update condition. Metadata-transactional,
    concurrent-reader-safe, and at 100 TB strictly better than the parquet
    bucket rewrite (Delta rewrites only files containing matched keys and
    commits atomically). Idempotent for the same reason the parquet path
    is: re-merging an already-applied batch matches every key with an equal
    timestamp and overwrites with identical values."""
    from delta.tables import DeltaTable

    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col))
    latest_batch = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if not DeltaTable.isDeltaTable(spark, path):
        latest_batch.write.format("delta").mode("overwrite").save(path)
        return
    t = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.`{c}` = s.`{c}`" for c in key_cols)
    (
        t.alias("t")
        .merge(latest_batch.alias("s"), cond)
        .whenMatchedUpdateAll(condition=f"s.`{ts_col}` >= t.`{ts_col}`")
        .whenNotMatchedInsertAll()
        .execute()
    )


def upsert_latest(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    key_cols: list[str],
    ts_col: str = "window_start_s",
    n_buckets: int = 64,
    backend: str | None = None,
) -> None:
    """Merge a feature micro-batch into the latest-view table at ``path``.

    Newest ``ts_col`` per key wins; ties broken by preferring the incoming
    row (the reference's Redis HSET overwrite semantics). Idempotent: the
    same batch applied twice yields the same table.

    ``backend`` selects the physical realization behind the SAME call-site
    contract (default from ``$SPARK_GRAFT_SINK_BACKEND``, else parquet):

    - ``parquet``: hash-bucketed by entity key (``_bucket=`` partitions),
      merged with DYNAMIC partition overwrite — a micro-batch touching k
      entities rewrites at most min(k, n_buckets) buckets, never the whole
      table; at 100 TB, size n_buckets so a bucket ≈ one task.
    - ``delta``: a real keyed ``MERGE INTO`` (``_upsert_latest_delta``) —
      transactional and reader-safe; requires delta-spark + jars
      (``delta_available``), which this rig lacks, so the path is
      import-gated exactly like the Avro codec.
    """
    backend = backend or os.environ.get("SPARK_GRAFT_SINK_BACKEND", "parquet")
    if backend == "delta":
        _upsert_latest_delta(spark, batch_df, path, key_cols, ts_col)
        return
    bucket = F.pmod(
        F.xxhash64(*[F.col(c).cast("string") for c in key_cols]), F.lit(n_buckets)
    )
    incoming = batch_df.withColumn("_bucket", bucket).withColumn("_src", F.lit(1))
    if os.path.exists(path):
        touched = [r["_bucket"] for r in incoming.select("_bucket").distinct().collect()]
        current = (
            spark.read.parquet(path)
            .filter(F.col("_bucket").isin(touched))  # partition-pruned read
            .withColumn("_src", F.lit(0))
        )
        merged = current.unionByName(incoming, allowMissingColumns=True)
    else:
        merged = incoming
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.desc("_src"))
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    with _dynamic_overwrite(spark):
        latest.write.mode("overwrite").partitionBy("_bucket").parquet(path)


class _dynamic_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic: overwrite
    replaces only the partitions present in the written frame."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)


def append_log(
    batch_df: DataFrame,
    path: str,
    ts_col: str = "window_start_s",
    batch_id: int | None = None,
) -> None:
    """Append the batch to the date-partitioned feature log (offline store).
    Partitioning by date keeps retention deletes and time-range training
    reads to partition-pruned scans at 100 TB.

    When ``batch_id`` is provided (the foreachBatch path), the write targets
    a ``_batch=`` partition with dynamic overwrite — re-running a failed
    micro-batch REPLACES its partition instead of double-appending, which is
    what makes checkpoint + this sink effectively-once (T5). Plain appends
    (batch materialization) skip the batch column."""
    d = batch_df.withColumn(
        "_date", F.to_date(F.timestamp_seconds(F.col(ts_col)))
    )
    if batch_id is None:
        d.write.mode("append").partitionBy("_date").parquet(path)
        return
    d = d.withColumn("_batch", F.lit(batch_id))
    spark = batch_df.sparkSession
    with _dynamic_overwrite(spark):
        d.write.mode("overwrite").partitionBy("_batch", "_date").parquet(path)


def _partition_cols(path: str) -> list[str]:
    """Infer hive-style partition columns from directory names, walking
    nested levels (``_batch=…/_date=…`` → ['_batch', '_date'])."""
    cols: list[str] = []
    cur = path
    while True:
        try:
            entries = [
                e for e in os.listdir(cur)
                if "=" in e and os.path.isdir(os.path.join(cur, e))
            ]
        except FileNotFoundError:
            break
        if not entries:
            break
        cols.append(entries[0].split("=", 1)[0])
        cur = os.path.join(cur, entries[0])
    return cols


def retention_delete(
    spark: SparkSession, path: str, ts_col: str, horizon_s: int, now_s: int
) -> None:
    """TTL semantics (Redis 24 h TTL → retention job): rewrite the table
    without rows older than the horizon, PRESERVING the table's partition
    layout (inferred from the directory names) so later upsert_latest /
    append_log merges keep their replace-only-touched-partitions
    invariants. The rmtree+rename swap is driver-local-filesystem only and
    not atomic for concurrent readers — on object storage use Delta/
    Iceberg, where this is a metadata-only operation; for date-partitioned
    logs prefer ``retention_drop_partitions`` (no rewrite at all)."""
    parts = _partition_cols(path)
    df = spark.read.parquet(path)
    kept = df.filter(F.col(ts_col) >= F.lit(now_s - horizon_s))
    tmp = path + ".tmp"
    w = kept.write.mode("overwrite")
    if parts:
        w = w.partitionBy(*parts)
    w.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)


def retention_drop_partitions(
    path: str, horizon_s: int, now_s: int, date_col: str = "_date"
) -> list[str]:
    """Log-path TTL without any rewrite: delete whole ``_date=`` partition
    directories strictly older than the horizon — the parquet analog of a
    Delta ``DELETE WHERE _date < …`` partition drop. Rows inside the cutoff
    day are kept (conservative: a partition is only dropped when its entire
    day is expired). Returns the dropped partition names."""
    import datetime

    cutoff = datetime.date.fromtimestamp(now_s - horizon_s)
    dropped = []
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            if d.startswith(f"{date_col}="):
                try:
                    day = datetime.date.fromisoformat(d.split("=", 1)[1])
                except ValueError:
                    continue
                if day < cutoff:
                    shutil.rmtree(os.path.join(root, d))
                    dropped.append(d)
                    dirs.remove(d)
    return dropped


def route_dlq(
    parsed: DataFrame, dlq_path: str | None, corrupt_col: str = "_corrupt"
) -> DataFrame:
    """Split malformed rows to the DLQ (T8); returns the clean rows.

    BATCH frames only: the eager DLQ write is illegal on a streaming frame —
    call this inside ``foreachBatch`` on the micro-batch (the S5 Kafka
    decode path does exactly that). The input is cached for the duration of
    the split so the corrupt-row write and the clean-row return don't each
    re-scan/re-parse the source; the cache is dropped once the clean side
    is materialized by the caller's sink write (unpersist is safe — it only
    marks the plan re-computable)."""
    if parsed.isStreaming:
        raise ValueError(
            "route_dlq needs a batch DataFrame; call it inside foreachBatch"
        )
    if corrupt_col not in parsed.columns:
        return parsed
    if dlq_path is not None:
        parsed.persist()
        parsed.filter(F.col(corrupt_col).isNotNull()).write.mode("append").parquet(
            dlq_path
        )
    return parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
