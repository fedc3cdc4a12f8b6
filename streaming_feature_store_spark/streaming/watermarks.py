"""Watermark policy + streaming metrics.

Reference parity (SURVEY.md §2.6):
- T1 bounded out-of-orderness: wm = max_seen − bound
  (streaming/core/utils/watermarks.py:67-105; 5 s default, config.py:29).
- T2 allowed lateness: the reference buffers events that are late-but-within
  60 s and drops beyond (watermarks.py:151-208). Spark's watermark is a
  single drop threshold, so the combined policy is watermark = out-of-order
  bound + allowed lateness (5 s + 60 s → 65 s): everything the reference
  would buffer-then-apply is simply still-on-time for Spark; everything the
  reference drops, Spark drops. Same acceptance set, one mechanism.
- T3/T9 metrics: out-of-order rates via lag comparison in batch; in
  streaming, rows dropped by watermark + per-trigger throughput come from
  StreamingQueryProgress (see MetricsListener).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class WatermarkPolicy:
    """max_out_of_orderness + allowed_lateness → single Spark watermark."""

    max_out_of_orderness_s: int = 5
    allowed_lateness_s: int = 60

    @property
    def delay(self) -> str:
        return f"{self.max_out_of_orderness_s + self.allowed_lateness_s} seconds"

    def apply(self, df: DataFrame, ts_col: str = "ts") -> DataFrame:
        return df.withWatermark(ts_col, self.delay)


class MetricsListener:
    """StreamingQueryListener surfacing the reference's metrics set
    (throughput, watermark, late-drop counts — stream_processor.py:105-150,
    feature_job.py:335-403) from Spark's progress events.

    Import-guarded so batch-only deployments never touch streaming internals.
    """

    def __new__(cls):
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self):
                self.progress = []

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                dropped = 0
                for op in p.stateOperators or []:
                    try:
                        dropped += op.numRowsDroppedByWatermark
                    except AttributeError:
                        pass
                wm = (p.eventTime or {}).get("watermark")
                # In-plan observed metrics (quality_monitor /
                # df.observe): one Row per observation name per batch.
                observed = {}
                try:
                    for k, row in (p.observedMetrics or {}).items():
                        observed[k] = row.asDict()
                except Exception:
                    pass
                # T10 tail: serving-freshness gauge — how far the emitted
                # feature state trails wall clock (FEATURE_FRESHNESS in
                # inference/features.py:221). None until the first
                # watermark advances past the epoch placeholder.
                freshness_s = None
                if wm and not wm.startswith("1970-"):
                    import datetime as _dt

                    wm_ts = _dt.datetime.fromisoformat(
                        wm.replace("Z", "+00:00")
                    )
                    freshness_s = (
                        _dt.datetime.now(_dt.timezone.utc) - wm_ts
                    ).total_seconds()
                self.progress.append(
                    {
                        "batchId": p.batchId,
                        "inputRowsPerSecond": p.inputRowsPerSecond,
                        "processedRowsPerSecond": p.processedRowsPerSecond,
                        "numInputRows": p.numInputRows,
                        "watermark": wm,
                        "freshness_lag_s": freshness_s,
                        "rowsDroppedByWatermark": dropped,
                        "observedMetrics": observed,
                    }
                )

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        return _L()


def with_observation(df, name: str, metrics: dict):
    """Attach zero-cost inline metrics to a batch or streaming DataFrame
    (T9's declarative form): ``df.observe`` evaluates the aggregate
    expressions DURING the job that materializes ``df`` — no second scan,
    no extra action — and surfaces them on an ``Observation`` handle
    (batch) or in each micro-batch's ``QueryProgressEvent.observedMetrics``
    (streaming, picked up by ``MetricsListener``-style listeners).

    ``metrics`` maps output name → aggregate Column (count/sum/min/max
    style). Returns ``(observed_df, observation)``; read
    ``observation.get`` AFTER an action has run.

    This is the engine-native replacement for the reference's side-channel
    Prometheus counters incremented inside operators
    (streaming/core/utils/metrics.py): the metric ride-along is part of
    the plan, so it is exactly as distributed, partitioned and
    fault-tolerant as the query itself.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
    return out, obs


def quality_monitor(df, rules: dict, name: str = "quality"):
    """Streaming twin of ``profile.data_quality_report``: per-micro-batch
    violation counters for named rules, evaluated IN the plan via
    ``observe`` (zero extra scan, exactly as distributed as the query).

    ``rules`` maps rule name → boolean Column that is TRUE for a
    violating row.  Each batch's counters (plus ``n_rows``) surface in
    ``QueryProgressEvent.observedMetrics[name]`` and are captured by
    ``MetricsListener`` under the same key — the engine-native form of
    the reference's validate-on-consume counters
    (streaming/core/models/events.py:12-57 field constraints feeding
    utils/metrics.py Prometheus counters): an alerting layer reads the
    listener, a quarantine layer pairs this with ``sinks.route_dlq``.

    Works on batch frames too (read via ``Observation`` or
    ``QueryExecutionListener``), but the batch report form with one row
    per rule lives in ``profile.data_quality_report``.
    """
    import pyspark.sql.functions as F

    exprs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(nm)
        for nm, cond in rules.items()
    ]
    return df.observe(name, *exprs)
