"""Stream-stream / stream-table enrichment joins (J2/J3).

The reference *declared* a transactions ⟵(device_id)⟶ devices interval join
with state TTL but never implemented it (docs/DesignDoc.md:81; the device
topic + DLQ are configured at config.py:54,59 and never consumed). We
implement it:

- **batch/as-of form**: latest device profile at or before the transaction
  time (the union+last_value PIT pattern — linear, no interval explosion).
- **streaming form**: watermarked stream-stream left interval join — device
  record valid from its timestamp until ``valid_for`` later; Spark clears
  join state by watermark, which is exactly the "state TTL" the design
  called for.
- **point-lookup form** (J3): broadcast the (small) request/key set against
  the latest view — the Redis HGETALL batch analog (inference/features.py:
  129-246) without the string round-trip.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def enrich_with_devices_stream(
    txns: DataFrame,
    devices: DataFrame,
    valid_for: str = "24 hours",
    tx_watermark: str = "65 seconds",
    dev_watermark: str = "65 seconds",
) -> DataFrame:
    """Streaming interval join: each transaction picks up device attributes
    whose record time is within [tx.ts − valid_for, tx.ts]."""
    tx = txns.withWatermark("ts", tx_watermark)
    dev = (
        devices.withWatermark("dev_ts", dev_watermark)
        .select(
            F.col("device_id").alias("d_device_id"),
            "dev_ts",
            "is_proxy",
            "is_tor",
            F.col("risk_score").alias("device_risk_score"),
            F.col("geo_country").alias("device_geo_country"),
        )
    )
    cond = (
        (tx["device_id"] == dev["d_device_id"])
        & (dev["dev_ts"] <= tx["ts"])
        & (dev["dev_ts"] >= tx["ts"] - F.expr(f"INTERVAL {valid_for}"))
    )
    return tx.join(dev, cond, "leftOuter").drop("d_device_id")


def point_lookup(
    latest_view: DataFrame, request_keys: DataFrame, key_col: str
) -> DataFrame:
    """J3: serve features for a batch of entity keys — broadcast hash join of
    the request set against the latest view (keys are the small side)."""
    return latest_view.join(broadcast(request_keys), key_col, "right")


def interval_join(
    events: DataFrame,
    spans: DataFrame,
    event_key: str,
    span_key: str,
    event_us: str = "us",
    span_start_us: str = "start_us",
    span_end_us: str = "end_us",
) -> DataFrame:
    """Batch interval join (the J2 stream-stream interval join's offline
    twin): each event matches every span of the same key whose
    ``[start_us, end_us)`` window contains the event's timestamp.  With an
    equi key present this is ONE hash join carrying the two range
    predicates as residual conditions — no binning needed; the purely
    temporal (keyless) case should bucket the time axis first (the LSH
    banding trick on time) to avoid a broadcast-nested-loop.
    """
    cond = (
        (events[event_key] == spans[span_key])
        & (events[event_us] >= spans[span_start_us])
        & (events[event_us] < spans[span_end_us])
    )
    return events.join(spans, cond)


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    num_hashes: int = 5,
    prefix_len: int = 4,
) -> DataFrame:
    """Bloom-filter pre-join reduction: shrink a huge probe side to the
    rows that MIGHT match the build keys before the expensive exact join —
    the runtime-filter pattern Spark's own AQE injects
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), exposed here as
    an explicit operator with a DETERMINISTIC filter so the reduction is
    reproducible cross-engine, false positives included.

    Construction is a partitioned Bloom: per hash seed, the build side
    distinct-projects to md5-prefix buckets (``16^prefix_len`` possible
    values — ≤ 65 536 short strings at the default, trivially broadcast),
    and the probe survives only if ALL ``num_hashes`` of its buckets are
    occupied.  Each round is a map-side BROADCAST LEFT SEMI join: the
    probe is never shuffled, never widened — k hash computations and k
    hash-map lookups per row, exactly a Bloom membership test.  No false
    negatives by construction; the false-positive rate falls as
    ``(fill_ratio)^num_hashes``.
    """

    def bucket(col, seed: int):
        return F.substring(
            F.md5(
                F.concat_ws(":", col.cast("string"), F.lit(str(seed)))
            ),
            1,
            prefix_len,
        )

    out = probe
    for s in range(1, num_hashes + 1):
        occupied = build.select(
            bucket(F.col(build_key), s).alias("_bb")
        ).distinct()
        out = out.join(
            broadcast(occupied),
            bucket(F.col(probe_key), s) == F.col("_bb"),
            "left_semi",
        )
    return out


def band_join(
    fact: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Band (range-bucket) join: attach to each fact row the dimension row
    whose half-open interval [lo, hi) contains its ``value_col`` — the
    price-tier / risk-band / SLA-bucket lookup every feature pipeline
    carries (the reference hard-codes its amount bands in the risk
    interpretation ladder; this is the data-driven generalization).

    The band table is a configuration dimension — tens-to-thousands of
    rows, CONSTANT in data scale — so the right physical plan at any fact
    size is an explicit ``broadcast``: Spark executes the non-equi
    predicate as a BroadcastNestedLoopJoin, each task scanning the
    in-memory band list per row (O(|bands|) comparisons, no shuffle of
    the fact side, no Exchange at all).  AQE cannot promote a nested-loop
    join on its own, hence the one place a forced hint is policy-correct
    (session.py:16 — genuinely-small dimension).  For a REGULAR grid,
    derive an equi key with ``floor(value/step)`` instead and skip the
    range predicate entirely; for band tables too large to broadcast,
    bucket both sides on a coarse quantization of value and range-join
    within buckets.

    NULL values (and values outside every band) follow ``how``: dropped
    under inner, kept with NULL band attributes under left.
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (
        F.col(value_col) < bands[hi_col]
    )
    return fact.join(broadcast(bands), cond, how)


def blocked_link(
    probe: DataFrame,
    master: DataFrame,
    on: list[str],
    probe_id: str,
    master_id: str,
    score: Column,
    min_score: float,
    band_col: str | None = None,
    band: int = 1,
    master_prefix: str = "m_",
    prefilter: Column | None = None,
) -> DataFrame:
    """Blocked fuzzy record linkage — entity resolution of a dirty feed
    against a master table: candidate pairs form ONLY inside blocks
    (equality on ``on``, plus an optional +/-``band`` numeric band on
    ``band_col``), each pair is scored by the caller's ``score``
    expression over the joined frame (master columns arrive prefixed
    ``m_``), and each probe row keeps its best match — argmax by the
    ROUNDED score with the master id as tiebreak (q25 determinism
    discipline).  Probe rows with no candidate at/above ``min_score``
    are emitted with a NULL match (the production readout needs the
    unmatched set, not just the hits).

    The numeric band uses the lossless replication trick from the
    edit-distance blocker (dedup.edit_distance_near_dups): each master
    row is exploded into 2·band+1 (block, band value) keys so the band
    predicate becomes an EQUI-join — no non-equi join, no cross product;
    shuffle is |probe| + (2·band+1)·|master| rows hashed by block key.
    At 100 TB the block key choice bounds the quadratic term: pairs per
    block are |probe_block| x |master_block|, so blocks must come from
    real selectivity (brand x banded size here, not brand alone); the
    optional ``prefilter`` runs a cheap survivor test (length bands,
    shared-token counts) before the expensive score expression.
    """
    keep = set(on) | {band_col} if band_col else set(on)
    # Guard the renaming scheme: a probe column named like a prefixed
    # master column would make the joined frame ambiguous, and probe
    # columns named _score/_rk would be silently overwritten before the
    # argmax — both corrupt the match with no error from Spark itself.
    probe_cols = set(probe.columns)
    reserved = {"_score", "_rk"} & probe_cols
    if reserved:
        raise ValueError(
            f"blocked_link: probe columns {sorted(reserved)} collide with "
            "internal working columns — rename them before linking"
        )
    prefixed = {
        f"{master_prefix}{c}" for c in master.columns if c not in keep
    }
    if band_col is not None:
        prefixed.add(f"{master_prefix}{band_col}")
    clash = prefixed & probe_cols
    if clash:
        raise ValueError(
            f"blocked_link: prefixed master columns {sorted(clash)} collide "
            f"with probe columns — pass a different master_prefix"
        )
    m = master
    for c in master.columns:
        if c not in keep:
            m = m.withColumnRenamed(c, f"{master_prefix}{c}")
    join_keys = list(on)
    if band_col is not None:
        # keep the master's ORIGINAL band value (prefixed) for scoring —
        # the explode overwrites the join column with the probe-side
        # values it must equal
        m = m.withColumn(f"{master_prefix}{band_col}", F.col(band_col))
        m = m.withColumn(
            band_col,
            F.explode(
                F.sequence(
                    F.col(band_col) - band, F.col(band_col) + band
                )
            ),
        )
        join_keys = [*on, band_col]
    mid = f"{master_prefix}{master_id}"
    joined = probe.join(m, join_keys)
    if prefilter is not None:
        # cheap survivor test evaluated BEFORE the (possibly expensive)
        # score expression — e.g. a length band in front of levenshtein;
        # a conjunct inside the score filter would not guarantee order
        joined = joined.filter(prefilter)
    cands = (
        joined
        .withColumn("_score", F.round(score, 6))
        .filter(F.col("_score") >= min_score)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(probe_id).orderBy(
        F.desc("_score"), F.asc(mid)
    )
    best = (
        cands.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            probe_id,
            F.col(mid).alias("matched_id"),
            F.col("_score").alias("match_score"),
        )
    )
    return probe.select(probe_id).distinct().join(
        best, probe_id, "left"
    )
