"""Per-entity windowed feature aggregation — the heart of the engine.

Reference parity: the reference buffers events per key in a deque and
recomputes ~35 features over the buffer on every event
(streaming/core/utils/windowing.py:11-54, streaming/core/processors/
transaction.py:33-207). Here the same feature families are declarative
aggregations, so Spark gives partial (map-side) aggregation, whole-stage
codegen and — in streaming mode — incremental state maintenance for free
(SURVEY.md §4).

Scale notes:
- ``tumbling/sliding`` use ``groupBy(entity, F.window(...))`` → ONE shuffle
  hash-partitioned by (entity, window); partial aggs run map-side so the
  shuffle carries pre-aggregated rows, not events.
- ``multi_horizon`` uses three range frames over a SINGLE window spec family
  (same partitioning + ordering), so Catalyst plans one sort + one shuffle
  for all horizons — this fixes the reference's 30 m/24 h-capped-at-5 m bug
  (transaction.py:105-109, SURVEY.md §2.3 A10) without tripling the cost.
- All aggregates are built-in JVM expressions; no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from streaming_feature_store_spark.functions.exprs import dsum

MICROS = {"5m": 300_000_000, "30m": 1_800_000_000, "24h": 86_400_000_000}


def with_event_micros(df: DataFrame, ts_col: str = "ts", out: str = "us") -> DataFrame:
    """Attach exact integer event-time micros — the ordering/range key used by
    every frame-based operator (exact integer arithmetic, no FP drift)."""
    return df.withColumn(out, F.unix_micros(F.col(ts_col)))


def tumbling_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "5 minutes",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """COUNT/SUM/AVG/MIN/MAX + distinct over fixed (epoch-aligned) windows.

    Mirrors A1-A5 of SURVEY.md §2.3 (transaction.py:51-62). Window start is
    emitted as epoch seconds (windows are minute-aligned) for stable,
    engine-independent comparison.
    """
    aggs = [
        F.count("*").alias("event_count"),
        dsum(value_col).alias("value_sum"),
        (dsum(value_col) / F.count(value_col)).alias("value_avg"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
    ] + (extra_aggs or [])
    return (
        df.groupBy(F.col(entity_col), F.window(ts_col, window).alias("w"))
        .agg(*aggs)
        .withColumn("window_start_s", F.col("w.start").cast("long"))
        .drop("w")
    )


_INTERVAL_S = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
               "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}


def _interval_seconds(spec: str) -> int | None:
    """Whole seconds of a simple ``"<n> <unit>"`` interval string, else
    None (composite/sub-second specs fall back to the generator form)."""
    parts = spec.strip().lower().split()
    # isascii() guard (ADVICE r12): str.isdigit() accepts non-ASCII digit
    # chars (superscripts) that int() rejects; such specs must fall back
    # to the generator form, not raise
    if (
        len(parts) == 2
        and parts[0].isascii()
        and parts[0].isdigit()
        and parts[1] in _INTERVAL_S
    ):
        return int(parts[0]) * _INTERVAL_S[parts[1]]
    return None


def sliding_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "5 minutes",
    slide: str = "1 minute",
) -> DataFrame:
    """Sliding-window stats (reference default: 5 m window / 1 m slide —
    streaming/core/models/config.py:27-28; Flink SlidingEventTimeWindows at
    feature_job.py:477).

    r12 opt (guide §2.3 — aggregate before you shuffle): computed as TWO-
    LEVEL slide panes instead of Spark's window generator.  The generator
    form materializes window/slide copies of EVERY EVENT ROW before the
    partial agg, so the shuffle carries up to 5× pre-agg cells keyed by
    (entity, window-struct); here events pre-aggregate per slide-aligned
    bin first (one narrow shuffle of (entity, bin) cells), each BIN CELL
    fans out to the window/slide windows containing it, and the decomposed
    aggregates combine (sum of counts, exact decimal sum of sums, max of
    maxes) — the fanout moves pre-aggregated panes, never events.  Row-
    and type-identical to the generator form (probe-verified at sf0.01 +
    sf0.1: 498k rows equal; isolated min 1.15 s → 0.85 s at sf0.1, and
    the pane form's advantage grows with events-per-bin density at scale).
    Non-divisible or composite window/slide specs fall back to the
    generator form."""
    win_s, slide_s = _interval_seconds(window), _interval_seconds(slide)
    if not (win_s and slide_s and win_s % slide_s == 0 and win_s > slide_s):
        return (
            df.groupBy(
                F.col(entity_col), F.window(ts_col, window, slide).alias("w")
            )
            .agg(
                F.count("*").alias("event_count"),
                dsum(value_col).alias("value_sum"),
                F.max(value_col).alias("value_max"),
            )
            .withColumn("window_start_s", F.col("w.start").cast("long"))
            .drop("w")
        )
    npanes = win_s // slide_s
    binned = (
        df.groupBy(F.col(entity_col), F.window(ts_col, slide).alias("b"))
        .agg(
            F.count("*").alias("_c"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_s"),
            F.max(value_col).alias("_m"),
        )
        .select(
            entity_col,
            F.col("b.start").cast("long").alias("_bin_s"),
            "_c",
            "_s",
            "_m",
        )
    )
    exploded = binned.select(
        entity_col,
        "_c",
        "_s",
        "_m",
        "_bin_s",
        F.explode(F.sequence(F.lit(0), F.lit(npanes - 1))).alias("_k"),
    ).select(
        entity_col,
        "_c",
        "_s",
        "_m",
        (F.col("_bin_s") - slide_s * F.col("_k")).alias("window_start_s"),
    )
    return (
        exploded.groupBy(entity_col, "window_start_s")
        .agg(
            F.sum("_c").alias("event_count"),
            F.sum("_s").cast("double").alias("value_sum"),
            F.max("_m").alias("value_max"),
        )
        .select(
            entity_col,
            "event_count",
            "value_sum",
            "value_max",
            "window_start_s",
        )
    )


def multi_horizon_counts(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-event trailing 5 m / 30 m / 24 h counts + sums ("window ending at
    this event" semantics — exactly the reference's per-event emission model,
    windowing.py:31-35, with the multi-horizon fix for A10).

    One shuffle (partition by entity), one sort (by event-time micros); the
    three horizons are just different range frames over that sort.
    """
    df = with_event_micros(df, ts_col)
    base = Window.partitionBy(entity_col).orderBy("us")
    out = df
    for tag, micros in MICROS.items():
        w = base.rangeBetween(-micros, 0)
        out = out.withColumn(f"cnt_{tag}", F.count("*").over(w)).withColumn(
            f"sum_{tag}",
            F.sum(F.col(value_col).cast("decimal(18,4)")).over(w).cast("double"),
        )
    return out


def time_since_last(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """LAG-based inter-event gap in micros (A7 — transaction.py:65-69 computes
    time_since_last_txn_min from sorted buffer timestamps). Null for the
    entity's first event, as in the reference."""
    df = with_event_micros(df, ts_col)
    w = Window.partitionBy(entity_col).orderBy("us", order_tiebreak)
    return df.withColumn("delta_us", F.col("us") - F.lag("us").over(w))


def rolling_last_n(
    df: DataFrame,
    entity_col: str,
    n: int = 100,
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Rolling mean over the last N rows per entity (A17 — the reference's
    bounded-list fraud-rate tracker, streaming/core/fraud_detector.py:241-265).
    rowsBetween(-(n-1), 0) over one sort; deterministic via decimal sum."""
    df = with_event_micros(df, ts_col)
    w = (
        Window.partitionBy(entity_col)
        .orderBy("us", order_tiebreak)
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn(
        "rolling_avg",
        (
            F.sum(F.col(value_col).cast("decimal(18,4)")).over(w).cast("double")
            / F.count("*").over(w)
        ),
    ).withColumn("rolling_n", F.count("*").over(w))


def zscore_vs_entity(
    df: DataFrame,
    entity_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-event z-score against the entity's distribution (A11 —
    transaction.py:123-125 computes |amount−μ|/σ against the window buffer).
    Sample stddev per SURVEY.md §4 delta 3 (the documented semantics)."""
    w = Window.partitionBy(entity_col)
    mu = (
        F.sum(F.col(value_col).cast("decimal(18,4)")).over(w).cast("double")
        / F.count(value_col).over(w)
    )
    sd = F.stddev_samp(value_col).over(w)
    return df.withColumn("zscore", (F.col(value_col) - mu) / sd)


def interpolate_linear(
    df: DataFrame,
    entity_col: str,
    value_col: str = "reading",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Linear interpolation of a sparse reading column per entity — the
    telemetry resampling step one rung above LOCF: a null reading becomes
    the time-weighted blend of its nearest non-null neighbours
    (``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``); before
    the first / after the last observation it falls back to
    nearest-observation fill.  Everything is two frames over ONE
    entity-partitioned sort (last-ignorenulls backward, first-ignorenulls
    forward) — no self-join, no per-entity collect; arithmetic stays in
    codegen and uses only IEEE-exact ops so results are engine-portable.
    """
    if "us" not in df.columns:
        df = with_event_micros(df, ts_col)
    base = Window.partitionBy(entity_col).orderBy("us", order_tiebreak)
    back = base.rowsBetween(Window.unboundedPreceding, 0)
    fwd = base.rowsBetween(0, Window.unboundedFollowing)
    v = F.col(value_col)
    obs_us = F.when(v.isNotNull(), F.col("us"))
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_us = F.last(obs_us, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_us = F.first(obs_us, ignorenulls=True).over(fwd)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_us == prev_us, prev_v)
        .otherwise(
            prev_v
            + (next_v - prev_v)
            * (F.col("us") - prev_us)
            / (next_us - prev_us)
        )
    )
    return df.withColumn(value_col + "_interp", interp)


def ewma_latest(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    tiebreak_col: str | None = None,
    last_n: int | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of the time-ordered
    value series — the smoothed-rate feature the reference approximates
    with its velocity clamp (transaction.py:91), here as the exact
    recurrence s₁ = x₁; sᵢ = (1−α)·sᵢ₋₁ + α·xᵢ.

    Determinism across engines: the fold ORDER is pinned (ts, tiebreak),
    and the recurrence is evaluated as an explicit LEFT FOLD over the
    sorted per-key array — Spark's ``F.aggregate`` seeded with the first
    element, exactly the convention DuckDB's ``list_reduce`` uses — so
    both engines execute the identical sequence of IEEE ops and produce
    bit-identical doubles (the q164 oracle compares UNROUNDED beyond the
    single presentation-edge round).

    Scale shape: one groupBy shuffle; each key's state is its value array.
    An EWMA's weight on the i-th-oldest point decays as (1−α)^i, so for
    any α ≥ 0.05 the contribution beyond ~300 points is below double ulp —
    ``last_n`` (default 512 when None is passed with ``bounded=True``
    semantics in callers) truncates the buffer to the newest N points
    WITHOUT changing the result beyond that ulp floor, keeping per-key
    state O(N) instead of O(history).  Pass ``last_n=None`` to fold the
    full history (exact, for oracle parity on bounded test data).
    """
    tb = tiebreak_col or ts_col
    items = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tb).alias("k"),
                F.col(value_col).cast("double").alias("x"),
            )
        )
    )
    per_key = df.groupBy(F.col(key_col).alias(key_col)).agg(
        items.alias("_items"), F.count(value_col).alias("n_points")
    )
    arr = F.transform(F.col("_items"), lambda s: s["x"])
    if last_n is not None:
        # negative-start slice errors when |start| > size; guard short keys
        arr = F.when(
            F.size(arr) > last_n, F.slice(arr, -last_n, last_n)
        ).otherwise(arr)
    a = F.lit(float(alpha))
    ew = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: (F.lit(1.0) - a) * acc + a * x,
    )
    return per_key.select(
        key_col, "n_points", F.round(ew, 6).alias("ewma")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    end_ts: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each reading holds its value
    until the next reading (LOCF weighting), the last until ``end_ts`` —
    the correct mean for irregularly-sampled series (sensor readings,
    balances, prices), where the arithmetic mean over-weights bursts.

    Determinism: durations are EXACT integer micros from one LEAD over
    the per-key sort; the weighted sum accumulates
    ``decimal(value) × dt`` (exact — no double summation-order
    dependence); one double division at the edge.

    Plan: one hash-partition-by-key window (the same shape as every lag
    feature — partitioned, not global) + one grouped aggregate.
    """
    tb = tiebreak_col or ts_col
    us = F.unix_micros(F.col(ts_col))
    end_us = F.unix_micros(F.lit(end_ts).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us, F.col(tb))
    dt = F.coalesce(F.lead(us).over(w), end_us) - us
    weighted = df.withColumn("_dt", dt)
    return weighted.groupBy(key_col).agg(
        F.count(value_col).alias("n_readings"),
        F.round(
            F.sum(
                F.col(value_col).cast("decimal(18,6)") * F.col("_dt")
            ).cast("double")
            / F.sum("_dt"),
            6,
        ).alias("twap"),
    )


def cumulative_distinct(
    df: DataFrame,
    key_col: str,
    order_col: str,
    distinct_col: str,
    tiebreak_col: str,
    out_col: str = "distinct_so_far",
) -> DataFrame:
    """Expanding COUNT(DISTINCT x) OVER per-entity event time — "how many
    distinct event types / devices / merchants has this entity touched so
    far" — a breadth feature the reference's per-entity state tracks with
    an in-memory set.

    Spark's window aggregates reject DISTINCT, and carrying a set per row
    is O(n·|set|) state; the scalable restatement is exact and set-free:
    flag each row that is the FIRST occurrence of its (key, value) pair
    (row_number over (key, value) ordered by time+tiebreak == 1), then
    running-SUM the flags over the entity timeline.  Two window passes
    over the same key partitioning — Spark reuses one sort for both
    frames when the (key, order) prefix matches; per-row state at 100 TB
    is one integer, never a set.

    Ties: the unique ``tiebreak_col`` makes "first occurrence" and the
    running frame deterministic under duplicate timestamps.

    NULL values are NOT counted as a distinct value — matching SQL's
    ``COUNT(DISTINCT x) OVER`` (which excludes NULLs), not a set that
    admits None.  Without the guard, row_number's partition key would
    treat NULL as its own value and the count would diverge from the SQL
    twin on nullable columns.
    """
    first_w = Window.partitionBy(key_col, distinct_col).orderBy(
        order_col, tiebreak_col
    )
    run_w = (
        Window.partitionBy(key_col)
        .orderBy(order_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "_first",
        F.when(
            F.col(distinct_col).isNotNull()
            & (F.row_number().over(first_w) == 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return flagged.withColumn(out_col, F.sum("_first").over(run_w)).drop(
        "_first"
    )


def lag_autocorr(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    group_col: str,
    tiebreak_col: str,
    lag: int = 1,
) -> DataFrame:
    """Per-group lag-k autocorrelation of consecutive per-entity values —
    the "is this metric sticky or mean-reverting" time-series feature:
    Pearson r between v_t and v_{t-k} over every entity timeline in the
    group, computed from exact decimal moments so the 6-dp answer is
    order- and partitioning-independent (the dsum policy applied to a
    bivariate statistic).

    One LAG window per entity (the same single-sort shape as A7
    time-since-last) produces the (x, y) = (v_t, v_{t-k}) pairs; one
    map-side-combined aggregate collapses them to per-group
    (n, Σx, Σy, Σx², Σy², Σxy); Pearson r is the closed form

        r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))

    Zero-variance groups (constant series) yield NULL r — guarded, never
    an ANSI divide-by-zero.
    """
    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    pairs = (
        df.select(
            F.col(group_col),
            F.col(value_col).alias("_x"),
            F.lag(value_col, lag).over(w).alias("_y"),
        )
        .filter(F.col("_y").isNotNull() & F.col("_x").isNotNull())
    )
    x, y = F.col("_x"), F.col("_y")
    g = pairs.groupBy(group_col).agg(
        F.count("*").alias("n_pairs"),
        F.sum(x.cast("decimal(18,4)")).cast("double").alias("_sx"),
        F.sum(y.cast("decimal(18,4)")).cast("double").alias("_sy"),
        F.sum((x * x).cast("decimal(38,8)")).cast("double").alias("_sxx"),
        F.sum((y * y).cast("decimal(38,8)")).cast("double").alias("_syy"),
        F.sum((x * y).cast("decimal(38,8)")).cast("double").alias("_sxy"),
    )
    n = F.col("n_pairs")
    sx, sy = F.col("_sx"), F.col("_sy")
    den2 = (n * F.col("_sxx") - sx * sx) * (n * F.col("_syy") - sy * sy)
    r = (n * F.col("_sxy") - sx * sy) / F.sqrt(F.when(den2 > 0, den2))
    return g.select(
        group_col,
        "n_pairs",
        F.round(r, 6).alias(f"autocorr_lag{lag}"),
    )
