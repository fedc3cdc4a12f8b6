"""Point-in-time (as-of) join — training sets without label leakage.

Reference parity: Feast ``get_historical_features(entity_df, features)``
(feast/feature_utils.py:151-168) and the online/offline parity check
(feature_utils.py:170-232). Semantics: for each label row, take the latest
feature row with ``feature_ts <= label_ts`` for the same entity.

Implementation is the **union + last_value(ignore nulls)** pattern, NOT a
range join:

    tag feature rows (src=0) and label rows (src=1) → union →
    window partitionBy(entity) orderBy(ts, src, tiebreak) →
    last(feature_col, ignorenulls) over rows unbounded-preceding..current →
    keep label rows.

Why this is the 100 TB-safe plan: a naive ``l.ts >= r.ts`` theta-join
explodes to O(|labels|·|features per key|) intermediate rows before the
per-key top-1 filter; the union pattern is one shuffle + one sort, linear in
input size, and skew behaves like any other keyed sort. (Same pattern Flink's
temporal join and Delta's SCD-2 reads use internally.)

Ordering ``(ts, src, tiebreak)`` makes the join inclusive (feature at exactly
label_ts wins, matching Feast's ``<=``) and fully deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    labels: DataFrame,
    features: DataFrame,
    entity_col: str,
    label_ts_us: str,
    feature_ts_us: str,
    feature_cols: list[str],
    label_cols: list[str],
    tiebreak_col: str = "event_id",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Return one row per label row, enriched with the as-of feature values
    (null when no feature row qualifies).

    - ``direction="backward"`` (default): latest feature with
      ``feature_ts <= label_ts`` — the training-set/no-leakage join.
    - ``direction="forward"``: earliest feature with
      ``feature_ts >= label_ts`` — "next reading" joins (outcome lookups,
      next-sensor-sample enrichment). Same union pattern with the frame
      mirrored (current-row..unbounded-following, ``first`` ignore-nulls);
      the source tag flips so an equal-timestamp feature stays inclusive.
    - ``tolerance_us``: max staleness/lead in micros (pandas ``merge_asof``
      tolerance ≙ Feast feature TTL): matches farther than this from the
      label are nulled out. Gated PER COLUMN against the timestamp of the
      row that actually supplied that column's value (ignorenulls can
      carry different columns from different rows) — no extra shuffle.

    Both inputs must carry exact integer event-time micros (see
    ``windows.with_event_micros``); equality/ordering on integers avoids any
    FP ambiguity at boundaries.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    back = direction == "backward"
    # Source tag ordering makes the equal-timestamp feature inclusive on
    # both directions: backward scans the past, so the feature must sort
    # BEFORE the label (0 < 1); forward scans the future, so it must sort
    # AFTER (2 > 1).
    f_tag = 0 if back else 2
    f = features.select(
        F.col(entity_col),
        F.col(feature_ts_us).alias("_us"),
        F.lit(f_tag).alias("_src"),
        F.col(tiebreak_col).alias("_tb"),
        *[F.col(c) for c in feature_cols],
        *[F.lit(None).cast(labels.schema[c].dataType).alias(c) for c in label_cols],
    )
    l = labels.select(
        F.col(entity_col),
        F.col(label_ts_us).alias("_us"),
        F.lit(1).alias("_src"),
        F.col(tiebreak_col).alias("_tb"),
        *[F.lit(None).cast(features.schema[c].dataType).alias(c) for c in feature_cols],
        *[F.col(c) for c in label_cols],
    )
    u = f.unionByName(l)
    base = Window.partitionBy(entity_col).orderBy("_us", "_src", "_tb")
    if back:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    if tolerance_us is None:
        carried = [pick(c).alias(f"asof_{c}") for c in feature_cols]
        out = u.select("*", *carried).filter(F.col("_src") == 1)
    else:
        # With ignorenulls each asof_<col> can come from an OLDER row than
        # the nearest feature row, so a single carried timestamp would gate
        # staleness against the wrong row.  Carry (ts, value) together as a
        # struct per column: the struct is null exactly when the column is
        # null, so ignorenulls picks the row that actually supplied the
        # value, and the tolerance applies to that row's timestamp.
        carried = [
            pick(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(F.col("_us").alias("us"), F.col(c).alias("v")),
                )
            ).alias(f"_p_{c}")
            for c in feature_cols
        ]
        out = u.select("*", *carried).filter(F.col("_src") == 1)
        gated = []
        for c in feature_cols:
            p = F.col(f"_p_{c}")
            dist = (F.col("_us") - p["us"]) if back else (p["us"] - F.col("_us"))
            gated.append(
                F.when(p.isNotNull() & (dist <= tolerance_us), p["v"]).alias(
                    f"asof_{c}"
                )
            )
        out = out.select(
            *[c for c in out.columns if not c.startswith("_p_")], *gated
        )
    return out.select(
        F.col(entity_col),
        F.col("_us").alias("label_ts_us"),
        F.col("_tb").alias("label_key"),
        *[F.col(c) for c in label_cols],
        *[F.col(f"asof_{c}") for c in feature_cols],
    )


def nearest_join(
    labels: DataFrame,
    features: DataFrame,
    entity_col: str,
    label_ts_us: str,
    feature_ts_us: str,
    feature_cols: list[str],
    label_cols: list[str],
    tiebreak_col: str = "event_id",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest-in-time join: for each label row, the feature row
    minimizing ``|feature_ts − label_ts|`` within the same entity
    (pandas ``merge_asof(direction="nearest")``) — sensor-reading
    alignment, closest-quote enrichment, nearest-checkpoint lookup.

    Composition, not a new kernel: one backward and one forward
    ``asof_join`` (each the linear union+carry pattern — no range-join
    explosion) joined back on the label key, picking whichever side is
    closer; exact ties go BACKWARD (the no-leakage default, matching
    pandas).  ``tolerance_us`` bounds both directions.  The reconciling
    join is label-sized ⋈ label-sized on the (entity, ts, key) triple —
    an ordinary co-partitioned shuffle join, linear in the label count.

    Output: label keys + ``near_<col>`` per feature column +
    ``near_ts_us`` / ``near_delta_us`` (signed, negative = feature before
    label; null when nothing qualifies).  All feature values come from
    ONE row (the winner), unlike ``asof_join`` whose per-column
    ignorenulls carry may mix rows.
    """
    feats = features.withColumn("_fts", F.col(feature_ts_us))
    carried = [*feature_cols, "_fts"]
    keys = [entity_col, "label_ts_us", "label_key"]
    back = asof_join(
        labels, feats, entity_col, label_ts_us, feature_ts_us,
        carried, label_cols, tiebreak_col, "backward", tolerance_us,
    ).select(
        *keys, *label_cols,
        *[F.col(f"asof_{c}").alias(f"_b_{c}") for c in carried],
    )
    fwd = asof_join(
        labels, feats, entity_col, label_ts_us, feature_ts_us,
        carried, [], tiebreak_col, "forward", tolerance_us,
    ).select(
        *keys,
        *[F.col(f"asof_{c}").alias(f"_f_{c}") for c in carried],
    )
    j = back.join(fwd, keys)
    bts, fts = F.col("_b__fts"), F.col("_f__fts")
    bd = F.col("label_ts_us") - bts
    fd = fts - F.col("label_ts_us")
    use_b = bts.isNotNull() & (fts.isNull() | (bd <= fd))
    picked = [
        F.when(use_b, F.col(f"_b_{c}"))
        .otherwise(F.col(f"_f_{c}"))
        .alias(f"near_{c}")
        for c in feature_cols
    ]
    near_ts = F.when(use_b, bts).otherwise(fts)
    return j.select(
        *keys, *label_cols, *picked,
        near_ts.alias("near_ts_us"),
        (near_ts - F.col("label_ts_us")).alias("near_delta_us"),
    )
