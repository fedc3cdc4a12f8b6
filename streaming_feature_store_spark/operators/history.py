"""Slowly-changing-dimension (SCD type 2) history build — turning an
append-only event/change log into interval-versioned entity history.

Reference parity: the reference's feature store keeps only the LATEST row
per entity (streaming/core/sinks/redis_sink.py latest-view semantics, and
our ``streaming/sinks.py`` upsert twin, S7). SCD2 is the warehouse
completion of that surface: every version a key ever had, with its
validity interval — what a training pipeline needs to reconstruct "the
value as of time T" without an as-of join against the raw log every time.

Plan shape (the 100 TB-safe one): ONE window partitioned by entity ordered
by (ts, tiebreak); ``lead`` supplies each row's expiry. No self-join, no
range join — the same single-sort discipline as the as-of join
(operators/asof.py). Dedup of consecutive identical versions is an
optional LAG comparison in the same window (one pass, no extra shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(
    df: DataFrame,
    entity_col: str,
    ts_us_col: str,
    attr_cols: list[str],
    tiebreak_col: str = "event_id",
    collapse_unchanged: bool = False,
) -> DataFrame:
    """Interval-version the change log: one row per version with
    ``valid_from_us`` (the event time), ``valid_to_us`` (the next
    version's event time; NULL while current) and ``is_current``.

    ``collapse_unchanged=True`` first drops rows whose ``attr_cols`` all
    equal the previous version's (no-op updates), so intervals cover
    maximal constant runs — the usual SCD2 contract. Comparison is
    null-safe (``<=>``).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_us_col, tiebreak_col)
    out = df.select(entity_col, ts_us_col, tiebreak_col, *attr_cols)
    if collapse_unchanged:
        changed = F.lit(False)
        for c in attr_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        # first row per entity has lag NULL → eqNullSafe false → changed
        out = out.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
        w = Window.partitionBy(entity_col).orderBy(ts_us_col, tiebreak_col)
    nxt = F.lead(ts_us_col).over(w)
    return (
        out.withColumn("valid_from_us", F.col(ts_us_col).cast("long"))
        .withColumn("valid_to_us", nxt.cast("long"))
        .withColumn("is_current", nxt.isNull())
        .drop(ts_us_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff of two table snapshots — the change-data audit a
    pipeline runs between two loads of the same source (did the refresh
    add/drop/mutate what we expected?), and the offline twin of a CDC
    feed when the source can't emit one.

    Emits one row per key present in either side with ``diff_status`` ∈
    ``added`` (key only in ``new``) / ``removed`` (only in ``old``) /
    ``changed`` (present in both, any compare column differs) /
    ``unchanged``, plus ``changed_cols``: the comma-joined sorted names
    of the columns that differ (empty string otherwise) — a string, not
    an array, so the report is flat and engine-portable. Comparison is
    NULL-SAFE (NULL==NULL holds; NULL vs value is a change), the only
    semantics under which a diff of nullable snapshots round-trips.

    ``compare_cols`` defaults to every shared non-key column. Unchanged
    keys are suppressed by default (at 100 TB they are ~the whole join;
    the report should be the delta, not the table) — flip
    ``include_unchanged`` for the full reconciliation view.

    Plan: ONE full outer join on the key columns (the unavoidable
    shuffle, co-partitioned on both sides by the same key so AQE can
    plan skew splits); every status/changed-col expression is codegen on
    the joined row. No window, no second pass, no collect.
    """
    if compare_cols is None:
        keyset = set(key_cols)
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keyset
        ]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    diff_flags = [
        (c, ~F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}")))
        for c in compare_cols
    ]
    changed_cols = F.concat_ws(
        ",",
        F.array_compact(
            F.array(
                *[
                    F.when(flag, F.lit(c)).otherwise(F.lit(None))
                    for c, flag in sorted(diff_flags, key=lambda t: t[0])
                ]
            )
        ),
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed_cols != F.lit(""), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
            for c in key_cols
        ],
        status.alias("diff_status"),
        F.when(status == "changed", changed_cols)
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
    if include_unchanged:
        return out
    return out.filter(F.col("diff_status") != "unchanged")


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (op ∈ {'I','U','D'}, monotone ``seq_col`` per
    key) to a base snapshot and return the new state — the batch form of
    the Debezium/Delta MERGE every lakehouse table maintenance job runs.

    Semantics: per key, the change with the HIGHEST seq wins; 'D' removes
    the key, 'I'/'U' replace the row with the change's payload; keys
    untouched by the changelog pass through.  Late/duplicate changelog
    entries are harmless — max-seq-wins is idempotent and
    order-independent, the property that lets the changelog be consumed
    at-least-once.

    Plan shape: ONE window (per-key max-seq pick) over the changelog —
    which is normally tiny relative to the base — then one outer join to
    the base keyed on the (broadcast-eligible) winners.  The base table is
    never sorted or windowed; at 100 TB the cost is one shuffle of the
    changelog plus an AQE-sized join against the snapshot.
    """
    # op as tiebreak: a changelog SHOULD have unique seqs per key, but a
    # deterministic pick under equal seqs beats a partitioning-dependent one
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col), op_col)
    winners = (
        changes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    payload_cols = [
        c for c in base.columns if c not in key_cols
    ]
    joined = base.alias("b").join(
        winners.alias("c"), key_cols, "full_outer"
    )
    op = F.col(f"c.{op_col}")
    out_cols = [F.col(k) for k in key_cols] + [
        F.when(op.isNull(), F.col(f"b.{c}"))
        .otherwise(F.col(f"c.{c}"))
        .alias(c)
        for c in payload_cols
    ]
    return joined.filter(op.isNull() | (op != "D")).select(*out_cols)
