"""Skew mitigation: salted two-phase aggregation.

Entity-keyed workloads are Zipf-skewed in practice (the reference's fraud
generator deliberately concentrates 30 % of fraud on ~200 hot cards —
generators/txgen.py:117-123). A single hot key turns `groupBy(entity)` into
one straggler task at 100 TB.

``salted_agg`` runs algebraic aggregates in two phases:

    phase 1: groupBy(entity, salt) — the hot key's rows spread over
             ``salt_buckets`` reducers, each computing partial aggregates;
    phase 2: groupBy(entity) merging the partials (SUM of counts/sums,
             MIN of mins, MAX of maxes).

Both phases are map-side-combined by Spark, so the extra pass costs one
small shuffle of ≤ salt_buckets rows per entity. AQE's skew-JOIN splitting
(enabled in session.py) covers the join side; this covers aggregation.
Non-algebraic aggregates (exact distinct, mode) don't decompose this way —
use approx_count_distinct (q45) or the two-level groupBy instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# (phase-1 partial, phase-2 merge) per supported algebraic aggregate
_MERGES = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    key_col: str,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """aggs: output_name -> (agg_kind, column); e.g.
    {"n": ("count", "*"), "total": ("sum", "value")}.

    SUM columns go through the same decimal accumulation as exprs.dsum, so
    salted and unsalted plans produce bit-identical doubles.
    """
    salted = df.withColumn(
        "_salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt_buckets)
    )
    partials = []
    finals = []
    for name, (kind, col) in aggs.items():
        if kind not in _MERGES:
            raise ValueError(f"non-algebraic aggregate {kind!r} cannot be salted")
        partial, merge = _MERGES[kind]
        c = F.col(col) if col != "*" else None
        if kind == "sum":
            partials.append(F.sum(F.col(col).cast("decimal(18,4)")).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").cast("double").alias(name))
        elif kind == "count":
            partials.append(F.count("*" if col == "*" else col).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        else:
            partials.append(partial(col).alias(f"_p_{name}"))
            finals.append(merge(f"_p_{name}").alias(name))
    phase1 = salted.groupBy(key_col, "_salt").agg(*partials)
    return phase1.groupBy(key_col).agg(*finals)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter skew diagnostic for a prospective join/group key: the
    top-N keys by row count with their share of the table and their size
    relative to the mean key — the number that tells you whether the next
    join needs ``salted_agg``/AQE skew handling BEFORE it straggles.

    One groupBy on the key, a two-counter global aggregate, and a
    TakeOrdered top-N (no global sort materializes); ties break on the
    key for determinism.
    """
    counts = df.groupBy(F.col(key_col)).agg(F.count("*").alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").alias("_tot"), F.count("*").alias("_nkeys")
    )
    top = counts.orderBy(F.desc("key_rows"), F.col(key_col)).limit(top_n)
    return top.crossJoin(F.broadcast(totals)).select(
        F.col(key_col),
        "key_rows",
        F.round(F.col("key_rows") / F.col("_tot"), 6).alias("row_share"),
        F.round(
            F.col("key_rows") * F.col("_nkeys") / F.col("_tot"), 4
        ).alias("x_mean_key"),
    )


def replicated_skew_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    salt_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt-and-replicate equi-join for a skewed fact key: each fact row
    gets a deterministic salt from an existing unique column
    (``pmod(xxhash64(salt_col), salt_buckets)``), the dim side is
    replicated across every salt bucket with ``explode``, and the join
    runs on ``(key, salt)`` — so a hot key's rows land on
    ``salt_buckets`` reducers instead of one straggler.

    This is the manual twin of AQE's skew-join splitting for the cases
    AQE cannot reach: stream-stream/stateful joins (no runtime re-plan),
    bucketed sort-merge joins whose layout must be preserved, or engines
    where AQE is off.  Results are EXACTLY the plain join's rows (salting
    only re-partitions; replication only duplicates the dim row each fact
    row would have matched), which is what the q186 oracle pins.

    Cost model: the dim shuffle grows ×``salt_buckets`` — use only when
    |dim| × salt_buckets ≪ |fact|, the regime where skew hurts.  The
    salt never leaves this function; output columns = fact ∪ dim.

    Only fact-preserving modes are sound: the dim side is exploded
    ×``salt_buckets`` BEFORE the join, so any mode that emits unmatched
    DIM rows (right/full outer) would surface each unmatched dim row once
    per salt bucket.  ``inner``/``left`` (and fact-side ``left_semi``/
    ``left_anti``, which never duplicate and see every key in every salt
    bucket) are accepted; the unsound modes raise rather than silently
    duplicate.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in allowed
    }:
        raise ValueError(
            f"replicated_skew_join: how={how!r} is unsound — the dim side "
            f"is replicated x{salt_buckets} before the join, so modes that "
            "emit unmatched dim rows (right/full outer) or evaluate "
            "dim-side membership (semi/anti from dim) would multiply them "
            "by the salt count. Use how in {'inner','left'}; for outer "
            "semantics on the dim side, run the plain join or swap sides."
        )
    salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
    )
    replicated = dim.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast(
                "array<bigint>"
            )
        ),
    )
    joined = salted.join(
        replicated,
        (salted[fact_key] == replicated[dim_key])
        & (salted["_salt"] == replicated["_salt"]),
        how,
    )
    return joined.drop("_salt")
