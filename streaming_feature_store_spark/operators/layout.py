"""Data-layout clustering — multi-dimensional sort keys (Z-order/Morton)
for write-side file clustering, so scans that filter on ANY prefix of the
clustered dimensions prune files instead of reading the table.

Reference parity: none — the reference stores features in Redis/parquet
with single-key access (`streaming/core/sinks/redis_sink.py`); layout
clustering is the lakehouse-side capability a 100 TB parquet corpus needs
(the same technique Delta's `OPTIMIZE ZORDER BY` and Hudi clustering
apply). Everything here is pure integer codegen — no UDF, no shuffle
beyond the final range partitioning that IS the layout being produced.

Why Z-order and not a lexicographic sort: a sort on (a, b) clusters `a`
perfectly and `b` not at all; interleaving the bits of both keys gives
every dimension ~equal pruning power, which is what makes `WHERE b = ?`
queries skip files too.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of each input
    column: bit ``b`` of column ``i`` lands at output bit ``b·n + i``.

    Inputs must already be non-negative integers in ``[0, 2^bits)`` —
    use ``zorder_rank`` to normalize arbitrary (skewed, negative, non-
    integer) columns first. ``n·bits`` must fit a signed 64-bit long
    (≤ 63). The expansion is a flat sum of shift/mask terms — pure
    whole-stage-codegen, constant-folded shifts, no UDF, no shuffle.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = []
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_rank(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Normalize arbitrary numeric columns to ``[0, 2^bits)`` grid cells
    (adds ``_zr_<col>`` per input) by equal-width min/max scaling:
    ``floor((x − min) / (max − min) · (2^bits − 1))``, NULLs to cell 0.

    The min/max pair rides along as a lazy broadcast one-row aggregate
    (house pattern — no driver action, one extra scan-side aggregate, no
    sort, no shuffle of the data itself), so the normalization is exact,
    deterministic, and replayable by an external engine. Equal-width is
    what the parquet min/max pruning actually sees; for PATHOLOGICALLY
    long-tailed columns substitute a pre-bucketed expression (e.g.
    ``log``/``ntile``-of-approxQuantile) as the input column — rank
    precision only changes how evenly files fill, never correctness.
    """
    from pyspark.sql.functions import broadcast

    nbuckets = (1 << bits) - 1
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
            )
        ]
    )
    out = df.crossJoin(broadcast(stats))
    for c in cols:
        span = F.col(f"_mx_{c}") - F.col(f"_mn_{c}")
        cell = F.when(
            F.col(c).isNull() | (span <= 0), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(nbuckets),
                F.floor(
                    (F.col(c).cast("double") - F.col(f"_mn_{c}"))
                    / span
                    * (nbuckets + 1)
                ),
            )
        )
        out = out.withColumn(f"_zr_{c}", cell.cast("long"))
    return out.drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Physically cluster a frame on the Z-order key of ``cols`` (rank-
    normalized): range-partition by the key, sort within partitions, drop
    the helper columns. Writing the result produces files whose per-file
    min/max spans on EVERY clustered column are narrow — the parquet
    footer stats then prune scans filtering on any of them.

    The range partitioning is the one shuffle and is exactly the layout
    being requested; ``num_partitions`` defaults to
    ``spark.sql.shuffle.partitions`` (at real scale: target file count).
    """
    ranked = zorder_rank(df, cols, bits)
    key = zorder_key([f"_zr_{c}" for c in cols], bits)
    keyed = ranked.withColumn("_zkey", key)
    parted = (
        keyed.repartitionByRange(num_partitions, "_zkey")
        if num_partitions
        else keyed.repartitionByRange("_zkey")
    )
    return parted.sortWithinPartitions("_zkey").drop(
        "_zkey", *[f"_zr_{c}" for c in cols]
    )
