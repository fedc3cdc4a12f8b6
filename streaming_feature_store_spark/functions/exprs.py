"""Scalar/aggregate expression helpers shared by every operator.

Determinism contract: distributed double summation is order-dependent, and the
order Spark reduces partitions in is not the order a single-node oracle uses.
Any aggregate whose value is compared across engines therefore goes through
**exact decimal accumulation** (``dsum``: cast to DECIMAL(18,4) → SUM → cast
back to double) — bit-identical regardless of partitioning, at the cost of one
extra cast in the map side. This mirrors what production pipelines do for
money columns anyway (the reference keeps ``amount`` as float and rounds at
the edge — streaming/core/processors/transaction.py:153-183 — which we
deliberately improve on).

Ratios/scores are plain double arithmetic over already-deterministic inputs,
rounded at the presentation edge (``r4``/``r6``), matching the reference's
2-3 dp output rounding (transaction.py:153-183).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: str | Column, scale: int = 4) -> Column:
    """Order-independent SUM for double columns via decimal accumulation."""
    return F.sum(_col(c).cast(f"decimal(18,{scale})")).cast("double")


def davg(c: str | Column, scale: int = 4) -> Column:
    """Deterministic AVG = exact decimal sum / count (double division)."""
    return dsum(c, scale) / F.count(_col(c))


def r4(c: Column) -> Column:
    return F.round(c, 4)


def r6(c: Column) -> Column:
    return F.round(c, 6)


def ratio(num: Column, den: Column) -> Column:
    """num/den with divide-by-zero → null (matches ANSI NULLIF idiom)."""
    return num / F.nullif(den.cast("double"), F.lit(0.0))


def clamp01(c: Column) -> Column:
    """min(x, 1.0) normalization used throughout the reference
    (e.g. velocity score — transaction.py:91,161)."""
    return F.least(c, F.lit(1.0))


def coerce_typed_strings(df, type_map: dict[str, str]):
    """P12: stringified-value re-typing (the reference round-trips every
    feature through Redis strings and try-parses back —
    inference/features.py:376-403, training/datasets.py:122-148). Our engine
    keeps native types end-to-end, but ingesting legacy stores needs the
    cascade once: try_cast per declared type, with 'true'/'false' → boolean
    handled case-insensitively."""
    import pyspark.sql.functions as F

    out = df
    for c, t in type_map.items():
        col = F.col(c)
        if t == "boolean":
            out = out.withColumn(
                c,
                F.when(F.lower(col) == "true", F.lit(True))
                .when(F.lower(col) == "false", F.lit(False))
                .otherwise(F.lit(None).cast("boolean")),
            )
        else:
            out = out.withColumn(c, col.try_cast(t))
    return out
