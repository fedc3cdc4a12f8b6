"""Table profiling — the data-quality audit pass a pipeline runs before
trusting a new snapshot (null rates, cardinalities, numeric ranges).

The reference monitors its feature tables operationally (Prometheus gauges,
`streaming/core/utils/metrics.py`); this is the batch restatement: one
declarative pass over the table producing a per-column report that is
oracle-checkable and scales as an ordinary aggregation.

Plan shape: ONE aggregate computes count/nulls for every column (a single
scan, all counters map-side), and the exact per-column distinct counts run
as one grouped pass per column over a melted (column, value) projection —
NOT one `countDistinct` per column in a single agg, which Catalyst expands
into |columns| overlapping Expand duplicates of every row. At extreme scale
swap the exact distinct for `approx_count_distinct` (same melt, HLL merge).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: rows, nulls, null fraction, exact distinct count.

    Returns one row per column: (column, n_rows, n_null, null_frac,
    n_distinct). Distinct counts ignore nulls (SQL COUNT(DISTINCT)
    semantics). Values are melted to STRING for the distinct pass — exact
    because distinctness is preserved by the cast for the primitive types
    profiled here (validated in code; floats are normalized with ``+ 0.0``
    first so -0.0 and 0.0 collapse exactly as native grouping equality
    does). Non-primitive columns raise rather than silently cast.
    """
    dtypes = dict(df.dtypes)
    cols = columns or [c for c, _ in df.dtypes]
    # The melt-to-string distinct pass is exact only when the cast renders
    # values injectively AND agrees with native grouping equality.  Enforce
    # the primitive set in code (not just the docstring), and normalize
    # floats so -0.0/0.0 — distinct strings, equal natively — collapse
    # before the cast (ADVICE r3).
    supported = {
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "string", "boolean", "date", "timestamp", "timestamp_ntz",
    }
    for c in cols:
        dt = dtypes.get(c, "?")
        if dt not in supported and not dt.startswith("decimal"):
            raise ValueError(
                f"profile_columns: column {c!r} has non-primitive type {dt};"
                " the string-melt distinct pass is only exact for "
                f"{sorted(supported)} / decimal"
            )

    def _melt_value(c: str) -> F.Column:
        v = F.col(c)
        if dtypes[c] in ("float", "double"):
            v = v + F.lit(0.0)  # IEEE: -0.0 + 0.0 == 0.0; NaN stays NaN
        return v.cast("string")

    base = df.select(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
            for c in cols
        ],
    )
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        _melt_value(c).alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    distincts = (
        melted.filter(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.lit(1))
        .groupBy("column")
        .agg(F.count("*").alias("n_distinct"))
    )
    per_col = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"null_{c}").alias("n_null"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.column", "s.n_rows", "s.n_null")
    return (
        per_col.join(distincts, on="column", how="left")
        .select(
            "column",
            "n_rows",
            "n_null",
            F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_frac"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        )
    )


def numeric_ranges(df: DataFrame, columns: list[str]) -> DataFrame:
    """Min/max/decimal-exact mean per numeric column, one scan, melted to
    one row per column (the companion report to ``profile_columns``)."""
    aggs = []
    for c in columns:
        aggs += [
            F.min(c).cast("double").alias(f"min_{c}"),
            F.max(c).cast("double").alias(f"max_{c}"),
            F.avg(F.col(c).cast("decimal(28,8)")).cast("double").alias(f"avg_{c}"),
        ]
    one = df.select(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"min_{c}").alias("min_value"),
                        F.col(f"max_{c}").alias("max_value"),
                        F.round(F.col(f"avg_{c}"), 6).alias("avg_value"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    ).select("s.column", "s.min_value", "s.max_value", "s.avg_value")
