"""Incremental aggregate maintenance via mergeable partial states.

The pattern behind incremental materialized views and the reference's
nightly-rollup habit: never rescan history — keep per-(group, shard)
PARTIAL aggregate states (a shard is typically a day or an ingest batch),
and answer any group-level question by MERGING states.  Appending a new
day touches one shard; a backfill correction recomputes one shard; the
merge is associative/commutative, so 100 TB of history collapses through
map-side combine regardless of how many shards exist.

The state carried per (group, shard) is the classic algebraic tuple
(n, Σx, Σx², min, max) with the sums in EXACT decimal — so the merged
result is bit-identical to a direct aggregation over the raw rows (the
property the q194 oracle pins cross-engine), including the variance
recovered from merged moments:  var = (Σx² − (Σx)²/n) / (n−1).  The
decimal Σx² accumulator is decimal(38,8), wide enough for 1e12 rows of
1e6-magnitude values.

Sketch-backed states (HLL/KLL/theta) extend the same shard-and-merge
contract to non-algebraic aggregates — see streaming/sketches.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def partial_aggregate(
    df: DataFrame,
    group_cols: list[str],
    shard_col,
    value_col: str,
) -> DataFrame:
    """Collapse raw rows to one mergeable state row per (group, shard).

    ``shard_col`` may be a column name or an expression (e.g.
    ``F.to_date("ts")``).  Output columns: group_cols + ``shard`` +
    (n, sum_dec, sumsq_dec, vmin, vmax) — sums kept in decimal so a
    later :func:`merge_partials` (or an engine-side SUM over any subset
    of shards) is exact, order- and partitioning-independent.
    """
    shard = (
        F.col(shard_col) if isinstance(shard_col, str) else shard_col
    ).alias("shard")
    v = F.col(value_col)
    return df.groupBy(*group_cols, shard).agg(
        F.count(value_col).alias("n"),
        F.sum(v.cast("decimal(18,4)")).alias("sum_dec"),
        F.sum((v * v).cast("decimal(38,8)")).alias("sumsq_dec"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )


def merge_partials(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge shard-level states to group totals: SUM the counts and the
    decimal moment sums, MIN/MAX the extrema, then recover mean and
    sample variance from the merged moments.  Pure second-level groupBy
    over |groups|×|shards| state rows — never touches raw data, which is
    the whole point: appending a day merges one new state row, not a
    rescan.  Exactly equals (and is oracled against) the direct one-pass
    aggregation over raw rows.
    """
    m = partials.groupBy(*group_cols).agg(
        F.sum("n").alias("n_rows"),
        F.sum("sum_dec").alias("_s"),
        F.sum("sumsq_dec").alias("_ss"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.count("*").alias("n_shards"),
    )
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    n = F.col("n_rows")
    var = F.when(
        n > 1, (ss - s * s / n) / (n - 1)
    )
    return m.select(
        *group_cols,
        "n_shards",
        "n_rows",
        F.round(s, 4).alias("value_sum"),
        F.round(s / n, 6).alias("value_mean"),
        F.round(var, 4).alias("value_var"),
        "vmin",
        "vmax",
    )
