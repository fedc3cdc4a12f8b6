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
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


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


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Robust per-group summary: exact (lo, hi) percentiles, values clamped
    to that range (winsorization — the standard outlier treatment when you
    want bounded influence WITHOUT dropping rows, vs the IQR gate's
    drop/flag), then mean over the clamped values plus how many rows each
    tail clamped.

    Exact ``percentile`` implies a per-group sort of that group's values —
    fine for bounded per-entity groups; at open-ended table scale swap in
    ``approx_percentile`` (same plan otherwise, q81's path). Two passes by
    construction: percentiles are rank statistics, so the clamp cannot
    fuse into the pass that computes them.
    """
    pcts = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_plo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_phi"),
        F.count(value_col).alias("n"),
    )
    v = F.col(value_col)
    clamped = F.least(F.greatest(v, F.col("_plo")), F.col("_phi"))
    # decimal accumulation over 6dp-rounded clamps: the mean is then exact
    # given its inputs, so cross-engine/run FP summation order can't move
    # the rounded result (the dsum discipline, functions/exprs.py)
    return (
        df.join(pcts, on=group_col)
        .groupBy(group_col, "_plo", "_phi", "n")
        .agg(
            F.round(
                F.avg(F.round(clamped, 6).cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("winsorized_mean"),
            F.sum((v < F.col("_plo")).cast("long")).alias("n_clamped_low"),
            F.sum((v > F.col("_phi")).cast("long")).alias("n_clamped_high"),
        )
        .select(
            group_col,
            "n",
            F.round(F.col("_plo"), 6).alias("p_lo"),
            F.round(F.col("_phi"), 6).alias("p_hi"),
            "winsorized_mean",
            "n_clamped_low",
            "n_clamped_high",
        )
    )


def value_histogram(
    df: DataFrame, value_col: str, n_bins: int = 20
) -> DataFrame:
    """Equi-width histogram over [min, max] — the profiling companion to
    ``numeric_ranges`` (and the same fixed-bin discipline as
    ``drift.ks_binned``): bin edges from an exact min/max pass, then one
    map-side grouped count keyed by bin. Empty bins are filled in with a
    broadcast sequence join so the output is always exactly ``n_bins``
    rows — a plot/report consumer never has to infer gaps.

    Deterministic and SQL-reproducible: integer bin ids via floor division
    with the max value clamped into the last bin.
    """
    lo, hi = df.agg(F.min(value_col), F.max(value_col)).first()
    lo = float(lo)
    hi = float(hi)
    width = (hi - lo) / n_bins if hi > lo else 1.0
    b = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(n_bins - 1),
    )
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").alias("bin"))
    return (
        bins.join(counts, on="bin", how="left")
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )


def gini_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    tiebreak_col: str,
    min_rows: int = 2,
) -> DataFrame:
    """Per-group Gini concentration index of ``value_col`` — how unequally
    a group's mass is spread over its members (basket value concentration,
    per-user spend inequality; a standard fraud/quality feature).

    Sample definition over ascending values (1-based rank i):
    ``G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n`` — rank via a group-partitioned
    window ordered (value, tiebreak), so groups sort independently (no
    global sort; skew follows group sizes). Both weighted and plain sums
    are decimal-accumulated so FP order can't move the rounded result.
    Groups smaller than ``min_rows`` (and zero-sum groups) are dropped:
    concentration is undefined there.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    ranked = df.select(
        group_col,
        F.col(value_col).alias("_x"),
        F.row_number().over(w).alias("_i"),
    )
    g = ranked.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(F.col("_x").cast("decimal(28,6)")).alias("_sx"),
        F.sum((F.col("_i") * F.col("_x")).cast("decimal(28,6)")).alias("_six"),
    )
    return (
        g.filter((F.col("n") >= min_rows) & (F.col("_sx") != 0))
        .select(
            group_col,
            "n",
            F.round(
                2.0 * F.col("_six").cast("double")
                / (F.col("n") * F.col("_sx").cast("double"))
                - (F.col("n") + 1) / F.col("n").cast("double"),
                6,
            ).alias("gini"),
        )
    )


def categorical_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (nats) and Gini impurity per categorical column —
    the diversity half of a table profile (label balance checks, feature
    pre-screening, corpus source-mix monitoring).  One count aggregation
    per column unioned into a single frame; probabilities and the
    -Σ p·ln p / 1-Σ p² reductions are pure codegen over the per-column
    value-count frames (cardinality-bounded — never the raw rows twice).
    NULL is counted as its own category, as a profiler should."""
    outs = []
    for c in cols:
        counts = (
            df.select(F.col(c).cast("string").alias("v"))
            .groupBy("v")
            .agg(F.count("*").alias("n"))
        )
        outs.append(
            counts.select(
                F.lit(c).alias("column"),
                F.col("n"),
                F.sum("n").over(Window.partitionBy()).alias("total"),
            )
            .select(
                "column",
                (F.col("n") / F.col("total")).alias("p"),
            )
            .groupBy("column")
            .agg(
                F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy"),
                F.round(1 - F.sum(F.col("p") * F.col("p")), 6).alias(
                    "gini_impurity"
                ),
                F.count("*").cast("int").alias("n_categories"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def benford_digit_stats(
    df: DataFrame, value_col: str, min_value: float = 1.0
) -> DataFrame:
    """Leading-digit distribution vs Benford's law — the classic
    fabricated-amounts screen in fraud analytics: naturally occurring
    multi-scale amounts follow P(d)=log10(1+1/d); invented ones don't.
    Output: one row per digit 1-9 with observed share, expected share and
    the digit's chi-square contribution n·(obs-exp)²/exp.  One filter +
    one 9-group aggregation; the digit is substring arithmetic in
    codegen."""
    d = F.substring(
        F.abs(F.col(value_col)).cast("decimal(18,4)").cast("string"), 1, 1
    ).cast("int")
    obs = (
        df.filter(F.abs(F.col(value_col)) >= min_value)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy()
    expected = F.log10(1 + 1 / F.col("digit"))
    return (
        obs.select(
            "digit",
            "n",
            (F.col("n") / F.sum("n").over(tot)).alias("observed_p"),
            F.sum("n").over(tot).alias("total"),
        )
        .select(
            "digit",
            F.round("observed_p", 6).alias("observed_p"),
            F.round(expected, 6).alias("benford_p"),
            F.round(
                F.col("total")
                * (F.col("observed_p") - expected)
                * (F.col("observed_p") - expected)
                / expected,
                6,
            ).alias("chi2_contribution"),
        )
    )


def categorical_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Association strength between two categorical columns: mutual
    information (nats) and Cramér's V — the feature-selection screen for
    categorical features against a label (q139's correlation matrix is
    the numeric counterpart).

    One scan builds the (a, b) contingency counts; marginals derive from
    the joint by two more cardinality-bounded aggregations, never a
    second pass over the rows.  MI = Σ p(a,b)·ln(p(a,b)/(p(a)p(b)));
    Cramér's V = sqrt(χ² / (n·(min(|A|,|B|)-1))).  NULL is a category.
    """
    joint = (
        df.select(
            F.col(col_a).cast("string").alias("a"),
            F.col(col_b).cast("string").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    # cardinality-bounded; tracked so long-lived sessions can release it
    # (cacheutil.release_cached_intermediates — the ADVICE r3 contract)
    from streaming_feature_store_spark.cacheutil import persist_tracked

    joint = persist_tracked(joint)
    ma = joint.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = joint.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    tot = Window.partitionBy()
    j = (
        joint.join(broadcast(ma), "a")
        .join(broadcast(mb), "b")
        .withColumn("n", F.sum("n_ab").over(tot))
    )
    p_ab = F.col("n_ab") / F.col("n")
    p_a = F.col("n_a") / F.col("n")
    p_b = F.col("n_b") / F.col("n")
    e_ab = F.col("n_a") * F.col("n_b") / F.col("n")
    out = j.agg(
        F.round(
            F.sum(p_ab * F.log(p_ab / (p_a * p_b))), 6
        ).alias("mutual_information"),
        F.round(
            F.sqrt(
                F.sum(
                    (F.col("n_ab") - e_ab) * (F.col("n_ab") - e_ab) / e_ab
                )
                / (
                    F.first("n")
                    * (
                        F.least(
                            F.countDistinct("a"), F.countDistinct("b")
                        )
                        - 1
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
        F.countDistinct("a").cast("int").alias("card_a"),
        F.countDistinct("b").cast("int").alias("card_b"),
    )
    return out.select(
        F.lit(col_a).alias("col_a"),
        F.lit(col_b).alias("col_b"),
        "mutual_information",
        "cramers_v",
        "card_a",
        "card_b",
    )


def data_quality_report(
    df: DataFrame, rules: dict[str, "F.Column"]
) -> DataFrame:
    """Declarative constraint checking (the Deequ/expectations pattern):
    ``rules`` maps rule name → boolean Column that is TRUE for a
    VIOLATING row; the report has one row per rule with
    ``(rule, n_violations, n_rows, violation_rate)``.

    The training-data gate this models: before a snapshot enters a
    pipeline, assert value ranges, null contracts and enum membership,
    and fail the run (or route to quarantine) on regressions — the
    batch restatement of the reference's Pydantic validate-on-consume
    (`streaming/core/models/events.py:12-57`) with the same
    outcome surface as its DLQ counters.

    Plan shape: ALL rules evaluate in ONE conditional aggregate over a
    single scan (every counter is map-side partial — at 100 TB this is
    one pass regardless of rule count); the per-rule rows come from
    exploding a literal struct array over the 1-row aggregate, never
    from per-rule jobs. Referential rules need a join and live in
    ``referential_violations``; union the two reports.
    """
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"_v{i}")
        for i, cond in enumerate(rules.values())
    ]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(nm).alias("rule"), F.col(f"_v{i}").alias("v")
            )
            for i, nm in enumerate(names)
        ]
    )
    return row.select(
        F.explode(pairs).alias("p"), F.col("_n").alias("n_rows")
    ).select(
        F.col("p.rule").alias("rule"),
        F.col("p.v").alias("n_violations"),
        "n_rows",
        F.round(F.col("p.v") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    keys: dict[str, str],
    rule: str,
) -> DataFrame:
    """Foreign-key companion to ``data_quality_report``: count child
    rows whose ``keys`` (child col → parent col) have no parent match.
    Same output schema, so the two reports union into one gate.

    One pass: left join against the distinct parent key set with a hit
    marker, then a conditional aggregate — total and orphan counts from
    the same job (no separate anti-join + count actions). The distinct
    parent side is key-cardinality-bounded; AQE picks broadcast when it
    fits, shuffle join at dimension scale (session broadcast policy).
    """
    pcols = [F.col(pc).alias(cc) for cc, pc in keys.items()]
    pkeys = parent.select(*pcols).distinct().withColumn(
        "_hit", F.lit(1)
    )
    joined = child.join(pkeys, on=list(keys), how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.col("_hit").isNull().cast("long")), F.lit(0)
        ).alias("n_violations"),
    ).select(
        F.lit(rule).alias("rule"),
        "n_violations",
        "n_rows",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def split_violations(
    df: DataFrame,
    rules: dict[str, "F.Column"],
    persist: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Quarantine routing for the data-quality gate: returns
    ``(clean, quarantined)`` where quarantined rows carry a
    ``violated_rules`` array naming every rule they break.

    Completes the gate surface: ``data_quality_report`` measures,
    ``watermarks.quality_monitor`` streams the counters, this routes —
    the batch/foreachBatch analogue of the reference's
    validate-then-DLQ consume path (``streaming/sinks.route_dlq`` is
    the malformed-payload sibling; this one quarantines WELL-FORMED
    rows that fail business constraints).

    The two outputs are independent lazy plans, so consuming BOTH
    evaluates every rule (and scans the input) twice; pass
    ``persist=True`` to materialize the tagged frame once — tracked,
    released later by ``cacheutil.release_cached_intermediates()`` —
    when the rules are expensive or the input scan is. No shuffle
    either way.

    Raises if the input already has a ``violated_rules`` column:
    silently clobbering it (e.g. when re-gating previously quarantined
    rows) would lose data — rename or drop it first.
    """
    if "violated_rules" in df.columns:
        raise ValueError(
            "input already has a 'violated_rules' column; rename or "
            "drop it before re-gating"
        )
    tags = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(nm)).otherwise(F.lit(None))
                for nm, cond in rules.items()
            ]
        )
    )
    tagged = df.withColumn("violated_rules", tags)
    if persist:
        from streaming_feature_store_spark.cacheutil import persist_tracked

        tagged = persist_tracked(tagged)
    clean = tagged.filter(F.size("violated_rules") == 0).drop(
        "violated_rules"
    )
    quarantined = tagged.filter(F.size("violated_rules") > 0)
    return clean, quarantined


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity suppression for training-data release: keep only rows
    whose quasi-identifier combination is shared by at least ``k`` rows,
    and carry the group size along as ``qi_group_n`` (the standard
    Sweeney suppression model — a row indistinguishable from at least
    k−1 others on every quasi column cannot be singled out by joining
    the released table to an external one on those columns).

    Null-safe: NULL is a quasi VALUE here, not a wildcard — rows with
    NULL in a quasi column group together, the same semantics both
    window partitioning and a groupBy-join give, so the oracle and any
    downstream re-check agree. Generalization (bucketing a too-precise
    column until groups clear k) is the caller's move: pass the
    generalized expression as the quasi column and re-gate.

    Plan: ONE shuffle — a count window over the quasi partition (no
    separate aggregate+join pass, no broadcast of a potentially huge
    group-count relation); the suppression itself is a post-window
    filter. At 100 TB the quasi partition is the natural key
    distribution; a skewed quasi combination only makes its own group
    large, which is exactly the k-anonymous case.
    """
    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("qi_group_n", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("qi_group_n") >= k)
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """One-row audit for ``k_anonymize``: the k-anonymity level the table
    already has (min quasi-group size), group counts, and what the
    k-suppression would cost (rows and groups dropped) — the number a
    release pipeline gates on BEFORE deciding to suppress or generalize.

    Plan: one groupBy over the quasi columns, then a scalar aggregate of
    the group-size relation; both passes are map-side-partial friendly
    and the second input is |distinct quasi| rows, not |df|.
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count("*").alias("n"))
    return sizes.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.min("n").cast("bigint").alias("k_anonymity"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_suppressed"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("groups_suppressed"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile via the median absolute deviation:
    a value is flagged when ``|x − median| > k · 1.4826 · MAD`` — the
    robust twin of the z-score/IQR guards (M3, q104) that a single
    billion-dollar outlier cannot corrupt, since both location and scale
    are medians (50 % breakdown point; 1.4826 rescales MAD to σ under
    normality).

    Exact interpolated medians via ``percentile`` (the q52 convention —
    DuckDB ``quantile_cont`` computes the identical interpolation), so
    both engines agree on med, MAD, and every threshold comparison
    bit-for-bit.

    Plan: three aggregate passes over the facts (median; MAD of the
    residuals; flag counts), each one shuffle with the cardinality-bounded
    stats frame joined back via AQE broadcast.  ``percentile`` is an exact
    per-group sort-based aggregate — for groups beyond single-task sorts
    at 100 TB, swap ``approx_percentile`` with a documented error bound
    (same trade q52 documents).
    """
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(med, group_col)
    mad = with_med.groupBy(group_col).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    flagged = df.join(mad, group_col).select(
        g.alias(group_col),
        "med",
        "mad",
        (
            F.abs(v - F.col("med"))
            > F.lit(k) * F.lit(1.4826) * F.col("mad")
        ).alias("_out"),
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.count("*").alias("n_rows"),
            F.sum(F.col("_out").cast("long")).alias("n_outliers"),
        )
        .withColumn(
            "outlier_rate",
            F.round(F.col("n_outliers") / F.col("n_rows").cast("double"), 6),
        )
    )


def table_checksum(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Order-independent content checksum of a table — the migration /
    replication audit primitive: compute it on the source system and on
    the migrated copy (any engine with md5) and compare one row.

    Per-row digest = integer value of the first 8 md5 hex digits over the
    null-marked, unit-separated row rendering; table checksum = SUM of
    digests reduced mod 10^18 (the sum is commutative, hence
    partitioning- and order-independent; the digest sum accumulates in
    decimal so a 10^13-row table cannot overflow before the reduction).
    A single flipped byte anywhere changes the checksum with probability
    ~ 1 - 2^-32.

    Nulls are rendered as an explicit marker so (null, 'a') and
    ('a', null) differ; fields are separated by the 0x1f unit separator
    so ('ab', 'c') and ('a', 'bc') differ.

    One map-side-combined aggregate — the cheapest full-table scan
    possible; no shuffle beyond the single-row combine.
    """
    use = cols or df.columns
    rendered = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in use
        ],
    )
    digest = F.conv(F.substring(F.md5(rendered), 1, 8), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.agg(
        F.count("*").alias("n_rows"),
        (F.sum(digest) % F.lit(10**18).cast("decimal(38,0)"))
        .cast("long")
        .alias("checksum"),
    )


def weighted_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q: float = 0.5,
    out_col: str = "weighted_quantile",
) -> DataFrame:
    """Per-group weighted lower quantile (q=0.5 → weighted median): the
    smallest value whose running weight mass reaches ``q`` of the group's
    total — the estimator behind quantity-weighted price medians, token-
    weighted length cuts, and importance-weighted thresholds.

    Exactness: weights accumulate as DECIMAL(18,4) end-to-end (the
    ``exprs.dsum`` convention), so the crossing comparison sees identical
    numbers in Spark and the SQL oracle regardless of addition order.

    Plan shape (no single-partition-per-group stage): pre-agg ties to one
    row per (group, value); running mass via
    ``behavior.distributed_prefix_agg`` (range-partitioned local scans +
    broadcast cross-partition offsets); per-group totals are a
    |groups|-bounded aggregate broadcast back.  The crossing row satisfies
    ``cum − w < q·total ≤ cum`` — exactly one row per group.
    """
    from streaming_feature_store_spark.operators.behavior import (
        distributed_prefix_agg,
    )

    pa = df.groupBy(
        F.col(group_col), F.col(value_col)
    ).agg(
        F.sum(F.col(weight_col).cast("decimal(18,4)")).alias("_w")
    )
    cum = distributed_prefix_agg(
        pa, group_col, value_col, "_w", kind="sum", inclusive=True,
        out_col="_cum",
    )
    totals = pa.groupBy(group_col).agg(F.sum("_w").alias("_tot"))
    thresh = F.col("_tot").cast("double") * F.lit(float(q))
    return (
        cum.join(broadcast(totals), group_col)
        .filter(
            (F.col("_cum").cast("double") >= thresh)
            & ((F.col("_cum") - F.col("_w")).cast("double") < thresh)
        )
        .select(
            F.col(group_col),
            F.col(value_col).alias(out_col),
            F.col("_tot").cast("double").alias("total_weight"),
        )
    )


def pareto_frontier(
    df: DataFrame,
    group_col: str,
    cost_col: str,
    gain_col: str,
    id_cols: list[str],
) -> DataFrame:
    """Per-group Pareto frontier (2-D skyline): rows NOT strictly
    dominated — no other row in the group has strictly lower ``cost`` AND
    strictly higher ``gain``.  The price/performance shortlist query
    (cheapest parts per size tier, fastest configs per budget).

    The naive formulation is a per-group self-join (O(n²) pairs — the
    exact explosion the dedup family avoids).  The 2-D skyline instead
    reduces to one scan: a row is dominated iff the running MAX of
    ``gain`` over strictly-lower costs exceeds its own gain.  That prefix
    max runs on the (group, cost)-deduped pre-agg via
    ``behavior.distributed_prefix_agg`` (kind="max", exclusive) — no
    single-partition window, no self-join — and joins back to the id rows
    on the (group, cost) key.  Equal-cost rows dominate each other only
    via a strictly cheaper row, so within a cost tie every max-gain row
    can survive (standard strict-dominance semantics).
    """
    from streaming_feature_store_spark.operators.behavior import (
        distributed_prefix_agg,
    )

    pa = df.groupBy(F.col(group_col), F.col(cost_col)).agg(
        F.max(F.col(gain_col)).alias("_tier_best")
    )
    prev = distributed_prefix_agg(
        pa, group_col, cost_col, "_tier_best", kind="max",
        inclusive=False, out_col="_prev_best",
    ).drop("_tier_best")
    return (
        df.join(prev, [group_col, cost_col])
        .filter(
            F.col("_prev_best").isNull()
            | (F.col("_prev_best") <= F.col(gain_col))
        )
        .select(
            F.col(group_col), *[F.col(c) for c in id_cols],
            F.col(cost_col), F.col(gain_col),
        )
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 3,
) -> DataFrame:
    """l-diversity suppression — the privacy gate k-anonymity
    (``k_anonymize``) misses: a quasi-identifier group can contain ≥ k
    rows yet leak the sensitive attribute exactly when every row in it
    shares one sensitive value.  Keeps only rows whose QI group carries
    at least ``l_threshold`` DISTINCT sensitive values.

    Exact distinct per group via one (QI, sensitive) pre-aggregation
    (map-side combined — the distinct explosion never shuffles raw rows
    twice) followed by a QI-level count and a broadcast-eligible semi
    join of the surviving groups back onto the rows; AQE promotes the
    join when the group table is small, and the fact side is never
    re-sorted.  Emits the per-group ``sensitive_l`` alongside the kept
    rows so downstream release audits can bin by diversity.

    A NULL sensitive value does NOT count toward diversity (it is a
    missing measurement, not a real value an attacker could be told) —
    matching SQL ``COUNT(DISTINCT sensitive)``, which excludes NULLs;
    a ``.distinct()`` alone would treat NULL as a value and inflate l.
    """
    groups = (
        df.select(*quasi_cols, sensitive_col)
        .filter(F.col(sensitive_col).isNotNull())
        .distinct()
        .groupBy(*quasi_cols)
        .agg(F.count("*").alias("sensitive_l"))
        .filter(F.col("sensitive_l") >= l_threshold)
    )
    return df.join(groups, on=quasi_cols, how="inner")


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col,
    smooth: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per category of
    ``feature_col`` against a binary ``label_col`` (column or boolean
    Column expression) — the credit-risk-standard measure of how much a
    categorical feature separates good from bad outcomes, and the
    monotone encoding fed to scorecard models.

    Per category c:  WOE_c = ln( (bad_c/bad_tot) / (good_c/good_tot) ),
    IV contribution = (bad_frac − good_frac) · WOE_c; the feature-level
    IV (Σ contributions) rides along on every row so a single output
    answers both "how do I encode this" and "is this feature worth
    keeping" (rule of thumb: IV < 0.02 useless, > 0.5 suspicious).

    One conditional-aggregate pass groups to |categories| rows; the
    global totals and the IV sum are window aggregates OVER the tiny
    grouped frame (zero extra passes over the data — the only shuffle of
    fact rows is the groupBy, map-side combined).  Laplace smoothing
    (``smooth``, default 0.5) keeps zero-count cells finite and is
    applied identically in the SQL oracle; counts are exact integers so
    the double log arithmetic is engine-deterministic.
    """
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    g = df.groupBy(feature_col).agg(
        F.count(F.when(lbl, 1)).alias("n_bad"),
        F.count(F.when(~lbl, 1)).alias("n_good"),
    )
    w = Window.partitionBy()
    bad_tot = F.sum("n_bad").over(w)
    good_tot = F.sum("n_good").over(w)
    bad_frac = (F.col("n_bad") + F.lit(smooth)) / (
        bad_tot + F.lit(2 * smooth)
    )
    good_frac = (F.col("n_good") + F.lit(smooth)) / (
        good_tot + F.lit(2 * smooth)
    )
    woe = F.log(bad_frac / good_frac)
    iv_term = (bad_frac - good_frac) * woe
    out = g.select(
        feature_col,
        "n_bad",
        "n_good",
        F.round(woe, 6).alias("woe"),
        F.round(iv_term, 6).alias("iv_term"),
    ).withColumn(
        "iv_total",
        F.sum(F.round(iv_term, 6).cast("decimal(18,6)"))
        .over(w)
        .cast("double"),
    )
    return out


def erasure_purge(
    df: DataFrame, key_col: str, subjects: DataFrame, subject_col: str
) -> DataFrame:
    """Right-to-erasure purge: drop every row whose ``key_col`` appears
    in the subject request list — a broadcast LEFT ANTI join (erasure
    request volumes are human-generated, thousands-to-millions of keys:
    bounded, broadcastable; the fact side never shuffles)."""
    subj = subjects.select(F.col(subject_col).alias("_erase_k")).distinct()
    return df.join(
        broadcast(subj), df[key_col] == F.col("_erase_k"), "left_anti"
    )


def erasure_audit(
    tables: dict[str, tuple[DataFrame, str]],
    subjects: DataFrame,
    subject_col: str,
) -> DataFrame:
    """Right-to-erasure AUDIT across every table holding subject keys:
    per table, how many rows a purge of the request list would remove —
    the compliance evidence a deletion job must produce before and after
    running (the reference keeps per-entity Redis keys and would delete
    by key; a lakehouse needs the multi-table sweep this audits).

    One broadcast left join + one aggregate per table (fact sides never
    shuffle), unioned into a single report frame: (table_name,
    rows_total, rows_purged, rows_kept, purge_pct).  Duplicate subject
    keys are de-duplicated first so the hit flag never double-counts.
    """
    subj = (
        subjects.select(F.col(subject_col).alias("_erase_k"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    reports = []
    for name, (df, key_col) in tables.items():
        j = df.select(F.col(key_col).alias("_k")).join(
            broadcast(subj), F.col("_k") == F.col("_erase_k"), "left"
        )
        purged = F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
        reports.append(
            j.agg(
                F.count("*").alias("rows_total"),
                purged.alias("rows_purged"),
            ).select(
                F.lit(name).alias("table_name"),
                "rows_total",
                "rows_purged",
                (F.col("rows_total") - F.col("rows_purged")).alias(
                    "rows_kept"
                ),
                F.round(
                    F.col("rows_purged") / F.col("rows_total"), 6
                ).alias("purge_pct"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def referential_audit(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity audit across a warehouse: for each
    (name, child, fk_col, parent, pk_col) relation, count the child rows
    whose FK is NULL and the ones whose non-NULL FK has no parent
    (orphans) — the first data-quality gate any ingested snapshot must
    pass before joins downstream silently drop or fabricate rows.

    Per relation: one left-anti join child→parent (hash or broadcast —
    AQE promotes when the parent's PK projection is small) collapsed to
    one count, plus one conditional aggregate for totals; output is a
    |relations|-row frame unioned driver-side (bounded by the schema
    size, never data size).  No collect of data rows anywhere.
    """
    out = None
    for name, child, fk_col, parent, pk_col in pairs:
        fk = F.col(fk_col)
        totals = child.agg(
            F.count("*").alias("n_child"),
            F.count(F.when(fk.isNull(), 1)).alias("n_null_fk"),
        ).withColumn("relation", F.lit(name))
        orphans = (
            child.filter(fk.isNotNull())
            .join(
                parent.select(F.col(pk_col).alias("_pk")).distinct(),
                fk == F.col("_pk"),
                "left_anti",
            )
            .agg(F.count("*").alias("n_orphan"))
            .withColumn("relation", F.lit(name))
        )
        row = totals.join(orphans, "relation").select(
            "relation",
            "n_child",
            "n_null_fk",
            "n_orphan",
            F.round(
                F.col("n_orphan") / F.col("n_child"), 6
            ).alias("orphan_rate"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def label_leakage_screen(
    df: DataFrame,
    feature_cols: list[str],
    label_col,
    threshold: float = 0.5,
) -> DataFrame:
    """Target-leakage screen: point-biserial correlation of every numeric
    feature against a binary label, flagging |r| above ``threshold`` —
    the pre-training hygiene gate that catches a feature computed FROM
    the outcome (refund amount vs chargeback label) before it poisons a
    model with impossible offline metrics.

    One WIDE aggregate pass (6 conditional moments per feature, all
    map-side combined over the raw rows — no melt: exploding |features|×
    rows just to group them back costs a |features|× shuffle, measured
    6.9 → ~1 s at 6M×4 on q214), then the 1-row result pivots to one row
    per feature and Pearson/point-biserial r comes from the exact
    decimal moments (n, Σx, Σy, Σx², Σy², Σxy) — order-independent,
    closed form, SQL-oracle-exact.  Zero-variance features or labels
    yield NULL r (guarded), never a divide-by-zero.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    yv = lab.cast("int").cast("double")
    aggs = []
    for c in feature_cols:
        xv = F.col(c).cast("double")
        both = xv.isNotNull() & yv.isNotNull()
        x = F.when(both, xv)
        y = F.when(both, yv)
        aggs += [
            F.count(x).alias(f"n_{c}"),
            F.sum(x.cast("decimal(28,6)")).cast("double").alias(f"sx_{c}"),
            F.sum(y.cast("decimal(18,4)")).cast("double").alias(f"sy_{c}"),
            F.sum((x * x).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"sxx_{c}"),
            F.sum((y * y).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"syy_{c}"),
            F.sum((x * y).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"sxy_{c}"),
        ]
    wide = df.agg(*aggs)
    g = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(f"n_{c}").alias("n"),
                        F.col(f"sx_{c}").alias("_sx"),
                        F.col(f"sy_{c}").alias("_sy"),
                        F.col(f"sxx_{c}").alias("_sxx"),
                        F.col(f"syy_{c}").alias("_syy"),
                        F.col(f"sxy_{c}").alias("_sxy"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    n = F.col("n")
    sx, sy = F.col("_sx"), F.col("_sy")
    den2 = (n * F.col("_sxx") - sx * sx) * (n * F.col("_syy") - sy * sy)
    r = (n * F.col("_sxy") - sx * sy) / F.sqrt(F.when(den2 > 0, den2))
    return g.select(
        "feature",
        "n",
        F.round(r, 6).alias("r_pb"),
        F.coalesce(F.abs(r) > threshold, F.lit(False)).alias("flagged"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_threshold: float = 0.3,
) -> DataFrame:
    """t-closeness audit — the distributional privacy gate ABOVE
    l-diversity: a QI group can hold many distinct sensitive values yet
    still leak (e.g. 90 % one disease when the population is 1 %); the
    t-closeness criterion bounds the distance between each group's
    sensitive distribution and the global one.  For categorical
    attributes the standard distance is total variation
    TVD = ½·Σ_v |p_group(v) − p_global(v)|.

    Computed without materializing absent (group, value) cells: values
    missing from a group contribute p_global(v), so

        TVD = ½·(1 + Σ_{v present} (|p_g(v) − p(v)| − p(v)))

    which needs only the present (QI, value) count rows — one grouped
    aggregate each for (QI, value), QI, and value, the global value
    table broadcast back.  NULL sensitive values are excluded on both
    sides (the l-diversity convention).  Emits per group: size, TVD,
    and the pass flag TVD ≤ t.
    """
    base = df.filter(F.col(sensitive_col).isNotNull())
    gv = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("_cgv")
    )
    g = base.groupBy(*quasi_cols).agg(F.count("*").alias("_cg"))
    v = base.groupBy(sensitive_col).agg(F.count("*").alias("_cv"))
    n = base.agg(F.count("*").alias("_n"))
    joined = (
        gv.join(g, quasi_cols)
        .join(broadcast(v), sensitive_col)
        .crossJoin(broadcast(n))
        .select(
            *quasi_cols,
            F.col("_cg"),
            (F.col("_cgv") / F.col("_cg")).alias("_pg"),
            (F.col("_cv") / F.col("_n")).alias("_p"),
        )
    )
    term = (
        F.abs(F.col("_pg") - F.col("_p")) - F.col("_p")
    ).cast("decimal(38,12)")
    out = joined.groupBy(*quasi_cols, "_cg").agg(
        F.sum(term).cast("double").alias("_s")
    )
    tvd = 0.5 * (1.0 + F.col("_s"))
    return out.select(
        *quasi_cols,
        F.col("_cg").alias("group_rows"),
        F.round(tvd, 6).alias("tvd"),
        (tvd <= F.lit(t_threshold)).alias("t_close"),
    )


def distinct_index_merge(
    delta: DataFrame,
    index: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """Incremental exact-distinct cardinality against a persisted index —
    the third leg of the round-9 incremental family (dedup fingerprints:
    ``dedup.fingerprint_index_merge``; vectors: ``similarity.
    ivf_index_merge``; here: per-key entity sets).  The index is the
    DISTINCT (keys..., values...) rows seen so far; a daily delta merges
    without rescanning history, and the screen answers the two questions
    a 100 TB ingest actually asks: how many distinct entities does each
    key have NOW, and how many did TODAY add that were never seen before.

    Returns ``(report, updated_index)``:

    - ``report``: one row per key — ``n_distinct`` (after the merge) and
      ``n_new`` (value tuples first seen in this delta);
    - ``updated_index``: the index with the genuinely-new tuples
      appended.  New rows are found by null-safe anti-join, so the
      append stays duplicate-free BY CONSTRUCTION (no re-distinct over
      history) and re-merging the same delta is idempotent (n_new = 0).

    NULL-tuple discipline: SQL equi-joins never match NULLs, so a plain
    anti-join would re-add a (key, NULL) tuple on every ingest and
    inflate both the index and ``n_new`` forever; the null-safe (<=>)
    join keeps NULL-valued tuples idempotent like any other value.

    Scale shape: the delta's distinct pass is the only shuffle on new
    data; the anti-join broadcasts the (small) delta-distinct side and
    SCANS the index; the report aggregates |index| rows by key.  When
    only approximate totals are needed (no novelty screen), the
    mergeable-sketch twin is ``streaming.sketches.hll_partials_stream``
    — this exact form is for when "new entity" itself is the signal
    (fraud onboarding, first-seen devices, vocabulary growth).
    """
    import functools
    import operator

    cols = [*key_cols, *value_cols]
    delta_idx = delta.select(*cols).distinct()
    cond = functools.reduce(
        operator.and_,
        [delta_idx[c].eqNullSafe(index[c]) for c in cols],
    )
    new_vals = delta_idx.join(index, cond, "left_anti")
    updated = index.unionByName(new_vals)
    totals = updated.groupBy(*key_cols).agg(
        F.count("*").alias("n_distinct")
    )
    news = new_vals.groupBy(*key_cols).agg(F.count("*").alias("n_new"))
    report = totals.join(news, key_cols, "left").select(
        *key_cols,
        "n_distinct",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    return report, updated
