"""Round-7 batch-8 operators: replicated skew join, Welch's t-test,
power-iteration step, cumulative distinct, l-diversity, Neyman
allocation.  Each pinned to a naive/closed-form recompute."""

import math

import pyspark.sql.functions as F
import pytest


def test_replicated_skew_join_equals_plain_join(spark):
    from streaming_feature_store_spark.operators.skew import (
        replicated_skew_join,
    )

    fact = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(200)]
        + [(200 + i, 0, 1.0) for i in range(300)],  # hot key 0
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (7, "never")], "dk long, tag string"
    )
    got = (
        replicated_skew_join(fact, "k", dim, "dk", salt_col="row_id",
                             salt_buckets=8)
        .groupBy("tag")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    want = (
        fact.join(dim, fact["k"] == dim["dk"])
        .groupBy("tag")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_replicated_skew_join_left_outer_keeps_unmatched(spark):
    from streaming_feature_store_spark.operators.skew import (
        replicated_skew_join,
    )

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(10, "x"), (20, "y")], "dk long, tag string")
    rows = replicated_skew_join(
        fact, "k", dim, "dk", salt_col="row_id", salt_buckets=4, how="left"
    ).collect()
    assert len(rows) == 3
    tags = {r["k"]: r["tag"] for r in rows}
    assert tags[99] is None and tags[10] == "x"


@pytest.mark.slow
def test_welch_ttest_matches_closed_form(spark):
    from streaming_feature_store_spark.operators.drift import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 2.5, 3.5]
    df = spark.createDataFrame(
        [("g", "A", x) for x in a] + [("g", "B", x) for x in b],
        "grp string, variant string, value double",
    )
    row = welch_ttest(df, "grp", "variant", "value", "A", "B").first()
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["n_a"] == 5 and row["n_b"] == 3
    assert row["t_stat"] == pytest.approx(round(t, 4))
    assert row["df_welch"] == pytest.approx(round(dof, 2))
    assert row["significant"] == (abs(t) > 1.96)


def test_welch_ttest_null_when_arm_degenerate(spark):
    from streaming_feature_store_spark.operators.drift import welch_ttest

    df = spark.createDataFrame(
        [("g", "A", 1.0), ("g", "A", 2.0), ("g", "B", 5.0)],
        "grp string, variant string, value double",
    )
    row = welch_ttest(df, "grp", "variant", "value", "A", "B").first()
    assert row["t_stat"] is None and row["significant"] is None


def test_power_iteration_step_unit_norm_and_rayleigh_gain(spark):
    import numpy as np

    from streaming_feature_store_spark.operators.similarity import (
        power_iteration_step,
    )

    rng = np.random.default_rng(7)
    d, n = 8, 60
    base = rng.normal(size=d)
    X = rng.normal(size=(n, d)) * 0.3 + np.outer(
        rng.normal(size=n), base
    )  # dominant direction ≈ base
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    out = power_iteration_step(emb, "embedding", dim=d).collect()
    u = np.zeros(d)
    for r in out:
        u[r["dim_idx"]] = r["component"]
    assert np.linalg.norm(u) == pytest.approx(1.0, abs=1e-4)
    G = X.T @ X
    v0 = np.ones(d) / math.sqrt(d)
    # one power step must not decrease the Rayleigh quotient
    assert u @ G @ u >= v0 @ G @ v0 - 1e-6
    # and must match the numpy recompute of the same map
    ref = G @ v0
    ref = ref / np.linalg.norm(ref)
    assert np.abs(u - ref).max() < 1e-3


def test_cumulative_distinct_matches_pandas_replay(spark):
    from streaming_feature_store_spark.operators.windows import (
        cumulative_distinct,
    )

    rows = [
        (1, 1, "a"), (2, 1, "b"), (3, 1, "a"), (4, 1, "c"), (5, 1, "b"),
        (6, 2, "x"), (7, 2, "x"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user long, et string")
    got = {
        r["event_id"]: r["distinct_so_far"]
        for r in cumulative_distinct(
            df, "user", "event_id", "et", "event_id"
        ).collect()
    }
    seen, want = {}, {}
    for eid, u, et in rows:
        seen.setdefault(u, set()).add(et)
        want[eid] = len(seen[u])
    assert got == want


def test_l_diversity_groups_meet_threshold(spark):
    from streaming_feature_store_spark.operators.profile import l_diversity

    df = spark.createDataFrame(
        [("g1", s) for s in ["a", "b", "c", "a"]]
        + [("g2", s) for s in ["a", "a", "a"]]
        + [("g3", s) for s in ["a", "b"]],
        "qi string, sens string",
    )
    out = l_diversity(df, ["qi"], "sens", l_threshold=3).collect()
    assert {r["qi"] for r in out} == {"g1"}
    assert all(r["sensitive_l"] == 3 for r in out)
    assert len(out) == 4  # all g1 rows kept


def test_neyman_allocation_sums_to_budget_and_orders_by_nh_sh(spark):
    from streaming_feature_store_spark.operators.curation import (
        neyman_allocation,
    )

    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for name, n, scale in [("wide", 400, 50.0), ("mid", 400, 5.0),
                           ("tight", 400, 0.5), ("single", 1, 1.0)]:
        vals = rng.normal(0, scale, size=n)
        rows += [(name, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "stratum string, value double")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "stratum", "value", budget=1000).collect()}
    assert sum(r["alloc"] for r in out.values()) == 1000
    # equal sizes → allocation ordered by stddev
    assert out["wide"]["alloc"] > out["mid"]["alloc"] > out["tight"]["alloc"]
    # singleton stratum: undefined stddev → zero weight
    assert out["single"]["alloc"] == 0


def test_replicated_skew_join_rejects_dim_preserving_modes(spark):
    """r7 advice: right/full outer would emit each unmatched dim row once
    per salt bucket — the operator must refuse, not silently x16."""
    import pytest as _pytest

    from streaming_feature_store_spark.operators.skew import (
        replicated_skew_join,
    )

    fact = spark.createDataFrame([(1, 10)], "k long, row_id long")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "dk long, attr string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with _pytest.raises(ValueError, match="unsound"):
            replicated_skew_join(
                fact, "k", dim, "dk", salt_col="row_id", how=how
            )
    # fact-side semi/anti are sound (never duplicate, every key in every
    # salt bucket) and must keep working
    semi = replicated_skew_join(
        fact, "k", dim, "dk", salt_col="row_id", how="left_semi"
    ).collect()
    assert len(semi) == 1 and semi[0]["k"] == 1


def test_cumulative_distinct_skips_null_values(spark):
    """NULL is a missing measurement, not a distinct value — matching
    SQL COUNT(DISTINCT x) OVER semantics (r7 advice)."""
    from streaming_feature_store_spark.operators.windows import (
        cumulative_distinct,
    )

    rows = [
        (1, 1, None), (2, 1, "a"), (3, 1, None), (4, 1, "b"), (5, 1, "a"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user long, et string")
    got = {
        r["event_id"]: r["distinct_so_far"]
        for r in cumulative_distinct(
            df, "user", "event_id", "et", "event_id"
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2}


def test_l_diversity_null_sensitive_not_counted(spark):
    """A NULL sensitive value must not inflate diversity: a group with
    {a, a, NULL} has l = 1, not 2 (r7 advice)."""
    from streaming_feature_store_spark.operators.profile import l_diversity

    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", None),
         ("g2", "a"), ("g2", "b"), ("g2", None)],
        "qi string, sens string",
    )
    out = l_diversity(df, ["qi"], "sens", l_threshold=2).collect()
    assert {r["qi"] for r in out} == {"g2"}
    assert all(r["sensitive_l"] == 2 for r in out)
