"""Round-7 batch-9 operators: band join, conformal threshold,
incremental partial-aggregate merge, WOE/IV.  Each pinned to a naive
Python recompute."""

import math

import pyspark.sql.functions as F


def test_band_join_inner_and_left(spark):
    from streaming_feature_store_spark.operators.enrich import band_join

    fact = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 19.99), (4, 20.0), (5, 99.0), (6, None)],
        "id long, v double",
    )
    bands = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0)],
        "band long, lo double, hi double",
    )
    inner = {
        r["id"]: r["band"]
        for r in band_join(fact, "v", bands, "lo", "hi").collect()
    }
    # half-open [lo, hi): 10.0 lands in band 1, 20.0 in band 2
    assert inner == {1: 0, 2: 1, 3: 1, 4: 2}
    left = band_join(fact, "v", bands, "lo", "hi", how="left").collect()
    assert len(left) == 6
    by_id = {r["id"]: r["band"] for r in left}
    assert by_id[5] is None and by_id[6] is None


def test_conformal_threshold_exact_order_statistic(spark):
    from streaming_feature_store_spark.ml.training import conformal_threshold

    rows = [("g", i, float(v)) for i, v in enumerate(
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3])]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    got = conformal_threshold(df, "grp", "score", "id", alpha=0.1).collect()
    assert len(got) == 1
    r = got[0]
    # n=10 -> rank = min(ceil(11*0.9), 10) = min(10, 10) = 10th smallest
    scores = sorted(v for _, _, v in rows)
    assert r["n_cal"] == 10 and r["q_hat"] == scores[9]

    # alpha=0.5 -> rank ceil(11*0.5)=6
    got2 = conformal_threshold(df, "grp", "score", "id", alpha=0.5).collect()
    assert got2[0]["q_hat"] == scores[5]


def test_conformal_coverage_guarantee(spark):
    """Empirical check of the conformal property: with the threshold fit
    on a calibration half, >= (1-alpha) of exchangeable fresh points
    score below it (up to the finite-sample +1/(n+1) slack)."""
    from streaming_feature_store_spark.ml.training import conformal_threshold

    import random

    rng = random.Random(7)
    vals = [rng.gauss(0, 1) for _ in range(400)]
    cal, fresh = vals[:200], vals[200:]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(cal)],
        "grp string, id long, score double",
    )
    q = conformal_threshold(df, "grp", "score", "id", alpha=0.1).collect()[0][
        "q_hat"
    ]
    covered = sum(1 for v in fresh if v <= q) / len(fresh)
    assert covered >= 0.85  # 1-alpha=0.9 with sampling slack


def test_partial_aggregate_merge_equals_direct(spark):
    from streaming_feature_store_spark.operators.incremental import (
        merge_partials,
        partial_aggregate,
    )

    import random

    rng = random.Random(11)
    rows = [
        (f"g{i % 3}", i % 7, round(rng.uniform(-100, 100), 4))
        for i in range(500)
    ] + [("g0", 0, None)]
    df = spark.createDataFrame(rows, "grp string, shard int, v double")
    merged = {
        r["grp"]: r
        for r in merge_partials(
            partial_aggregate(df, ["grp"], "shard", "v"), ["grp"]
        ).collect()
    }
    for g in ["g0", "g1", "g2"]:
        vals = [v for gg, _, v in rows if gg == g and v is not None]
        n = len(vals)
        s = sum(vals)
        mean = s / n
        var = sum((x - mean) ** 2 for x in vals) / (n - 1)
        r = merged[g]
        assert r["n_rows"] == n
        assert math.isclose(r["value_sum"], round(s, 4), abs_tol=1e-6)
        assert math.isclose(r["value_mean"], mean, rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(r["value_var"], var, rel_tol=1e-6, abs_tol=1e-3)
        assert r["vmin"] == min(vals) and r["vmax"] == max(vals)
        assert r["n_shards"] == len({sh for gg, sh, _ in rows if gg == g})


def test_partial_merge_is_shard_partition_invariant(spark):
    """The whole point of mergeable states: re-sharding the same rows
    differently yields the identical merged answer."""
    from streaming_feature_store_spark.operators.incremental import (
        merge_partials,
        partial_aggregate,
    )

    rows = [("g", i, float(i * i % 97)) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, i long, v double")
    a = merge_partials(
        partial_aggregate(df, ["grp"], F.col("i") % 5, "v"), ["grp"]
    ).drop("n_shards").collect()
    b = merge_partials(
        partial_aggregate(df, ["grp"], F.col("i") % 13, "v"), ["grp"]
    ).drop("n_shards").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_woe_iv_matches_hand_computation(spark):
    from streaming_feature_store_spark.operators.profile import woe_iv

    # category A: 3 bad / 1 good; B: 1 bad / 5 good
    rows = [("A", True)] * 3 + [("A", False)] + [("B", True)] + [
        ("B", False)
    ] * 5
    df = spark.createDataFrame(rows, "cat string, bad boolean")
    got = {r["cat"]: r for r in woe_iv(df, "cat", "bad").collect()}

    bad_tot, good_tot = 4, 6

    def expect(nb, ng):
        bf = (nb + 0.5) / (bad_tot + 1.0)
        gf = (ng + 0.5) / (good_tot + 1.0)
        woe = math.log(bf / gf)
        return round(woe, 6), round((bf - gf) * woe, 6)

    wa, iva = expect(3, 1)
    wb, ivb = expect(1, 5)
    assert got["A"]["woe"] == wa and got["A"]["iv_term"] == iva
    assert got["B"]["woe"] == wb and got["B"]["iv_term"] == ivb
    assert math.isclose(got["A"]["iv_total"], iva + ivb, abs_tol=1e-9)
    assert got["A"]["iv_total"] == got["B"]["iv_total"]


def test_woe_iv_smoothing_keeps_zero_cells_finite(spark):
    from streaming_feature_store_spark.operators.profile import woe_iv

    rows = [("A", True)] * 4 + [("B", False)] * 4
    df = spark.createDataFrame(rows, "cat string, bad boolean")
    for r in woe_iv(df, "cat", "bad").collect():
        assert math.isfinite(r["woe"]) and math.isfinite(r["iv_term"])
