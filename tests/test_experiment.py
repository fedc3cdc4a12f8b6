"""Experimentation operators (operators/experiment.py) pinned to
scipy-free closed-form recomputes: grouped z-test, BH-FDR step-up,
diff-in-diff, delta-method ratio variance."""

import math

import pyspark.sql.functions as F


def _norm_sf2(z):
    return math.erfc(abs(z) / math.sqrt(2.0))


def _hill_t_sf2(t, nu):
    """Python twin of drift.t_sf2 (Hill ACM-395 normalizing transform)."""
    y = t * t / nu
    y = math.log(1.0 + y) if y > 1e-6 else y
    a = nu - 0.5
    b = 48.0 * a * a
    y = a * y
    z = (
        ((((-0.4 * y - 3.3) * y - 24.0) * y - 85.5)
         / (0.8 * y * y + 100.0 + b) + y + 3.0) / b + 1.0
    ) * math.sqrt(y)
    return math.erfc(z / math.sqrt(2.0))


def test_grouped_ztest_matches_closed_form(spark):
    from streaming_feature_store_spark.operators.experiment import (
        grouped_ztest,
    )

    a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    b = [4.0, 5.0, 6.0, 7.0, 8.0, 15.0]
    rows = [("g", False, v) for v in a] + [("g", True, v) for v in b]
    df = spark.createDataFrame(rows, "grp string, trt boolean, v double")
    r = grouped_ztest(df, ["grp"], "trt", "v").collect()[0]

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    se2 = va / na + vb / nb
    z = (mb - ma) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["mean_a"] == round(ma, 4) and r["mean_b"] == round(mb, 4)
    assert math.isclose(r["z_stat"], round(z, 4), abs_tol=1e-9)
    # six-per-arm is a small-arm group: the p-value must come from the
    # Student-t tail at the Welch df, not the over-rejecting normal
    assert r["small_arm"] is True
    assert math.isclose(r["p_value"], _hill_t_sf2(abs(z), dof), abs_tol=1e-5)
    assert r["p_value"] > _norm_sf2(z)  # t tail is strictly fatter

    # dispatch off -> the old large-sample normal readout
    r0 = grouped_ztest(
        df, ["grp"], "trt", "v", small_arm_n=0
    ).collect()[0]
    assert r0["small_arm"] is False
    assert math.isclose(r0["p_value"], _norm_sf2(z), abs_tol=1e-5)


def test_grouped_ztest_degenerate_arm_yields_null(spark):
    from streaming_feature_store_spark.operators.experiment import (
        grouped_ztest,
    )

    rows = [("g", False, 1.0), ("g", False, 2.0), ("g", True, 3.0)]
    df = spark.createDataFrame(rows, "grp string, trt boolean, v double")
    r = grouped_ztest(df, ["grp"], "trt", "v").collect()[0]
    assert r["z_stat"] is None and r["p_value"] is None


def test_bh_fdr_textbook_example(spark):
    from streaming_feature_store_spark.operators.experiment import bh_fdr

    # classic example: m=10, alpha=0.05 -> largest k with p_(k) <= k*0.005
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212,
          0.36]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], "hyp string, p double"
    )
    got = {r["hyp"]: r for r in bh_fdr(df, "p", ["hyp"]).collect()}
    # thresholds: 0.005,0.010,0.015,0.020,...  p_(4)=0.041>0.020 but
    # step-up takes the LARGEST passing rank: p_(2)=0.008<=0.010 -> k*=2
    rejected = {h for h, r in got.items() if r["rejected"]}
    assert rejected == {"h0", "h1"}
    # adjusted p: p_adj_(1) = min over suffix of m*p_j/j
    assert got["h0"]["p_adj"] == round(min(
        10 * p / (i + 1) for i, p in enumerate(ps)), 6)
    # monotone non-decreasing in rank order
    adj_in_rank_order = [r["p_adj"] for r in
                         sorted(got.values(), key=lambda r: r["p_rank"])]
    assert adj_in_rank_order == sorted(adj_in_rank_order)
    assert max(adj_in_rank_order) <= 1.0


def test_bh_fdr_null_pvalues_never_rejected(spark):
    from streaming_feature_store_spark.operators.experiment import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.001), ("b", None), ("c", 0.9)], "hyp string, p double"
    )
    got = {r["hyp"]: r for r in bh_fdr(df, "p", ["hyp"]).collect()}
    assert got["b"]["rejected"] is False and got["b"]["p_adj"] is None
    # m counts only real hypotheses (2, not 3)
    assert got["a"]["rejected"] is True  # 0.001 <= 1*0.05/2
    assert got["b"]["p_rank"] == 3  # nulls sort last


def test_diff_in_diff_recovers_planted_effect(spark):
    from streaming_feature_store_spark.operators.experiment import (
        diff_in_diff,
    )

    import random

    rng = random.Random(3)
    rows = []
    for trt in (False, True):
        for post in (False, True):
            base = 10.0 + (2.0 if trt else 0.0) + (1.0 if post else 0.0)
            lift = 5.0 if (trt and post) else 0.0
            for _ in range(200):
                rows.append(
                    ("g", trt, post, base + lift + rng.gauss(0, 1.0))
                )
    df = spark.createDataFrame(
        rows, "grp string, trt boolean, post boolean, v double"
    )
    r = diff_in_diff(df, ["grp"], "trt", "post", "v").collect()[0]
    assert abs(r["did"] - 5.0) < 0.5
    assert r["p_value"] < 1e-4
    assert r["n_t_post"] == 200

    # hand-check the double difference from the cell means it reports
    dd = (r["mean_t_post"] - r["mean_t_pre"]) - (
        r["mean_c_post"] - r["mean_c_pre"]
    )
    assert math.isclose(r["did"], dd, abs_tol=2e-4)  # 4-dp rounding


def test_ratio_metric_delta_matches_numpy_formula(spark):
    from streaming_feature_store_spark.operators.experiment import (
        ratio_metric_delta,
    )

    import random

    rng = random.Random(5)
    # 50 users, each with 1-8 rows of (value, 1)
    rows = []
    per_user = {}
    for u in range(50):
        k = rng.randint(1, 8)
        vals = [round(rng.uniform(0, 20), 4) for _ in range(k)]
        per_user[u] = (sum(vals), k)
        rows += [("g", u, v) for v in vals]
    df = spark.createDataFrame(rows, "grp string, uid long, v double")
    r = ratio_metric_delta(df, "uid", ["grp"], "v", F.lit(1.0)).collect()[0]

    xs = [x for x, _ in per_user.values()]
    ys = [float(y) for _, y in per_user.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    ratio = sx / sy
    mx, my = sx / n, sy / n
    vxx = sum((x - mx) ** 2 for x in xs) / (n - 1)
    vyy = sum((y - my) ** 2 for y in ys) / (n - 1)
    vxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
    var_r = (vxx - 2 * ratio * vxy + ratio**2 * vyy) / (n * my * my)
    se = math.sqrt(var_r)
    assert r["n_units"] == n
    assert math.isclose(r["ratio"], ratio, abs_tol=1e-6)
    assert math.isclose(r["se"], se, rel_tol=1e-4)
    assert math.isclose(r["ci_lo"], ratio - 1.96 * se, abs_tol=1e-3)


def test_ratio_metric_clustered_se_exceeds_iid_when_correlated(spark):
    """The reason the operator exists: when users with many events also
    have high per-event values, rows are positively correlated within
    units and the naive i.i.d. SE understates uncertainty."""
    from streaming_feature_store_spark.operators.experiment import (
        ratio_metric_delta,
    )

    import random

    rng = random.Random(9)
    rows = []
    flat = []
    for u in range(60):
        heavy = u % 2 == 0
        k = 8 if heavy else 1
        mu = 20.0 if heavy else 1.0
        for _ in range(k):
            v = mu + rng.gauss(0, 0.5)
            rows.append(("g", u, v))
            flat.append(v)
    df = spark.createDataFrame(rows, "grp string, uid long, v double")
    se_cluster = ratio_metric_delta(
        df, "uid", ["grp"], "v", F.lit(1.0)
    ).collect()[0]["se"]
    n = len(flat)
    m = sum(flat) / n
    iid_se = math.sqrt(
        sum((x - m) ** 2 for x in flat) / (n - 1) / n
    )
    assert se_cluster > 1.2 * iid_se


def test_uplift_deciles_planted_uplift_in_top_bucket(spark):
    from streaming_feature_store_spark.operators.experiment import (
        uplift_deciles,
    )

    # score in [0, 100); response depends on treatment ONLY for the top
    # half of scores -> uplift concentrates in the upper buckets
    rows = []
    rid = 0
    for s in range(100):
        for trt in (False, True):
            for _ in range(5):
                resp = 1 if (trt and s >= 50) else 0
                rows.append((rid, float(s), trt, resp))
                rid += 1
    df = spark.createDataFrame(
        rows, "rid long, score double, trt boolean, resp int"
    )
    got = {
        r["bucket"]: r
        for r in uplift_deciles(
            df, "trt", "score", F.col("resp") == 1, ["rid"], n_buckets=4
        ).collect()
    }
    # buckets 1-2 (low scores): zero uplift; buckets 3-4: full uplift
    assert got[1]["uplift"] == 0.0 and got[2]["uplift"] == 0.0
    assert got[3]["uplift"] == 1.0 and got[4]["uplift"] == 1.0
    # balanced arms: qini term per top bucket = resp_t - resp_c*n_t/n_c
    assert got[4]["qini_cum"] == got[4]["resp_t"]  # resp_c = 0
    assert got[1]["qini_cum"] == got[4]["resp_t"] + got[3]["resp_t"]
    # exact ntile: equal bucket sizes
    sizes = {b: r["n_t"] + r["n_c"] for b, r in got.items()}
    assert set(sizes.values()) == {250}


def test_cuped_reduces_variance_and_keeps_effect(spark):
    from streaming_feature_store_spark.operators.experiment import (
        cuped_adjusted_effect,
    )

    import random

    rng = random.Random(21)
    # per-user baseline spend X; post metric Y = X + noise + effect(trt)
    rows = []
    for u in range(400):
        trt = u % 2 == 1
        x = rng.uniform(10, 100)
        y = x + rng.gauss(0, 2.0) + (5.0 if trt else 0.0)
        rows.append(("g", u, trt, x, y))
    df = spark.createDataFrame(
        rows, "grp string, uid long, trt boolean, x double, y double"
    )
    r = cuped_adjusted_effect(
        df, ["grp"], "uid", "trt", "x", "y"
    ).collect()[0]
    # unbiased effect, theta ~ 1 (Y tracks X 1:1), big variance cut
    assert abs(r["adj_effect"] - 5.0) < 0.6
    assert abs(r["theta"] - 1.0) < 0.1
    assert r["se_adj"] < 0.3 * r["se_raw"]
    assert r["var_reduction"] > 0.9
    assert r["p_value"] < 1e-6


def test_cuped_uncorrelated_covariate_is_harmless(spark):
    from streaming_feature_store_spark.operators.experiment import (
        cuped_adjusted_effect,
    )

    import random

    rng = random.Random(22)
    rows = [
        ("g", u, u % 2 == 1, rng.uniform(0, 1), rng.gauss(10, 1))
        for u in range(300)
    ]
    df = spark.createDataFrame(
        rows, "grp string, uid long, trt boolean, x double, y double"
    )
    r = cuped_adjusted_effect(
        df, ["grp"], "uid", "trt", "x", "y"
    ).collect()[0]
    # theta ~ 0: adjusted and raw SEs agree, no fake variance reduction
    assert abs(r["theta"]) < 0.5
    assert abs(r["var_reduction"]) < 0.05


def test_mde_matches_closed_form(spark):
    from streaming_feature_store_spark.operators.experiment import (
        minimum_detectable_effect,
    )

    a = [10.0, 12.0, 11.0, 9.0, 13.0, 10.5]
    b = [10.0, 11.5, 12.5, 9.5, 12.0]
    rows = [("g", False, v) for v in a] + [("g", True, v) for v in b]
    df = spark.createDataFrame(rows, "grp string, trt boolean, v double")
    r = minimum_detectable_effect(df, ["grp"], "trt", "v").collect()[0]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    mde = (1.96 + 0.8416) * math.sqrt(var(a) / len(a) + var(b) / len(b))
    assert math.isclose(r["mde_abs"], round(mde, 4), abs_tol=1e-9)
    assert r["mean_control"] == round(sum(a) / len(a), 4)
    assert math.isclose(
        r["mde_rel"], mde / (sum(a) / len(a)), abs_tol=1e-4
    )


def test_srm_check_balanced_and_broken_splits(spark):
    from streaming_feature_store_spark.operators.experiment import srm_check

    # balanced: 500/500 units; broken: 650/350 (massive SRM)
    rows = []
    for u in range(1000):
        rows.append(("ok", u, u % 2 == 1))
    for u in range(1000):
        rows.append(("broken", u, u % 100 < 35))  # 35% treated
    df = spark.createDataFrame(rows, "grp string, uid long, trt boolean")
    got = {r["grp"]: r for r in
           srm_check(df, ["grp"], "trt", unit_col="uid").collect()}
    assert got["ok"]["srm_detected"] is False
    assert got["ok"]["share_b"] == 0.5
    assert got["broken"]["srm_detected"] is True
    assert got["broken"]["p_value"] < 1e-6

    # z matches the closed form for the broken split
    import math
    n, nb = 1000, 350
    z = (nb - n * 0.5) / math.sqrt(n * 0.25)
    assert math.isclose(got["broken"]["z_stat"], round(z, 4), abs_tol=1e-9)


def test_srm_unit_counting_ignores_row_weight(spark):
    """Per-unit assignment means a heavy user must count once — row
    counting would alarm on a perfectly fair split."""
    from streaming_feature_store_spark.operators.experiment import srm_check

    rows = [("g", 1, False)] * 500 + [("g", 2, True)]  # fair: 1 unit each
    df = spark.createDataFrame(rows, "grp string, uid long, trt boolean")
    r = srm_check(df, ["grp"], "trt", unit_col="uid").collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 1 and r["srm_detected"] is False


def test_uplift_deciles_null_scores_bucket_last(spark):
    """NULL scores must sort NULLS LAST (DuckDB NTILE's default) so the
    bucket assignment is cross-engine deterministic without relying on
    the caller pre-filtering NULLs (r7 advice)."""
    from streaming_feature_store_spark.operators.experiment import (
        uplift_deciles,
    )

    rows = [
        (i, float(i) if i < 8 else None, i % 2 == 0, 1 if i % 3 == 0 else 0)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "rid long, score double, trt boolean, resp int"
    )
    out = uplift_deciles(
        df, "trt", "score", "resp", ["rid"], n_buckets=5
    ).collect()
    # 10 rows -> 2 per bucket; the two NULL scores (rid 8, 9) must land
    # in the LAST bucket (5), never bucket 1
    by_bucket = {r["bucket"]: (r["n_t"], r["n_c"]) for r in out}
    assert set(by_bucket) == {1, 2, 3, 4, 5}
    # rid 8 (trt) and rid 9 (control) are the only NULL-score rows
    assert by_bucket[5] == (1, 1)
