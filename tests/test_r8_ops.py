"""Round-8 operator batch: blocked edit-distance dedup, lag
autocorrelation, Beta-posterior bandit readout, mSPRT always-valid
p-values, referential-integrity audit — each pinned to a naive Python
replay or the closed form it implements."""

import math

import pyspark.sql.functions as F
import pytest


def test_edit_distance_near_dups_matches_naive(spark):
    from streaming_feature_store_spark.operators.dedup import (
        edit_distance_near_dups,
    )

    rows = [
        (1, "b1", "color"), (2, "b1", "colour"), (3, "b1", "colander"),
        (4, "b1", "collar"), (5, "b2", "color"), (6, "b2", "colou"),
        (7, "b2", "entirely different"),
    ]
    df = spark.createDataFrame(rows, "id long, blk string, txt string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_near_dups(
            df, "id", "txt", ["blk"], max_dist=2
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {}
    for i, (ia, ba, ta) in enumerate(rows):
        for ib, bb, tb in rows[i + 1:]:
            if ba == bb and ia < ib and lev(ta, tb) <= 2:
                want[(ia, ib)] = lev(ta, tb)
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1  # color/colour
    assert (1, 5) not in got  # cross-block pair never formed


def test_edit_distance_near_dups_guards(spark):
    from streaming_feature_store_spark.operators.dedup import (
        edit_distance_near_dups,
    )

    df = spark.createDataFrame(
        [(i, "b", "same text") for i in range(20)],
        "id long, blk string, txt string",
    )
    with pytest.raises(ValueError, match="max_block_rows"):
        edit_distance_near_dups(
            df, "id", "txt", ["blk"], max_dist=2, max_block_rows=10
        )
    with pytest.raises(ValueError, match="length_band"):
        edit_distance_near_dups(
            df, "id", "txt", ["blk"], max_dist=5, length_band=3
        )
    # length banding is lossless AND duplicate-free: identical strings
    # all land in one band yet each pair is emitted exactly once
    out = edit_distance_near_dups(
        df, "id", "txt", ["blk"], max_dist=2, length_band=4,
        max_block_rows=None,
    )
    assert out.count() == 20 * 19 // 2

    # pairs whose lengths straddle a band boundary must still be found
    # (len 3 -> band 0, len 4/5 -> band 1 at width 4)
    edge = spark.createDataFrame(
        [(1, "b", "abc"), (2, "b", "abcd"), (3, "b", "abcde")],
        "id long, blk string, txt string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_near_dups(
            edge, "id", "txt", ["blk"], max_dist=2, length_band=2
        ).collect()
    }
    assert pairs == {(1, 2): 1, (1, 3): 2, (2, 3): 1}


def test_lag_autocorr_matches_numpy(spark):
    import numpy as np

    from streaming_feature_store_spark.operators.windows import lag_autocorr

    rng = np.random.RandomState(7)
    # AR(1)-ish series per user, all in one group
    rows = []
    series = []
    for u in range(4):
        v = 0.0
        vals = []
        for i in range(50):
            v = 0.7 * v + rng.uniform(-1, 1)
            vals.append(round(v, 4))
            rows.append((u, i, "g", vals[-1]))
        series.append(vals)
    df = spark.createDataFrame(rows, "u long, i long, grp string, v double")
    r = lag_autocorr(df, "u", "i", "v", "grp", "i", lag=1).collect()[0]
    xs, ys = [], []
    for vals in series:
        xs += vals[1:]
        ys += vals[:-1]
    want = np.corrcoef(xs, ys)[0, 1]
    assert r["n_pairs"] == 4 * 49
    assert abs(r["autocorr_lag1"] - want) < 1e-4
    assert r["autocorr_lag1"] > 0.4  # the planted stickiness

    # constant series: zero variance -> NULL, not a crash / clamp
    const = spark.createDataFrame(
        [(0, i, "g", 5.0) for i in range(10)],
        "u long, i long, grp string, v double",
    )
    rc = lag_autocorr(const, "u", "i", "v", "grp", "i").collect()[0]
    assert rc["autocorr_lag1"] is None


def test_beta_posterior_readout_closed_form(spark):
    from streaming_feature_store_spark.operators.experiment import (
        beta_posterior_readout,
    )

    rows = (
        [("a", True)] * 30 + [("a", False)] * 70
        + [("b", True)] * 2 + [("b", None)] * 5
    )
    df = spark.createDataFrame(rows, "arm string, ok boolean")
    got = {
        r["arm"]: r
        for r in beta_posterior_readout(df, ["arm"], "ok").collect()
    }
    # arm a: s=30, n=100 -> mean (1+30)/(2+100)
    mean_a = 31 / 102
    sd_a = math.sqrt(mean_a * (1 - mean_a) / 103)
    assert got["a"]["n_trials"] == 100 and got["a"]["n_success"] == 30
    assert got["a"]["post_mean"] == round(mean_a, 6)
    assert got["a"]["post_sd"] == round(sd_a, 6)
    assert got["a"]["cred_lo"] == round(mean_a - 1.96 * sd_a, 6)
    # arm b: NULL outcomes are neither trial nor success
    assert got["b"]["n_trials"] == 2 and got["b"]["n_success"] == 2
    assert got["b"]["cred_hi"] <= 1.0


def test_always_valid_pvalue_detects_effect_and_nulls_degenerate(spark):
    import random

    from streaming_feature_store_spark.operators.experiment import (
        always_valid_pvalue,
    )

    rng = random.Random(11)
    rows = []
    for i in range(2000):
        trt = i % 2 == 1
        rows.append(("fx", trt, rng.gauss(5.0 if trt else 1.0, 1.0)))
        rows.append(("null", trt, rng.gauss(1.0, 1.0)))
    rows += [("thin", False, 1.0), ("thin", True, 2.0)]
    df = spark.createDataFrame(rows, "grp string, trt boolean, v double")
    got = {
        r["grp"]: r
        for r in always_valid_pvalue(df, ["grp"], "trt", "v").collect()
    }
    assert got["fx"]["p_always_valid"] < 1e-6  # planted 4-sigma effect
    assert got["null"]["p_always_valid"] > 0.05  # no effect: no rejection
    assert got["thin"]["p_always_valid"] is None  # n=1 arms: NULL

    # closed-form replay for the null group
    import statistics

    a = [v for g, t, v in rows if g == "null" and not t]
    b = [v for g, t, v in rows if g == "null" and t]
    va, vb = statistics.variance(a), statistics.variance(b)
    theta = statistics.mean(b) - statistics.mean(a)
    V = va / len(a) + vb / len(b)
    lam = 0.5 * math.log(V / (V + 1.0)) + theta * theta / (2 * V * (V + 1.0))
    # decimal-cast inputs shift moments at the 4th dp; compare loosely
    assert abs(got["null"]["p_always_valid"] - min(1.0, math.exp(-lam))) < 1e-3


def test_referential_audit_counts_planted_orphans(spark):
    from streaming_feature_store_spark.operators.profile import (
        referential_audit,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = referential_audit([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert r["relation"] == "c->p"
    assert r["n_child"] == 5
    assert r["n_null_fk"] == 1
    assert r["n_orphan"] == 1  # fk=99
    assert r["orphan_rate"] == 0.2


def test_bigram_lm_doclogprob_matches_replay(spark):
    from streaming_feature_store_spark.operators.text import (
        bigram_lm_doclogprob,
    )

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "dog runs fast dog runs"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_doclogprob(df).collect()
    }

    toks = {d: t.split() for d, t in docs}
    from collections import Counter

    uni = Counter(w for t in toks.values() for w in t)
    bi = Counter(
        (t[i], t[i + 1]) for t in toks.values() for i in range(len(t) - 1)
    )
    V = len(uni)
    for d, t in toks.items():
        lps = [
            math.log((bi[(t[i], t[i + 1])] + 0.5) / (uni[t[i]] + 0.5 * V))
            for i in range(len(t) - 1)
        ]
        assert got[d][0] == len(lps)
        assert abs(got[d][1] - sum(lps) / len(lps)) < 1e-6
    # the formulaic doc (repeated high-count bigrams) scores higher than
    # a doc of the same bigrams seen once... (doc 0 contains 'the cat'
    # 'cat sat' shared with doc 1 -> both finite, sanity only)
    assert all(v[1] < 0 for v in got.values())


def test_boilerplate_ngrams_flags_planted_phrase(spark):
    from streaming_feature_store_spark.operators.text import (
        boilerplate_ngrams,
    )

    chrome = "click here to subscribe"
    # per-doc unique lead words (digits would be stripped by the
    # tokenizer, so uniqueness must be alphabetic)
    docs = [
        (i, f"{chr(97 + i) * 3} lead words differ {chrome}")
        for i in range(8)
    ]
    docs += [(100, "totally different content entirely")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["gram"]: r["n_docs"]
        for r in boilerplate_ngrams(df, n=4, min_docs=8).collect()
    }
    assert out.get("click here to subscribe") == 8
    assert out.get("here to subscribe") is None  # 3-gram, n=4 run
    # grams anchored at the unique lead word never cross the threshold
    assert all(not g.startswith(("aaa", "bbb", "ccc")) for g in out)


def test_jackknife_ratio_se_matches_replay_and_delta(spark):
    import random

    from streaming_feature_store_spark.operators.experiment import (
        jackknife_ratio_se,
        ratio_metric_delta,
    )

    rng = random.Random(13)
    rows = []
    per_unit = {}
    for u in range(80):
        k = rng.randint(1, 6)
        vals = [round(rng.uniform(0, 10), 4) for _ in range(k)]
        per_unit[u] = (sum(vals), k)
        rows += [("g", u, v) for v in vals]
    df = spark.createDataFrame(rows, "grp string, uid long, v double")
    r = jackknife_ratio_se(
        df, "uid", ["grp"], "v", F.lit(1.0)
    ).collect()[0]

    sx = sum(x for x, _ in per_unit.values())
    sy = sum(y for _, y in per_unit.values())
    ris = [(sx - x) / (sy - y) for x, y in per_unit.values()]
    n = len(ris)
    mean_r = sum(ris) / n
    se = math.sqrt(sum((ri - mean_r) ** 2 for ri in ris) * (n - 1) / n)
    assert r["n_units"] == n
    assert abs(r["ratio"] - sx / sy) < 1e-6
    assert abs(r["se_jack"] - se) < 1e-5

    # cross-check: jackknife and delta-method agree on well-behaved data
    d = ratio_metric_delta(df, "uid", ["grp"], "v", F.lit(1.0)).collect()[0]
    assert 0.8 < r["se_jack"] / d["se"] < 1.25


def test_label_leakage_screen_flags_leaky_feature(spark):
    import random

    from streaming_feature_store_spark.operators.profile import (
        label_leakage_screen,
    )

    rng = random.Random(17)
    rows = []
    for _ in range(500):
        lab = rng.random() < 0.3
        leaky = (10.0 if lab else 0.0) + rng.gauss(0, 0.5)
        indep = rng.uniform(0, 100)
        rows.append((leaky, indep, 7.0, lab))
    df = spark.createDataFrame(
        rows, "leaky double, indep double, const double, lab boolean"
    )
    got = {
        r["feature"]: r
        for r in label_leakage_screen(
            df, ["leaky", "indep", "const"], "lab"
        ).collect()
    }
    assert got["leaky"]["flagged"] is True and got["leaky"]["r_pb"] > 0.9
    assert got["indep"]["flagged"] is False
    assert got["const"]["r_pb"] is None  # zero variance: NULL, no div0
    assert got["const"]["flagged"] is False


def test_rate_ratio_test_closed_form_and_guards(spark):
    from streaming_feature_store_spark.operators.experiment import (
        rate_ratio_test,
    )

    # arm a: 3 users, 30 events; arm b: 2 users, 40 events
    rows = [("g", u, False) for u in range(3) for _ in range(10)]
    rows += [("g", 10 + u, True) for u in range(2) for _ in range(20)]
    rows += [("empty", 1, False), ("empty", 2, False)]  # no treatment arm
    df = spark.createDataFrame(rows, "grp string, uid long, trt boolean")
    got = {
        r["grp"]: r
        for r in rate_ratio_test(df, ["grp"], "trt", "uid").collect()
    }
    g = got["g"]
    assert (g["c_a"], g["c_b"], g["u_a"], g["u_b"]) == (30, 40, 3, 2)
    ratio = (40 / 2) / (30 / 3)
    z = math.log(ratio) / math.sqrt(1 / 30 + 1 / 40)
    assert g["rate_ratio"] == round(ratio, 6)
    assert g["z_stat"] == round(z, 4)
    assert abs(g["p_value"] - math.erfc(abs(z) / math.sqrt(2))) < 1e-5
    # zero-event arm: NULL everywhere, no log(0)/div0 crash
    assert got["empty"]["z_stat"] is None
    assert got["empty"]["p_value"] is None


def test_proportions_ztest_matches_textbook(spark):
    from streaming_feature_store_spark.operators.experiment import (
        proportions_ztest,
    )

    rows = (
        [("g", False, True)] * 40 + [("g", False, False)] * 60
        + [("g", True, True)] * 55 + [("g", True, False)] * 45
        + [("allconv", False, True)] * 5 + [("allconv", True, True)] * 5
    )
    df = spark.createDataFrame(rows, "grp string, trt boolean, ok boolean")
    got = {
        r["grp"]: r
        for r in proportions_ztest(df, ["grp"], "trt", "ok").collect()
    }
    g = got["g"]
    pool = (40 + 55) / 200
    z = (0.55 - 0.40) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert g["rate_a"] == 0.4 and g["rate_b"] == 0.55
    assert g["z_stat"] == round(z, 4)
    # degenerate pooled rate (everyone converts): zero variance -> NULL
    assert got["allconv"]["z_stat"] is None


def test_active_user_stickiness_matches_replay(spark):
    import datetime as dt

    from streaming_feature_store_spark.operators.behavior import (
        active_user_stickiness,
    )

    base = dt.datetime(2024, 3, 1)
    # user 0 active every day; user 1 every 3rd day; user 2 once
    rows = []
    for day in range(12):
        rows.append((0, base + dt.timedelta(days=day)))
        if day % 3 == 0:
            rows.append((1, base + dt.timedelta(days=day)))
    rows.append((2, base + dt.timedelta(days=5)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in active_user_stickiness(df, window_days=7).collect()
    }
    # naive replay
    from collections import defaultdict

    active = defaultdict(set)
    for u, ts in rows:
        active[ts.date()].add(u)
    all_days = sorted(active)
    for d in all_days:
        window = [
            dd for dd in all_days
            if 0 <= (d - dd).days <= 6
        ]
        wau_set = set().union(*[active[dd] for dd in window])
        dau, wau, stick = got[str(d)]
        assert dau == len(active[d])
        assert wau == len(wau_set), d
        assert stick == round(dau / len(wau_set), 6)


def test_cohort_ltv_cumulative_and_per_capita(spark):
    import datetime as dt

    from streaming_feature_store_spark.operators.behavior import cohort_ltv

    rows = [
        # two 2020-cohort customers, one 2021
        (1, dt.date(2020, 5, 1), 100.0),
        (1, dt.date(2021, 2, 1), 50.0),
        (2, dt.date(2020, 8, 1), 30.0),
        (3, dt.date(2021, 1, 1), 40.0),
        (3, dt.date(2021, 6, 1), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    got = {
        (r["cohort_year"], r["age_years"]): r
        for r in cohort_ltv(df).collect()
    }
    assert got[(2020, 0)]["rev"] == 130.0
    assert got[(2020, 0)]["cohort_users"] == 2
    assert got[(2020, 0)]["cum_ltv_per_user"] == 65.0
    assert got[(2020, 1)]["rev"] == 50.0
    assert got[(2020, 1)]["cum_ltv_per_user"] == 90.0  # (130+50)/2
    assert got[(2021, 0)]["cum_ltv_per_user"] == 50.0  # (40+10)/1


def test_t_closeness_report_matches_replay(spark):
    from streaming_feature_store_spark.operators.profile import (
        t_closeness_report,
    )

    rows = (
        [("g1", "flu")] * 9 + [("g1", "cold")] * 1
        + [("g2", "flu")] * 5 + [("g2", "cold")] * 5
        + [("g3", None)] * 3 + [("g3", "flu")] * 2 + [("g3", "rare")] * 2
    )
    df = spark.createDataFrame(rows, "qi string, sens string")
    got = {
        r["qi"]: r
        for r in t_closeness_report(df, ["qi"], "sens", 0.3).collect()
    }

    from collections import Counter

    base = [(q, s) for q, s in rows if s is not None]
    glob = Counter(s for _, s in base)
    n = len(base)
    for qi in ("g1", "g2", "g3"):
        grp = Counter(s for q, s in base if q == qi)
        cg = sum(grp.values())
        tvd = 0.5 * sum(
            abs(grp.get(v, 0) / cg - c / n) for v, c in glob.items()
        )
        assert got[qi]["group_rows"] == cg
        assert got[qi]["tvd"] == round(tvd, 6), qi
        assert got[qi]["t_close"] == (tvd <= 0.3)
    # at a tight threshold every group here leaks
    tight = {
        r["qi"]: r["t_close"]
        for r in t_closeness_report(df, ["qi"], "sens", 0.05).collect()
    }
    assert not any(tight.values())


def test_forecast_baseline_eval_matches_replay(spark):
    from streaming_feature_store_spark.operators.behavior import (
        forecast_baseline_eval,
    )

    # weekly-periodic series + noise: seasonal naive (lag 7) should beat
    # persistence (lag 1) -> mase > 1
    season = [10, 50, 30, 80, 20, 60, 40]
    ys = [season[i % 7] + (i % 3) for i in range(28)]
    df = spark.createDataFrame(
        [("s", i, float(y)) for i, y in enumerate(ys)],
        "grp string, d long, y double",
    )
    r = forecast_baseline_eval(df, "grp", "d", "y").collect()[0]
    evals = [
        (ys[i], ys[i - 1], ys[i - 7]) for i in range(7, 28)
    ]
    mae_m = sum(abs(y - m) for y, m, _ in evals) / len(evals)
    mae_s = sum(abs(y - s) for y, _, s in evals) / len(evals)
    assert r["n_eval"] == 21
    assert r["mae_model"] == round(mae_m, 6)
    assert r["mae_naive"] == round(mae_s, 6)
    assert r["mase"] == round(mae_m / mae_s, 6)
    assert r["mase"] > 1.0

    # perfectly seasonal series: naive MAE 0 -> NULL mase, no div0
    ys2 = [season[i % 7] for i in range(21)]
    df2 = spark.createDataFrame(
        [("s", i, float(y)) for i, y in enumerate(ys2)],
        "grp string, d long, y double",
    )
    r2 = forecast_baseline_eval(df2, "grp", "d", "y").collect()[0]
    assert r2["mase"] is None


def test_active_user_stickiness_gap_days_report_zero_dau(spark):
    """r8 judge finding #2: a calendar day with trailing-window users but
    zero same-day actives must appear with dau=0 / stickiness=0, not
    vanish from the product-health readout."""
    import datetime as dt

    from streaming_feature_store_spark.operators.behavior import (
        active_user_stickiness,
    )

    base = dt.datetime(2024, 3, 1)
    # one user active day 0 and day 4 only: days 1-3 are gap days with
    # wau=1 (day-0 activity still in the trailing 7-day window)
    rows = [(0, base), (0, base + dt.timedelta(days=4))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in active_user_stickiness(df, window_days=7).collect()
    }
    assert got[str(base.date())] == (1, 1, 1.0)
    for gap in (1, 2, 3):
        d = str((base + dt.timedelta(days=gap)).date())
        assert got[d] == (0, 1, 0.0), (d, got)
    assert got[str((base + dt.timedelta(days=4)).date())] == (1, 1, 1.0)
