"""Round-7 batch 7: distributed AUC, weighted quantiles, Markov
transitions, nearest-in-time join, seasonal anomalies, Pareto frontier,
skew report, Bloom semi-join — each pinned against an independent naive
replay (pandas/numpy loops), not against itself.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F


RNG = np.random.default_rng(1107)


# ------------------------------------------------- distributed_prefix_agg


def _prefix_df(spark, n=500, groups=5):
    rows = []
    seen = set()
    for _ in range(n):
        g = int(RNG.integers(groups))
        o = float(RNG.integers(0, 10_000)) / 4.0
        if (g, o) in seen:  # contract: unique (group, order)
            continue
        seen.add((g, o))
        rows.append((g, o, int(RNG.integers(1, 50))))
    return spark.createDataFrame(rows, "g int, o double, v long"), rows


def test_distributed_prefix_sum_matches_pandas(spark):
    from streaming_feature_store_spark.operators.behavior import (
        distributed_prefix_agg,
    )

    df, rows = _prefix_df(spark)
    got = {
        (r["g"], r["o"]): r["_prefix"]
        for r in distributed_prefix_agg(
            df.repartition(7), "g", "o", "v", kind="sum", inclusive=True
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "o", "v"]).sort_values(["g", "o"])
    pdf["cum"] = pdf.groupby("g")["v"].cumsum()
    assert len(got) == len(pdf)
    for _, r in pdf.iterrows():
        assert got[(r["g"], r["o"])] == r["cum"]


def test_distributed_prefix_max_exclusive_matches_pandas(spark):
    from streaming_feature_store_spark.operators.behavior import (
        distributed_prefix_agg,
    )

    df, rows = _prefix_df(spark)
    got = {
        (r["g"], r["o"]): r["_prefix"]
        for r in distributed_prefix_agg(
            df.repartition(9), "g", "o", "v", kind="max", inclusive=False
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "o", "v"]).sort_values(["g", "o"])
    pdf["prev"] = pdf.groupby("g")["v"].apply(
        lambda s: s.cummax().shift(1)
    ).reset_index(level=0, drop=True)
    for _, r in pdf.iterrows():
        want = r["prev"]
        have = got[(r["g"], r["o"])]
        if pd.isna(want):
            assert have is None
        else:
            assert have == want


# ------------------------------------------------------- distributed_auc


def _naive_auc(scores, labels):
    s = pd.Series(scores)
    ranks = s.rank(method="average")
    y = np.asarray(labels)
    p, n = int((y == 1).sum()), int((y == 0).sum())
    if p == 0 or n == 0:
        return None
    return float((ranks[y == 1].sum() - p * (p + 1) / 2) / (p * n))


def test_distributed_auc_matches_naive_with_ties(spark):
    from streaming_feature_store_spark.ml.training import distributed_auc

    rows = []
    for g in range(3):
        for _ in range(400):
            # coarse grid → heavy score ties
            rows.append(
                (g, float(RNG.integers(0, 25)), int(RNG.integers(0, 2)))
            )
    df = spark.createDataFrame(rows, "seg int, score double, y int")
    got = {
        r["seg"]: r["auc"]
        for r in distributed_auc(df, "score", "y", group_col="seg").collect()
    }
    pdf = pd.DataFrame(rows, columns=["seg", "score", "y"])
    for g, sub in pdf.groupby("seg"):
        want = _naive_auc(sub["score"].values, sub["y"].values)
        assert got[g] == pytest.approx(want, abs=2e-6)


def test_distributed_auc_degenerate_group_is_null(spark):
    from streaming_feature_store_spark.ml.training import distributed_auc

    df = spark.createDataFrame(
        [(0, 1.0, 1), (0, 2.0, 1), (1, 1.0, 0), (1, 3.0, 1)],
        "seg int, score double, y int",
    )
    got = {
        r["seg"]: r["auc"]
        for r in distributed_auc(df, "score", "y", group_col="seg").collect()
    }
    assert got[0] is None
    assert got[1] == 1.0


def test_distributed_auc_perfect_and_inverted(spark):
    from streaming_feature_store_spark.ml.training import distributed_auc

    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y int")
    (r,) = distributed_auc(df, "score", "y").collect()
    assert r["auc"] == 1.0
    inv = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "score double, y int"
    )
    (r2,) = distributed_auc(inv, "score", "y").collect()
    assert r2["auc"] == 0.0


# ------------------------------------------------------ weighted_quantile


@pytest.mark.parametrize("q", [0.25, 0.5, 0.9])
def test_weighted_quantile_matches_naive(spark, q):
    from streaming_feature_store_spark.operators.profile import (
        weighted_quantile,
    )

    rows = [
        (
            ["a", "b", "c"][int(RNG.integers(3))],
            float(RNG.integers(1, 200)),
            float(RNG.integers(1, 9)),
        )
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {
        r["g"]: (r["weighted_quantile"], r["total_weight"])
        for r in weighted_quantile(df, "g", "v", "w", q=q).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "v", "w"])
    for g, sub in pdf.groupby("g"):
        agg = sub.groupby("v")["w"].sum().sort_index()
        cum = agg.cumsum()
        tot = float(agg.sum())
        want = float(cum.index[(cum >= q * tot).argmax()])
        assert got[g][0] == want
        assert got[g][1] == pytest.approx(tot)
    assert len(got) == pdf["g"].nunique()  # exactly one row per group


# ------------------------------------------------------ event_transitions


def test_event_transitions_matches_pandas(spark):
    from streaming_feature_store_spark.operators.behavior import (
        event_transitions,
    )

    rows = [
        (
            int(RNG.integers(20)),
            int(i),
            int(RNG.integers(0, 1_000)),
            ["view", "click", "buy"][int(RNG.integers(3))],
        )
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "u int, eid long, t long, et string")
    out = event_transitions(df, "u", "t", "et", "eid")
    got = {
        (r["from_type"], r["to_type"]): (
            r["n_transitions"],
            r["p_transition"],
        )
        for r in out.collect()
    }
    pdf = pd.DataFrame(rows, columns=["u", "eid", "t", "et"]).sort_values(
        ["u", "t", "eid"]
    )
    pdf["prev"] = pdf.groupby("u")["et"].shift(1)
    pairs = pdf.dropna(subset=["prev"])
    want = pairs.groupby(["prev", "et"]).size()
    totals = pairs.groupby("prev").size()
    assert len(got) == len(want)
    for (a, b), n in want.items():
        assert got[(a, b)][0] == n
        assert got[(a, b)][1] == pytest.approx(
            round(n / totals[a], 6), abs=1e-9
        )


# ----------------------------------------------------------- nearest_join


def _naive_nearest(labels, feats, tol=None):
    """labels/feats: (user, us, eid[, val]); returns label eid -> winner."""
    out = {}
    for u, lus, lid in labels:
        best = None
        for fu, fus, fid, fv in feats:
            if fu != u:
                continue
            d = abs(fus - lus)
            if tol is not None and d > tol:
                continue
            side = 0 if fus <= lus else 1
            tb = -fid if side == 0 else fid
            key = (d, side, tb)
            if best is None or key < best[0]:
                best = (key, fus, fv)
        out[lid] = None if best is None else (best[1], best[2])
    return out


def _nearest_frames(spark):
    labels = [
        (int(RNG.integers(8)), int(RNG.integers(0, 500)), int(1000 + i))
        for i in range(60)
    ]
    feats = [
        (
            int(RNG.integers(8)),
            int(RNG.integers(0, 500)),
            int(i),
            float(RNG.integers(0, 100)),
        )
        for i in range(300)
    ]
    ldf = spark.createDataFrame(labels, "user_id int, us long, event_id long")
    fdf = spark.createDataFrame(
        feats, "user_id int, us long, event_id long, fval double"
    )
    return labels, feats, ldf, fdf


def test_nearest_join_matches_naive(spark):
    from streaming_feature_store_spark.operators.asof import nearest_join

    labels, feats, ldf, fdf = _nearest_frames(spark)
    out = nearest_join(
        ldf, fdf, "user_id", "us", "us", ["fval"], [], "event_id"
    )
    got = {
        r["label_key"]: (r["near_ts_us"], r["near_fval"], r["near_delta_us"])
        for r in out.collect()
    }
    want = _naive_nearest(labels, feats)
    assert len(got) == len(labels)
    for lid, w in want.items():
        if w is None:
            assert got[lid][0] is None
        else:
            assert got[lid][0] == w[0]
            assert got[lid][1] == w[1]
    for u, lus, lid in labels:
        if got[lid][0] is not None:
            assert got[lid][2] == got[lid][0] - lus


def test_nearest_join_tolerance_gates_both_sides(spark):
    from streaming_feature_store_spark.operators.asof import nearest_join

    labels, feats, ldf, fdf = _nearest_frames(spark)
    out = nearest_join(
        ldf, fdf, "user_id", "us", "us", ["fval"], [], "event_id",
        tolerance_us=10,
    )
    got = {
        r["label_key"]: (r["near_ts_us"], r["near_fval"])
        for r in out.collect()
    }
    want = _naive_nearest(labels, feats, tol=10)
    for lid, w in want.items():
        if w is None:
            assert got[lid][0] is None
        else:
            assert got[lid] == w


# ------------------------------------------------ seasonal_anomaly_counts


def test_seasonal_anomaly_counts_matches_numpy(spark):
    from streaming_feature_store_spark.operators.drift import (
        seasonal_anomaly_counts,
    )
    import datetime

    rows = []
    for i in range(1000):
        hr = int(RNG.integers(0, 4))
        v = float(RNG.integers(0, 50))
        if RNG.random() < 0.02:
            v += 500.0  # planted spike
        rows.append(
            (
                ["a", "b"][int(RNG.integers(2))],
                datetime.datetime(2026, 1, 1 + int(RNG.integers(0, 20)), hr),
                v,
            )
        )
    df = spark.createDataFrame(rows, "et string, ts timestamp, v double")
    out = seasonal_anomaly_counts(df, "ts", "et", "v", z=3.0)
    got = {
        (r["et"], r["hour_of_day"]): (r["n_events"], r["n_anomalies"])
        for r in out.collect()
    }
    pdf = pd.DataFrame(rows, columns=["et", "ts", "v"])
    pdf["hr"] = pdf["ts"].dt.hour
    tot_anoms = 0
    for (et, hr), sub in pdf.groupby(["et", "hr"]):
        v = sub["v"].values
        n = len(v)
        mu, sd = v.mean(), v.std(ddof=1) if n > 1 else 0.0
        n_anom = (
            int((np.abs(v - mu) > 3.0 * sd).sum()) if n > 1 and sd >= 0 else 0
        )
        assert got[(et, hr)][0] == n
        assert got[(et, hr)][1] == n_anom
        tot_anoms += n_anom
    assert tot_anoms > 0  # the planted spikes were detected


# ---------------------------------------------------------- pareto_frontier


def test_pareto_frontier_matches_quadratic(spark):
    from streaming_feature_store_spark.operators.profile import (
        pareto_frontier,
    )

    rows = [
        (
            ["x", "y"][int(RNG.integers(2))],
            int(i),
            float(RNG.integers(0, 40)),  # coarse → duplicate costs
            int(RNG.integers(0, 40)),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, pid long, cost double, gain int")
    got = {
        r["pid"] for r in pareto_frontier(df, "g", "cost", "gain", ["pid"]).collect()
    }
    want = set()
    for g, pid, c, s in rows:
        dominated = any(
            og == g and oc < c and osz > s for og, _, oc, osz in rows
        )
        if not dominated:
            want.add(pid)
    assert got == want


# ---------------------------------------------------------- key_skew_report


def test_key_skew_report_matches_naive(spark):
    from streaming_feature_store_spark.operators.skew import key_skew_report

    rows = [(int(RNG.zipf(1.5)) % 30,) for _ in range(2000)]
    df = spark.createDataFrame(rows, "k int")
    out = key_skew_report(df, "k", top_n=5).collect()
    pdf = pd.DataFrame(rows, columns=["k"])
    counts = pdf.value_counts().reset_index(name="n")
    counts = counts.sort_values(["n", "k"], ascending=[False, True]).head(5)
    tot, nkeys = len(pdf), pdf["k"].nunique()
    assert [r["k"] for r in out] == list(counts["k"])
    for r, (_, naive) in zip(out, counts.iterrows()):
        assert r["key_rows"] == naive["n"]
        assert r["row_share"] == pytest.approx(round(naive["n"] / tot, 6))
        assert r["x_mean_key"] == pytest.approx(
            round(naive["n"] * nkeys / tot, 4)
        )


# ---------------------------------------------------------- bloom_semi_join


def test_bloom_semi_join_no_false_negatives_and_exact_fp(spark):
    from streaming_feature_store_spark.operators.enrich import bloom_semi_join

    build_keys = sorted(RNG.choice(10_000, size=40, replace=False).tolist())
    probe_keys = [int(RNG.integers(0, 10_000)) for _ in range(1500)]
    build = spark.createDataFrame([(int(k),) for k in build_keys], "bk long")
    probe = spark.createDataFrame(
        [(i, int(k)) for i, k in enumerate(probe_keys)], "rid long, pk long"
    )
    kept = {
        r["rid"]
        for r in bloom_semi_join(
            probe, "pk", build, "bk", num_hashes=4, prefix_len=2
        ).collect()
    }

    def bucket(key, seed):
        return hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:2]

    occupied = {
        s: {bucket(k, s) for k in build_keys} for s in range(1, 5)
    }
    want = {
        i
        for i, k in enumerate(probe_keys)
        if all(bucket(k, s) in occupied[s] for s in range(1, 5))
    }
    assert kept == want  # exact reproducibility, false positives included
    members = {i for i, k in enumerate(probe_keys) if k in set(build_keys)}
    assert members <= kept  # no false negatives
