"""Round-7 batch: behavior (cohort/RFM/ntile), ML encodings/splits,
triangle counting, EWMA, and SemDeDup — each pinned against an
independent naive replay (pandas/numpy/itertools), not against itself.
"""

import itertools
import math

import numpy as np
import pytest

import pyspark.sql.functions as F


# ---------------------------------------------------------------- ntile


def _sql_ntile(n_rows: int, n: int) -> list[int]:
    """Textbook SQL NTILE bucket per 1-based row number."""
    q, r = divmod(n_rows, n)
    out = []
    for rn in range(1, n_rows + 1):
        head = r * (q + 1)
        if q == 0 or rn <= head:
            out.append(math.ceil(rn / (q + 1)))
        else:
            out.append(r + math.ceil((rn - head) / q))
    return out


@pytest.mark.parametrize("n_rows,tiles", [(7, 3), (10, 5), (3, 5), (32, 4)])
def test_distributed_ntile_matches_sql_formula(spark, n_rows, tiles):
    from streaming_feature_store_spark.operators.behavior import (
        distributed_ntile,
    )

    df = spark.createDataFrame([(i, i * 13 % 7) for i in range(n_rows)], "id long, v long")
    out = distributed_ntile(df, [F.col("v").asc(), F.col("id")], tiles, "tile")
    got = {
        r["id"]: r["tile"]
        for r in out.collect()
    }
    order = sorted(range(n_rows), key=lambda i: (i * 13 % 7, i))
    expected_by_rn = _sql_ntile(n_rows, tiles)
    for rn, row_id in enumerate(order, start=1):
        assert got[row_id] == expected_by_rn[rn - 1]


def test_global_row_number_is_dense_and_ordered(spark):
    from streaming_feature_store_spark.operators.behavior import (
        global_row_number,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(200)], "id long, v long"
    ).repartition(7)
    rn, total = global_row_number(df, [F.col("v"), F.col("id")], "rn")
    rows = sorted(rn.collect(), key=lambda r: r["rn"])
    assert total == 200
    assert [r["rn"] for r in rows] == list(range(1, 201))
    keys = [(r["v"], r["id"]) for r in rows]
    assert keys == sorted(keys)


# ------------------------------------------------------------- cohorts


@pytest.mark.slow
def test_cohort_retention_weekly(spark):
    from streaming_feature_store_spark.operators.behavior import (
        cohort_retention,
    )

    week = 7 * 86400
    rows = []
    # user 1: weeks 0,1,2 ; user 2: weeks 0,2 ; user 3: week 1 only
    for u, weeks in [(1, [0, 1, 2]), (2, [0, 2]), (3, [1])]:
        for w in weeks:
            rows.append((u, w * week + 1000))
    df = spark.createDataFrame(rows, "user_id long, epoch long").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    out = {
        (r["cohort_period"], r["period_offset"]): (
            r["active_users"],
            r["cohort_size"],
        )
        for r in cohort_retention(df, grain="week").collect()
    }
    assert out[("W0", 0)] == (2, 2)
    assert out[("W0", 1)] == (1, 2)
    assert out[("W0", 2)] == (2, 2)
    assert out[("W1", 0)] == (1, 1)
    assert ("W1", 1) not in out  # user 3 never returns


@pytest.mark.slow
def test_rfm_scores_shape(spark):
    from streaming_feature_store_spark.operators.behavior import rfm_scores

    rows = [
        (c, f"1998-0{1 + c % 5}-15 00:00:00", 100.0 * (c + 1))
        for c in range(25)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, d string, o_totalprice double"
    ).select(
        "o_custkey", F.col("d").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    out = rfm_scores(df).collect()
    assert len(out) == 25
    for r in out:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm_segment"] == (
            f"{r['r_score']}{r['f_score']}{r['m_score']}"
        )
    # exactly 5 customers per m-quintile (25 rows, distinct monetary)
    from collections import Counter

    assert Counter(r["m_score"] for r in out) == {i: 5 for i in range(1, 6)}


# ------------------------------------------------------------ encoding


def test_target_encode_oof_excludes_own_fold(spark):
    from streaming_feature_store_spark.ml.training import (
        oof_fold,
        target_encode_oof,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = target_encode_oof(df, "cat", "y", "id", n_folds=4, smoothing=0.0)
    folds = {
        r["id"]: r["fold"]
        for r in df.select("id", oof_fold("id", 4).alias("fold")).collect()
    }
    # replay in plain python
    by_cf: dict = {}
    for i, cat, y in rows:
        k = (cat, folds[i])
        s, c = by_cf.get(k, (0.0, 0))
        by_cf[k] = (s + y, c + 1)
    for r in out.collect():
        cat, fold = r["cat"], r["fold"]
        s_oof = sum(v[0] for (c, f), v in by_cf.items() if c == cat and f != fold)
        c_oof = sum(v[1] for (c, f), v in by_cf.items() if c == cat and f != fold)
        assert r["cat_target_enc"] == pytest.approx(s_oof / c_oof, rel=1e-12)


def test_hash_feature_buckets_range_and_stability(spark):
    from streaming_feature_store_spark.ml.training import hash_feature_buckets

    df = spark.createDataFrame(
        [(f"val{i}",) for i in range(500)], "s string"
    )
    out = df.select(
        "s", hash_feature_buckets("s", 64, salt="t").alias("b")
    ).collect()
    assert all(0 <= r["b"] < 64 for r in out)
    # deterministic: recompute matches
    again = {
        r["s"]: r["b"]
        for r in df.select(
            "s", hash_feature_buckets("s", 64, salt="t").alias("b")
        ).collect()
    }
    assert all(again[r["s"]] == r["b"] for r in out)
    # salt changes the mapping for at least some values
    other = {
        r["s"]: r["b"]
        for r in df.select(
            "s", hash_feature_buckets("s", 64, salt="u").alias("b")
        ).collect()
    }
    assert any(other[s] != b for s, b in again.items())


def test_time_split_embargo_boundaries(spark):
    from streaming_feature_store_spark.ml.training import time_split_embargo

    df = spark.createDataFrame(
        [
            (1, "2024-01-19 23:59:59"),
            (2, "2024-01-20 00:00:00"),
            (3, "2024-01-22 23:59:59"),
            (4, "2024-01-23 00:00:00"),
        ],
        "id long, t string",
    ).select("id", F.col("t").cast("timestamp").alias("ts"))
    got = {
        r["id"]: r["split"]
        for r in time_split_embargo(
            df, "ts", "2024-01-20 00:00:00", "3 days"
        ).collect()
    }
    assert got == {1: "train", 2: "embargo", 3: "embargo", 4: "test"}


# ------------------------------------------------------------ triangles


def _naive_triangles(edges):
    nodes = sorted({n for e in edges for n in e})
    eset = {tuple(sorted(e)) for e in edges}
    count: dict = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                count[n] = count.get(n, 0) + 1
    return count


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (1, 3), (3, 4)],  # one triangle + pendant
        [(1, 2), (2, 3), (3, 4)],  # path: zero triangles
        list(itertools.combinations(range(5), 2)),  # K5: C(4,2)=6 each
    ],
)
@pytest.mark.slow
def test_triangle_counts_vs_naive(spark, edges):
    from streaming_feature_store_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["triangles"] for r in triangle_counts(df).collect()
    }
    assert got == _naive_triangles(edges)


def test_triangle_counts_tolerates_dupes_and_loops(spark):
    from streaming_feature_store_spark.operators.graph import triangle_counts

    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["triangles"] for r in triangle_counts(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_random_vs_naive(spark):
    rng = np.random.default_rng(11)
    edges = list(
        {
            tuple(sorted(p))
            for p in rng.integers(0, 18, size=(120, 2)).tolist()
            if p[0] != p[1]
        }
    )
    from streaming_feature_store_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["triangles"] for r in triangle_counts(df).collect()
    }
    assert got == _naive_triangles(edges)


# --------------------------------------------------------------- ewma


def test_ewma_matches_pandas_recurrence(spark):
    from streaming_feature_store_spark.operators.windows import ewma_latest

    rng = np.random.default_rng(5)
    rows = []
    for key in range(6):
        for i in range(50):
            rows.append((key, i, i * 10 + key, float(rng.normal())))
    df = spark.createDataFrame(rows, "k long, seq long, tsv long, x double").select(
        "k", F.timestamp_seconds("tsv").alias("ts"), "seq", "x"
    )
    out = {
        r["k"]: r["ewma"]
        for r in ewma_latest(df, "k", "ts", "x", alpha=0.3, tiebreak_col="seq").collect()
    }
    for key in range(6):
        xs = [x for k, i, t, x in rows if k == key]
        s = xs[0]
        for x in xs[1:]:
            s = 0.7 * s + 0.3 * x
        assert out[key] == pytest.approx(round(s, 6), abs=1e-9)


def test_ewma_last_n_truncation_is_sub_ulp(spark):
    from streaming_feature_store_spark.operators.windows import ewma_latest

    rows = [(1, i, float((i * 7) % 13)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, seq long, x double").select(
        "k", F.timestamp_seconds("seq").alias("ts"), "seq", "x"
    )
    full = ewma_latest(df, "k", "ts", "x", alpha=0.2, tiebreak_col="seq")
    trunc = ewma_latest(
        df, "k", "ts", "x", alpha=0.2, tiebreak_col="seq", last_n=512
    )
    assert full.collect()[0]["ewma"] == trunc.collect()[0]["ewma"]


# ------------------------------------------------------------ semdedup


def test_semantic_dedup_vs_naive_replay(spark):
    from streaming_feature_store_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 16))
    vecs = []
    for i, v in enumerate(base):
        vecs.append((i, [float(x) for x in v]))
    # plant near-duplicates of vectors 5 and 17
    for j, src in [(100, 5), (101, 17)]:
        vecs.append(
            (j, [float(x * 1.001) for x in base[src]])
        )
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=4, threshold=0.99)
    got = {r["vec_id"]: (r["cluster_id"], r["dropped"]) for r in out.collect()}
    assert len(got) == 42
    # scaled copies have cosine 1.0 with their source: must be dropped
    assert got[100][1] is True
    assert got[101][1] is True
    # naive replay: same clustering convention (4 lowest-id seeds,
    # rounded dist2, id tiebreak), paper drop rule
    arr = {i: np.array(v) for i, v in vecs}
    seeds = sorted(arr)[:4]
    clusters: dict = {}
    for i, v in arr.items():
        d = [
            (round(float(v @ v - 2 * v @ arr[c] + arr[c] @ arr[c]), 6), c)
            for c in seeds
        ]
        clusters[i] = min(d)[1]
    for i, (cid, dropped) in got.items():
        assert clusters[i] == cid
        mates = [j for j in arr if clusters[j] == cid and j < i]
        naive_drop = any(
            float(
                arr[i] @ arr[j]
                / (np.linalg.norm(arr[i]) * np.linalg.norm(arr[j]))
            )
            >= 0.99
            for j in mates
        )
        assert dropped == naive_drop


# ---------------------------------------------------------- MAD / NB / pct


def test_mad_outlier_stats_vs_numpy(spark):
    from streaming_feature_store_spark.operators.profile import (
        mad_outlier_stats,
    )

    rng = np.random.default_rng(7)
    rows = []
    for g in ["a", "b"]:
        vals = rng.normal(loc=10.0 if g == "a" else -5.0, size=200)
        vals[:3] = 1e6  # planted outliers
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mad_outlier_stats(df, "g", "v", k=3.0).collect()}
    for g in ["a", "b"]:
        vals = np.array([v for gg, v in rows if gg == g])
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        n_out = int(np.sum(np.abs(vals - med) > 3.0 * 1.4826 * mad))
        assert out[g]["med"] == pytest.approx(round(med, 4), abs=1e-9)
        assert out[g]["mad"] == pytest.approx(round(mad, 4), abs=1e-9)
        assert out[g]["n_outliers"] == n_out
        assert out[g]["n_rows"] == 200


def test_mad_immune_to_extreme_outlier(spark):
    """The mean/stddev fence moves with one huge value; the MAD fence
    must not."""
    from streaming_feature_store_spark.operators.profile import (
        mad_outlier_stats,
    )

    base = [("g", float(x)) for x in range(100)]
    df1 = spark.createDataFrame(base, "g string, v double")
    df2 = spark.createDataFrame(
        base + [("g", 1e12)], "g string, v double"
    )
    r1 = mad_outlier_stats(df1, "g", "v").collect()[0]
    r2 = mad_outlier_stats(df2, "g", "v").collect()[0]
    assert abs(r1["med"] - r2["med"]) <= 0.5
    assert abs(r1["mad"] - r2["mad"]) <= 0.5
    assert r2["n_outliers"] >= 1


def test_naive_bayes_langid_separable(spark):
    from streaming_feature_store_spark.operators.text import (
        naive_bayes_langid,
    )

    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append((i, "en", "the quick brown fox runs over the lazy dog"))
        else:
            rows.append((i, "de", "der schnelle braune fuchs springt ueber den hund"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = naive_bayes_langid(df).collect()
    assert len(out) > 20  # ~half the docs land in the test split
    acc = sum(r["is_correct"] for r in out) / len(out)
    assert acc == 1.0  # fully separable vocabularies


def test_naive_bayes_prior_only_docs(spark):
    """Docs with no in-vocabulary tokens must still get a deterministic
    prior-argmax prediction, not vanish."""
    from streaming_feature_store_spark.operators.text import (
        naive_bayes_langid,
    )

    rows = [(i, "en" if i < 90 else "zh", "english words here" if i < 90 else "中文文本") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = naive_bayes_langid(df).collect()
    ids = {r["doc_id"] for r in out}
    test_ids = {
        i for i in range(120)
        if __import__("hashlib").md5(str(i).encode()).hexdigest()[:8] >= "80000000"
    }
    assert ids == test_ids  # every test doc predicted, incl. zero-vocab zh


def test_distributed_percent_rank_matches_window(spark):
    from streaming_feature_store_spark.operators.behavior import (
        distributed_percent_rank,
    )
    from pyspark.sql import Window as W

    rng = np.random.default_rng(9)
    rows = [
        (i, ["a", "b", "c"][i % 3], float(rng.integers(0, 40)))  # many ties
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(8)
    got = {
        r["id"]: r["pct_rank"]
        for r in distributed_percent_rank(df, "g", "v").collect()
    }
    ref = {
        r["id"]: r["ref"]
        for r in df.withColumn(
            "ref",
            F.percent_rank().over(W.partitionBy("g").orderBy("v")),
        ).collect()
    }
    assert got.keys() == ref.keys()
    for i in got:
        assert got[i] == ref[i], i


def test_distributed_percent_rank_single_row_group(spark):
    from streaming_feature_store_spark.operators.behavior import (
        distributed_percent_rank,
    )

    df = spark.createDataFrame([(1, "solo", 5.0)], "id long, g string, v double")
    assert distributed_percent_rank(df, "g", "v").collect()[0]["pct_rank"] == 0.0


# ------------------------------------------------- mixture planning ops


@pytest.mark.slow
def test_largest_remainder_alloc_vs_replay(spark):
    from streaming_feature_store_spark.operators.curation import (
        largest_remainder_alloc,
    )

    rng = np.random.default_rng(13)
    for trial in range(5):
        weights = [int(w) for w in rng.integers(1, 10_000, size=7)]
        budget = int(rng.integers(100, 1_000_000))
        rows = [(f"s{i}", w) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, "source string, n_tokens long")
        out = {
            r["source"]: (r["base_alloc"], r["extra"], r["alloc"])
            for r in largest_remainder_alloc(df, budget).collect()
        }
        W = sum(weights)
        base = {f"s{i}": budget * w // W for i, w in enumerate(weights)}
        rem = {f"s{i}": budget * w % W for i, w in enumerate(weights)}
        leftover = budget - sum(base.values())
        order = sorted(rem, key=lambda k: (-rem[k], k))
        extra = {k: (1 if i < leftover else 0) for i, k in enumerate(order)}
        assert sum(a for _, _, a in out.values()) == budget
        for k in base:
            assert out[k] == (base[k], extra[k], base[k] + extra[k]), (
                trial, k
            )


def test_temperature_mixture_rates_properties(spark):
    from streaming_feature_store_spark.operators.curation import (
        temperature_mixture_rates,
    )

    rows = []
    for src, n_docs, words in [("big", 100, 50), ("mid", 30, 50), ("small", 5, 50)]:
        for i in range(n_docs):
            rows.append((f"{src}:{i}", src, " ".join(["w"] * words)))
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {r["source"]: r for r in temperature_mixture_rates(df, alpha=0.3).collect()}
    # rates in (0, 1], the rarest source keeps everything
    assert all(0 < r["keep_rate"] <= 1.0 for r in out.values())
    assert out["small"]["keep_rate"] == 1.0
    # tempering: the big source is downsampled hardest
    assert out["big"]["keep_rate"] < out["mid"]["keep_rate"] < 1.0
    # alpha=1 is the natural distribution: nobody is downsampled
    nat = {r["source"]: r for r in temperature_mixture_rates(df, alpha=1.0).collect()}
    assert all(r["keep_rate"] == 1.0 for r in nat.values())


def test_calibration_bins_vs_pandas(spark):
    from streaming_feature_store_spark.ml.training import calibration_bins

    rng = np.random.default_rng(21)
    scores = rng.uniform(size=300)
    labels = (rng.uniform(size=300) < scores).astype(int)  # calibrated-ish
    rows = [(i, float(s), int(l)) for i, (s, l) in enumerate(zip(scores, labels))]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    out = {r["bin"]: r for r in calibration_bins(df, "score", "label", "id", 10).collect()}
    order = sorted(range(300), key=lambda i: (scores[i], i))
    for b in range(1, 11):
        chunk = order[(b - 1) * 30: b * 30]
        assert out[b]["n_rows"] == 30
        assert out[b]["n_pos"] == sum(labels[i] for i in chunk)
        assert out[b]["mean_score"] == pytest.approx(
            round(float(np.sum(np.sort([scores[i] for i in chunk]))) / 30, 6),
            abs=1e-6,
        )
    # monotone-ish positive rate for a calibrated scorer
    assert out[10]["pos_rate"] > out[1]["pos_rate"]


@pytest.mark.slow
def test_semantic_dedup_kernels_agree(spark):
    """join (oracled baseline) and arrow (GEMM scale path) kernels must
    produce identical drop sets away from threshold knife-edges."""
    from streaming_feature_store_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(17)
    base = rng.normal(size=(120, 24))
    vecs = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j in range(6):  # planted scaled twins (cosine exactly 1.0)
        vecs.append((200 + j, [float(x * 0.97) for x in base[j * 7]]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    a = sorted(
        (r["vec_id"], r["cluster_id"], r["dropped"])
        for r in semantic_dedup(df, k=6, threshold=0.98).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster_id"], r["dropped"])
        for r in semantic_dedup(df, k=6, threshold=0.98, kernel="arrow").collect()
    )
    assert a == b
    assert sum(1 for _, _, d in a if d) >= 6


# --------------------------------------------------- CDC / TWAP / KM


def test_apply_cdc_semantics(spark):
    from streaming_feature_store_spark.operators.history import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 1),
            (2, "b3", 22.0, "U", 2),   # supersedes seq 1
            (3, "c", 30.0, "D", 1),    # delete
            (4, "d", 40.0, "I", 1),    # insert new key
            (4, "d2", 41.0, "U", 2),   # then update it
        ],
        "k long, s string, v double, op string, seq int",
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in apply_cdc(base, changes, ["k"]).collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b3", 22.0), 4: ("d2", 41.0)}


def test_apply_cdc_idempotent_on_duplicate_delivery(spark):
    from streaming_feature_store_spark.operators.history import apply_cdc

    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    ch = spark.createDataFrame(
        [(1, 2.0, "U", 5)], "k long, v double, op string, seq int"
    )
    once = apply_cdc(base, ch, ["k"]).collect()
    twice = apply_cdc(base, ch.unionAll(ch), ["k"]).collect()
    assert once == twice == [type(once[0])(k=1, v=2.0)]


def test_time_weighted_avg_vs_manual(spark):
    from streaming_feature_store_spark.operators.windows import (
        time_weighted_avg,
    )

    # value 10 holds 0-10s, 20 holds 10-40s, 0 holds 40-100s
    rows = [(1, 0, 10.0, 1), (1, 10, 20.0, 2), (1, 40, 0.0, 3)]
    df = spark.createDataFrame(rows, "k long, sec long, v double, i long").select(
        "k", F.timestamp_seconds("sec").alias("ts"), F.col("v"), "i"
    )
    out = time_weighted_avg(
        df, "k", "ts", "v", end_ts="1970-01-01 00:01:40", tiebreak_col="i"
    ).collect()[0]
    expected = (10.0 * 10 + 20.0 * 30 + 0.0 * 60) / 100
    assert out["twap"] == pytest.approx(expected, abs=1e-9)
    assert out["n_readings"] == 3


def test_kaplan_meier_vs_manual(spark):
    from streaming_feature_store_spark.operators.behavior import (
        kaplan_meier_retention,
    )

    day = 86400
    rows = []
    # users: tenures 0,0,1,2 churned; one user censored at study end (day 3)
    for u, days in [(1, [0]), (2, [1]), (3, [0, 1]), (4, [0, 1, 2]), (5, [0, 3])]:
        for d in days:
            rows.append((u, d * day + 10))
    df = spark.createDataFrame(rows, "user_id long, epoch long").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    out = {
        r["tenure_day"]: r
        for r in kaplan_meier_retention(df, horizon_days=4).collect()
    }
    # tenures: u1=0 churn, u2=0 churn, u3=1 churn, u4=2 churn, u5=3 censored
    # t=0: n=5, d=2 -> S=0.6 ; t=1: n=3, d=1 -> 0.6*(2/3)=0.4
    # t=2: n=2, d=1 -> 0.4*0.5=0.2 ; t=3: n=1, d=0 (censored) -> 0.2
    assert (out[0]["n_at_risk"], out[0]["churned"]) == (5, 2)
    assert out[0]["survival"] == pytest.approx(0.6, abs=1e-9)
    assert out[1]["survival"] == pytest.approx(0.4, abs=1e-9)
    assert out[2]["survival"] == pytest.approx(0.2, abs=1e-9)
    assert (out[3]["n_at_risk"], out[3]["churned"]) == (1, 0)
    assert out[3]["survival"] == pytest.approx(0.2, abs=1e-9)


# --------------------------------------------------- checksum / geo


def test_table_checksum_order_and_sensitivity(spark):
    from streaming_feature_store_spark.operators.profile import (
        table_checksum,
    )

    rows = [(i, f"name{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "k long, s string")
    b = spark.createDataFrame(list(reversed(rows)), "k long, s string").repartition(7)
    ca = table_checksum(a).collect()[0]
    cb = table_checksum(b).collect()[0]
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])
    # one flipped byte changes it
    mutated = [(i, f"name{i}" if i != 250 else "nameX") for i in range(500)]
    cm = table_checksum(
        spark.createDataFrame(mutated, "k long, s string")
    ).collect()[0]
    assert cm["checksum"] != ca["checksum"]
    # null vs the string 'NULL' vs shifted fields all differ
    n1 = table_checksum(
        spark.createDataFrame([(1, None)], "k long, s string")
    ).collect()[0]["checksum"]
    n2 = table_checksum(
        spark.createDataFrame([(1, "NULL")], "k long, s string")
    ).collect()[0]["checksum"]
    assert n1 != n2
    f1 = table_checksum(
        spark.createDataFrame([("ab", "c")], "x string, y string")
    ).collect()[0]["checksum"]
    f2 = table_checksum(
        spark.createDataFrame([("a", "bc")], "x string, y string")
    ).collect()[0]["checksum"]
    assert f1 != f2


def test_impossible_travel_known_answer(spark):
    from streaming_feature_store_spark.operators.geo import (
        haversine_km,
        impossible_travel,
    )

    # London -> Paris ~343 km; London -> Sydney ~17000 km
    rows = [
        (1, 0, 51.5074, -0.1278),       # London at t=0
        (1, 3600, 48.8566, 2.3522),     # Paris 1h later: ~343 km/h OK
        (1, 7200, -33.8688, 151.2093),  # Sydney 1h later: impossible
        (2, 0, 40.0, -74.0),
        (2, 0, 40.5, -74.5),            # same ts, ~70 km apart: flagged
    ]
    df = spark.createDataFrame(
        rows, "u long, sec long, lat double, lon double"
    ).select("u", F.timestamp_seconds("sec").alias("ts"), "lat", "lon",
             F.col("sec").alias("i"))
    out = impossible_travel(df, "u", "ts", "lat", "lon",
                            tiebreak_col="i").collect()
    by = {(r["u"], r["i"]): r for r in out}
    assert by[(1, 0)]["impossible_travel"] is False   # first event
    assert by[(1, 3600)]["impossible_travel"] is False
    assert 300 < by[(1, 3600)]["dist_km"] < 400
    assert by[(1, 7200)]["impossible_travel"] is True
    assert by[(1, 7200)]["dist_km"] > 15000
    flagged2 = [r for r in out if r["u"] == 2 and r["impossible_travel"]]
    assert len(flagged2) == 1  # the zero-gap jump


@pytest.mark.slow
def test_semantic_dedup_mega_cluster_guard(spark):
    """r7 verdict item #3: a mode-collapsed embedding space (every vector
    in one cluster) must raise an actionable error BEFORE the quadratic
    work, not silently run an O(n^2) single task."""
    import pytest as _pytest

    from streaming_feature_store_spark.operators.similarity import (
        semantic_dedup,
    )

    # 30 identical vectors -> all distances tie -> one cluster
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for kernel in ("join", "arrow"):
        with _pytest.raises(ValueError, match="max_cluster_rows"):
            semantic_dedup(
                df, k=4, threshold=0.99, kernel=kernel, max_cluster_rows=10
            )
    # explicit opt-out (or a generous bound) still runs
    out = semantic_dedup(
        df, k=4, threshold=0.99, max_cluster_rows=None
    ).collect()
    assert len(out) == 30
    # identical vectors: everything except the lowest id is dropped
    assert sum(r["dropped"] for r in out) == 29
