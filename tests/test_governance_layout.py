"""k-anonymity, snapshot diff, Lloyd-step, and Z-order layout contracts —
each pinned against a pure-Python replica or a closed-form invariant,
independent of the DuckDB parity gate (q154-q157).
"""

import pytest

import pyspark.sql.functions as F


# ---------------------------------------------------------------- k-anonymity


def _people(spark):
    rows = [
        # (id, zip, age_band) — zip 94xxx/age 30 group has 3 members,
        # zip 10001/age 40 has 1, zip 73301/None has 2
        (1, "94107", 30), (2, "94107", 30), (3, "94107", 30),
        (4, "10001", 40),
        (5, "73301", None), (6, "73301", None),
    ]
    return spark.createDataFrame(rows, "id int, zip string, age int")


def test_k_anonymize_suppresses_small_groups(spark):
    from streaming_feature_store_spark.operators.profile import k_anonymize

    out = k_anonymize(_people(spark), ["zip", "age"], k=2).collect()
    kept = sorted(r["id"] for r in out)
    assert kept == [1, 2, 3, 5, 6]  # the singleton (id 4) is suppressed
    for r in out:
        assert r["qi_group_n"] >= 2
    # NULL is a value: both age-NULL rows grouped together and survive k=2
    assert {r["qi_group_n"] for r in out if r["zip"] == "73301"} == {2}


def test_k_anonymity_report_matches_anonymize(spark):
    from streaming_feature_store_spark.operators.profile import (
        k_anonymity_report,
        k_anonymize,
    )

    df = _people(spark)
    rep = k_anonymity_report(df, ["zip", "age"], k=3).collect()[0]
    assert rep["n_groups"] == 3
    assert rep["k_anonymity"] == 1  # the singleton sets the level
    assert rep["n_rows"] == 6
    kept = k_anonymize(df, ["zip", "age"], k=3).count()
    assert rep["rows_suppressed"] == 6 - kept == 3
    assert rep["groups_suppressed"] == 2


# --------------------------------------------------------------- snapshot diff


def test_snapshot_diff_statuses_and_null_safety(spark):
    from streaming_feature_store_spark.operators.history import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "X", 31.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    got = {
        r["k"]: (r["diff_status"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # unchanged keys suppressed by default; NULL == NULL is unchanged
    assert 1 not in got and 2 not in got
    assert got[3] == ("changed", "s,v")
    assert got[4] == ("removed", "")
    assert got[5] == ("added", "")

    full = snapshot_diff(old, new, ["k"], include_unchanged=True).collect()
    assert {r["k"]: r["diff_status"] for r in full}[2] == "unchanged"

    # NULL -> value IS a change
    old2 = spark.createDataFrame([(9, None)], "k int, v double")
    new2 = spark.createDataFrame([(9, 1.0)], "k int, v double")
    r = snapshot_diff(old2, new2, ["k"]).collect()[0]
    assert (r["diff_status"], r["changed_cols"]) == ("changed", "v")


# ----------------------------------------------------------------- Lloyd step


def test_kmeans_lloyd_step_matches_numpy(spark):
    import numpy as np

    from streaming_feature_store_spark.operators.similarity import (
        kmeans_lloyd_step,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 6)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_lloyd_step(df, k=4).collect()

    v64 = vecs.astype("float64")
    cents = v64[:4]  # lowest-id seeding
    d2 = ((v64[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).round(6)
    assign = d2.argmin(axis=1)  # ties break to lowest centroid id, as argmin
    want = {}
    for cid in range(4):
        members = v64[assign == cid]
        for pos in range(6):
            want[(cid, pos)] = (
                round(float(members[:, pos].mean()), 6),
                len(members),
            )
    assert len(out) == 4 * 6
    for r in out:
        mv, n = want[(r["cluster_id"], r["dim_pos"])]
        assert r["n_members"] == n
        assert r["centroid_val"] == pytest.approx(mv, abs=2e-6)


def test_kmeans_lloyd_step_counts_consistent_with_assignment(spark):
    from streaming_feature_store_spark.operators.similarity import (
        assign_clusters,
        kmeans_lloyd_step,
    )
    from streaming_feature_store_spark.sources.file import load_table

    vecs = load_table(
        spark, "/root/testdata/sf0.001", "embeddings"
    ).limit(100)
    step = kmeans_lloyd_step(vecs, k=4)
    sizes = {
        r["cluster_id"]: r["n_members"]
        for r in step.filter("dim_pos = 0").collect()
    }
    direct = {
        r["cluster_id"]: r["n"]
        for r in assign_clusters(vecs, k=4)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sizes == direct
    assert sum(sizes.values()) == 100


# -------------------------------------------------------------------- Z-order


def _interleave_py(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_interleave(spark):
    from streaming_feature_store_spark.operators.layout import zorder_key

    rows = [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.withColumn("z", zorder_key(["a", "b"], bits=8)).collect()
    for r in out:
        assert r["z"] == _interleave_py(r["a"], r["b"])


def test_zorder_key_rejects_long_overflow(spark):
    from streaming_feature_store_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits > signed long


def test_zorder_rank_bounds_and_null(spark):
    from streaming_feature_store_spark.operators.layout import zorder_rank

    df = spark.createDataFrame(
        [(0.0,), (2.5,), (10.0,), (None,)], "x double"
    )
    out = {
        (r["x"]): r["_zr_x"]
        for r in zorder_rank(df, ["x"], bits=4).collect()
    }
    assert out[0.0] == 0 and out[10.0] == 15  # endpoints hit the grid edges
    assert out[None] == 0
    assert 0 <= out[2.5] <= 15


def test_cluster_by_zorder_preserves_rows_and_localizes(spark):
    """Clustering must be a pure reshuffle (no row gain/loss), and the
    per-partition value spans on BOTH clustered columns must be narrower
    than the unclustered layout's — the property that makes parquet
    min/max pruning work."""
    from streaming_feature_store_spark.operators.layout import (
        cluster_by_zorder,
    )
    from streaming_feature_store_spark.sources.file import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    clustered = cluster_by_zorder(
        li, ["l_extendedprice", "l_quantity"], bits=8, num_partitions=8
    )
    assert clustered.count() == li.count()
    assert set(clustered.columns) == set(li.columns)

    def mean_span(df, col):
        spans = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .collect()[0][0]
        )
        return spans

    base = li.repartition(8)
    for col in ("l_extendedprice", "l_quantity"):
        assert mean_span(clustered, col) < mean_span(base, col)
