"""As-of (point-in-time) join semantics: inclusive at equal timestamps,
null when nothing precedes, latest-wins among candidates
(feast/feature_utils.py:151-232 semantics)."""

from streaming_feature_store_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic(spark):
    feats = _df(
        spark,
        [(1, 100, 10, 1.0), (1, 200, 11, 2.0), (2, 150, 12, 9.0)],
        "user_id long, us long, event_id long, fval double",
    )
    labels = _df(
        spark,
        [(1, 150, 90), (1, 200, 91), (1, 50, 92), (3, 500, 93)],
        "user_id long, us long, event_id long",
    )
    out = {
        r["label_key"]: r
        for r in asof_join(
            labels, feats, "user_id", "us", "us", ["fval"], [], "event_id"
        ).collect()
    }
    assert out[90]["asof_fval"] == 1.0   # latest at/before 150
    assert out[91]["asof_fval"] == 2.0   # inclusive: feature AT label ts wins
    assert out[92]["asof_fval"] is None  # nothing precedes
    assert out[93]["asof_fval"] is None  # unseen entity


def test_asof_forward_and_tolerance(spark):
    feats = _df(
        spark,
        [(1, 100, 10, 1.0), (1, 200, 11, 2.0), (2, 150, 12, 9.0)],
        "user_id long, us long, event_id long, fval double",
    )
    labels = _df(
        spark,
        [(1, 150, 90), (1, 200, 91), (1, 250, 92), (3, 500, 93)],
        "user_id long, us long, event_id long",
    )
    fwd = {
        r["label_key"]: r
        for r in asof_join(
            labels, feats, "user_id", "us", "us", ["fval"], [],
            "event_id", direction="forward",
        ).collect()
    }
    assert fwd[90]["asof_fval"] == 2.0   # earliest at/after 150
    assert fwd[91]["asof_fval"] == 2.0   # inclusive: feature AT label ts wins
    assert fwd[92]["asof_fval"] is None  # nothing follows
    assert fwd[93]["asof_fval"] is None  # unseen entity

    # tolerance: backward match farther than 40us from the label nulls out
    tol = {
        r["label_key"]: r
        for r in asof_join(
            labels, feats, "user_id", "us", "us", ["fval"], [],
            "event_id", tolerance_us=40,
        ).collect()
    }
    assert tol[90]["asof_fval"] is None  # 150-100=50 > 40: stale
    assert tol[91]["asof_fval"] == 2.0   # exact hit, distance 0
    assert tol[92]["asof_fval"] is None  # 250-200=50 > 40: stale


def test_asof_tolerance_per_column_null_carry(spark):
    """Regression (ADVICE r3, medium): ignorenulls can carry a value from an
    OLDER row than the nearest feature row; the tolerance must gate against
    the timestamp of the row that supplied the value, per column."""
    feats = _df(
        spark,
        [(1, 100, 10, 1.0, 7.0), (1, 200, 11, None, 8.0)],
        "user_id long, us long, event_id long, fval double, gval double",
    )
    labels = _df(
        spark,
        [(1, 210, 90)],
        "user_id long, us long, event_id long",
    )
    row = asof_join(
        labels, feats, "user_id", "us", "us", ["fval", "gval"], [],
        "event_id", tolerance_us=40,
    ).collect()[0]
    # fval comes from ts=100 (110us stale > 40) → null, like merge_asof;
    # gval comes from ts=200 (10us stale) → survives.
    assert row["asof_fval"] is None
    assert row["asof_gval"] == 8.0

    # forward direction, same principle: value from a farther-future row
    # than the nearest one must be gated on its own timestamp
    ffeats = _df(
        spark,
        [(1, 220, 10, None, 8.0), (1, 400, 11, 1.0, 9.0)],
        "user_id long, us long, event_id long, fval double, gval double",
    )
    frow = asof_join(
        labels, ffeats, "user_id", "us", "us", ["fval", "gval"], [],
        "event_id", direction="forward", tolerance_us=40,
    ).collect()[0]
    assert frow["asof_fval"] is None   # from ts=400, 190us ahead
    assert frow["asof_gval"] == 8.0    # from ts=220, 10us ahead
