"""Round-4 operators: SCD2 interval versioning (collapse branch) and
context-window sequence packing (straddle arithmetic)."""

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.curation import pack_sequences
from streaming_feature_store_spark.operators.history import scd2_history


def test_scd2_collapse_unchanged(spark):
    rows = [
        # user 1: A, A (no-op), B, B (no-op), A  -> versions A, B, A
        (1, 1, 100, "A"), (2, 1, 200, "A"), (3, 1, 300, "B"),
        (4, 1, 400, "B"), (5, 1, 500, "A"),
        # user 2: one row -> current from its ts
        (6, 2, 50, "Z"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long, v string")
    out = scd2_history(
        df, "user_id", "us", ["v"], "event_id", collapse_unchanged=True
    ).orderBy("user_id", "valid_from_us").collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["v"], r["valid_from_us"], r["valid_to_us"]) for r in u1] == [
        ("A", 100, 300), ("B", 300, 500), ("A", 500, None)
    ]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in out if r["user_id"] == 2]
    assert u2[0]["valid_from_us"] == 50 and u2[0]["is_current"]


def test_scd2_plain_intervals_cover_log(spark):
    rows = [(i, 1, i * 10, float(i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long, v double")
    out = scd2_history(df, "user_id", "us", ["v"], "event_id").collect()
    assert len(out) == 5
    assert sum(r["is_current"] for r in out) == 1
    # intervals chain: each valid_to equals the next valid_from
    ordered = sorted(out, key=lambda r: r["valid_from_us"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["valid_to_us"] == b["valid_from_us"]


def test_pack_sequences_straddle(spark):
    # one source, budget 10: docs of 4, 8, 9, 10 tokens
    #   offsets 0, 4, 12, 21 -> packs [0,0], [0,1], [1,2], [2,3]
    def doc(n):
        return " ".join(f"w{i}" for i in range(n))

    df = spark.createDataFrame(
        [(1, "s", doc(4)), (2, "s", doc(8)), (3, "s", doc(9)), (4, "s", doc(10))],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=10).collect()}
    assert (out[1]["first_pack"], out[1]["last_pack"]) == (0, 0)
    assert (out[2]["first_pack"], out[2]["last_pack"]) == (0, 1)
    assert (out[3]["first_pack"], out[3]["last_pack"]) == (1, 2)
    assert (out[4]["first_pack"], out[4]["last_pack"]) == (2, 3)
    assert out[4]["start_offset"] == 21 and out[4]["n_packs_spanned"] == 2
    # packing is per-group: a second source restarts at offset 0
    df2 = df.union(
        spark.createDataFrame([(9, "t", doc(3))], "doc_id long, source string, text string")
    )
    t = {r["doc_id"]: r for r in pack_sequences(df2, budget=10).collect()}
    assert t[9]["start_offset"] == 0 and t[9]["first_pack"] == 0
