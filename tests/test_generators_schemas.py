"""Generator + schema tests, mirroring the reference's generator suite
(generators/test_generators.py:57-271): schema-field presence, value ranges,
fraud-rate sanity, determinism; plus v1→v2 schema-evolution reads."""

import pyspark.sql.functions as F

from streaming_feature_store_spark.schemas import (
    TRANSACTION_V1,
    TRANSACTION_V2,
    event_time,
    evolve_to,
    validate_enums,
)
from streaming_feature_store_spark.sources.generators import (
    generate_clicks,
    generate_devices,
    generate_transactions,
)


def test_transactions_schema_and_ranges(spark):
    tx = generate_transactions(spark, 2000, seed=42, fraud_rate=0.1)
    names = {f.name for f in TRANSACTION_V1.fields}
    assert names == set(tx.columns)
    stats = tx.agg(
        F.min("amount").alias("lo"),
        F.max("amount").alias("hi"),
        F.avg(F.col("is_fraud").cast("int")).alias("fr"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert stats["lo"] > 0 and stats["hi"] <= 10_000   # test_generators.py:90-93
    assert 0.05 < stats["fr"] < 0.2                    # fraud rate near nominal
    assert stats["n"] == 2000


def test_transactions_deterministic(spark):
    a = generate_transactions(spark, 500, seed=42).collect()
    b = generate_transactions(spark, 500, seed=42).collect()
    assert a == b


def test_fraud_signal_injected(spark):
    tx = generate_transactions(spark, 5000, seed=42, fraud_rate=0.2)
    sus = tx.filter(F.col("ip_address").rlike("^(tor_exit_|proxy_|vpn_)"))
    assert sus.count() > 0
    assert sus.filter(~F.col("is_fraud")).count() == 0  # only fraud rows get them


def test_clicks_sessions_consistent(spark):
    ck = generate_clicks(spark, 2000, seed=43)
    # a session never spans two users (base_generator session consistency)
    multi = ck.groupBy("session_id").agg(F.countDistinct("user_id").alias("u")).filter("u > 1")
    assert multi.count() == 0


def test_schema_evolution_v1_to_v2(spark):
    tx = generate_transactions(spark, 50)
    v2 = evolve_to(tx, TRANSACTION_V2)
    assert "risk_score" in v2.columns
    assert v2.filter(F.col("risk_score").isNotNull()).count() == 0  # defaulted null
    assert v2.count() == 50
    # unknown columns in the source are tolerated and dropped
    back = evolve_to(v2.withColumn("zzz_unknown", F.lit(1)), TRANSACTION_V1)
    assert "zzz_unknown" not in back.columns


def test_enum_validation_and_event_time(spark):
    tx = validate_enums(event_time(generate_transactions(spark, 100)))
    assert tx.filter(~F.col("currency_valid")).count() == 0
    assert dict(tx.dtypes)["ts"] == "timestamp"


def test_devices_generator(spark):
    d = generate_devices(spark, 300)
    assert d.count() == 300
    assert d.filter((F.col("risk_score") < 0) | (F.col("risk_score") > 1)).count() == 0


def test_format_matrix_round_trip(spark, tmp_path):
    """events survive a write→read round-trip through every batch format
    (orc/csv/json alongside the native parquet), with explicit DDL schemas
    on the text formats and value equality across the matrix."""
    from streaming_feature_store_spark.sources.file import (
        load_table,
        read_files,
        write_files,
    )

    src = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(200)
    )
    expected = {
        r["event_id"]: (r["user_id"], r["event_type"], r["value"])
        for r in src.collect()
    }
    ddl = "event_id bigint, user_id bigint, event_type string, value double"
    for fmt in ("parquet", "orc", "csv", "json"):
        path = str(tmp_path / fmt)
        write_files(src, path, format=fmt)
        schema = ddl if fmt in ("csv", "json") else None
        back = read_files(spark, path, format=fmt, schema=schema)
        got = {
            r["event_id"]: (r["user_id"], r["event_type"], r["value"])
            for r in back.collect()
        }
        assert got.keys() == expected.keys(), fmt
        for k, (u, t, v) in got.items():
            eu, et, ev = expected[k]
            assert (u, t) == (eu, et), (fmt, k)
            assert v == ev or abs(v - ev) < 1e-12, (fmt, k, v, ev)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_files(spark, str(tmp_path / "csv"), format="csv")


def test_partitioned_write_prunes(spark, tmp_path):
    """partition_by produces hive layout and a filter on the partition
    column prunes the scan to one directory (PartitionFilters in the
    physical plan)."""
    from streaming_feature_store_spark.sources.file import (
        load_table,
        read_files,
        write_files,
    )
    import pyspark.sql.functions as F

    src = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "event_type", "value")
        .limit(500)
    )
    path = str(tmp_path / "by_type")
    write_files(src, path, partition_by=("event_type",))
    back = read_files(spark, path).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan
    n_part = back.count()
    n_src = src.filter(F.col("event_type") == "purchase").count()
    assert n_part == n_src > 0
