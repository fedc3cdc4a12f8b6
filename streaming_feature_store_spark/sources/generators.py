"""Synthetic event generators as Spark jobs (S12).

Reference parity: seeded fraud-labelled transaction generation
(generators/txgen.py:94-154) and Markov-ish clickstream generation
(generators/clickgen.py:180-239), re-expressed as **distributed column
expressions over spark.range(n)** — no driver-side loops, no Python UDFs:
``rand(seed)``/deterministic hashing give reproducible streams at any scale
(generating 10^12 events is just ``spark.range`` with more partitions).

For a live stream the same expressions apply to ``format("rate")`` —
``rate_stream_transactions`` below.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MCCS = ("5411", "5542", "5812", "5311", "5967", "7011", "4511", "6011", "7995")
HIGH_RISK_MCC = ("6011", "5967", "7011", "7995")  # transaction.py:75
COUNTRIES = ("US", "GB", "CA", "FR", "DE")
HIGH_RISK_COUNTRIES = ("CN", "RU", "NG", "BR", "MX")  # txgen.py:72-86
CURRENCIES = ("USD", "EUR", "GBP", "CAD", "AUD")
PAGE_TYPES = ("HOME", "PRODUCT", "CATEGORY", "CART", "CHECKOUT", "PROFILE", "OTHER")
ACTIONS = ("VIEW", "CLICK", "ADD_TO_CART", "REMOVE_FROM_CART", "PURCHASE", "SEARCH")


def _pick(arr: tuple[str, ...], h) -> F.Column:
    """Deterministic element pick by non-negative hash."""
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (h % len(arr) + 1).cast("int"))


def generate_transactions(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    fraud_rate: float = 0.02,
    n_cards: int = 50_000,
    start_ms: int = 1_704_067_200_000,  # 2024-01-01 UTC
    rate_per_s: float = 20.0,
) -> DataFrame:
    """n seeded transactions with fraud-pattern injection: fraud rows bias to
    high-risk MCC/country, suspicious IP prefixes, device-pool reuse, and
    round/extreme amounts (txgen.py:100-210,286-291)."""
    df = spark.range(n).withColumn("u1", F.rand(seed)).withColumn("u2", F.rand(seed + 1))
    h = F.xxhash64("id")
    ha = F.abs(h)
    is_fraud = F.col("u1") < fraud_rate
    base_amount = F.round(F.lit(5.0) + F.col("u2") * 195.0, 2)
    fraud_amount = F.when(
        ha % 3 == 0, F.element_at(F.array(*[F.lit(x) for x in (100.0, 250.0, 500.0, 1000.0, 2000.0, 5000.0)]), (ha % 6 + 1).cast("int"))
    ).otherwise(F.round(base_amount * 6, 2))
    card_pool = F.when(is_fraud & (ha % 10 < 3), ha % 200).otherwise(ha % n_cards)
    return df.select(
        F.format_string("txn_%012x", "id").alias("txn_id"),
        F.format_string("card_%08d", (card_pool + 1000).cast("long")).alias("card_id"),
        F.format_string("user_%06d", (ha % 10_000).cast("long")).alias("user_id"),
        F.when(is_fraud, fraud_amount).otherwise(base_amount).alias("amount"),
        _pick(CURRENCIES, ha).alias("currency"),
        F.when(is_fraud & (F.abs(F.xxhash64("id", F.lit(1))) % 2 == 0), _pick(HIGH_RISK_MCC, ha))
        .otherwise(_pick(MCCS, ha))
        .alias("mcc"),
        F.when(is_fraud & (ha % 10 < 3), F.format_string("dev_%04d", (ha % 50 + 1000).cast("long")))
        .otherwise(F.format_string("dev_%012x", F.abs(F.xxhash64("id", F.lit(2)))))
        .alias("device_id"),
        F.when(
            is_fraud & (ha % 4 == 0),
            F.concat(_pick(("tor_exit_", "proxy_", "vpn_"), ha), F.lit("10.0.0.1")),
        )
        .otherwise(
            F.format_string(
                "192.%d.%d.%d", (ha % 256).cast("int"),
                (F.abs(F.xxhash64("id", F.lit(3))) % 256).cast("int"),
                (F.abs(F.xxhash64("id", F.lit(4))) % 256).cast("int"),
            )
        )
        .alias("ip_address"),
        F.when(is_fraud & (ha % 3 == 0), _pick(HIGH_RISK_COUNTRIES, ha))
        .otherwise(_pick(COUNTRIES, ha))
        .alias("geo_country"),
        F.lit(None).cast("string").alias("geo_city"),
        # deterministic geography: each card transacts near a hash-derived
        # home point; fraud rows teleport to an independent location — the
        # planted signal geo.impossible_travel recovers (the reference
        # schema declares these fields but its generator leaves them null,
        # txgen.py; populating them keeps the v1 schema and adds signal)
        F.when(
            is_fraud & (ha % 2 == 0),
            (F.abs(F.xxhash64("id", F.lit(6))) % 14000) / 100.0 - 70.0,
        )
        .otherwise(
            (F.abs(F.xxhash64(F.format_string(
                "card_%08d", (card_pool + 1000).cast("long")))) % 14000)
            / 100.0 - 70.0
            + (F.abs(F.xxhash64("id", F.lit(7))) % 100) / 100000.0
        )
        .alias("geo_lat"),
        F.when(
            is_fraud & (ha % 2 == 0),
            (F.abs(F.xxhash64("id", F.lit(8))) % 36000) / 100.0 - 180.0,
        )
        .otherwise(
            (F.abs(F.xxhash64(F.concat(F.lit("lon"), F.format_string(
                "card_%08d", (card_pool + 1000).cast("long"))))) % 36000)
            / 100.0 - 180.0
            + (F.abs(F.xxhash64("id", F.lit(9))) % 100) / 100000.0
        )
        .alias("geo_lon"),
        (F.lit(start_ms) + (F.col("id") * F.lit(int(1000 / rate_per_s))).cast("long")
         + (F.abs(F.xxhash64("id", F.lit(5))) % 30_000) - 15_000).alias("timestamp"),
        F.lit(None).cast("long").alias("processing_time"),
        is_fraud.alias("is_fraud"),
        F.create_map(F.lit("channel"), _pick(("web", "pos", "app"), ha)).alias("metadata"),
    )


def generate_clicks(
    spark: SparkSession,
    n: int,
    seed: int = 43,
    n_users: int = 10_000,
    start_ms: int = 1_704_067_200_000,
    rate_per_s: float = 8.0,
) -> DataFrame:
    """n seeded clickstream events with session structure: a user's events
    chain into ~30-minute sessions (session id derived from user + time
    bucket, matching base_generator.py:275,291-294's expiry model)."""
    df = spark.range(n).withColumn("u1", F.rand(seed))
    h = F.xxhash64("id")
    ha = F.abs(h)
    ts = (
        F.lit(start_ms)
        + (F.col("id") * F.lit(int(1000 / rate_per_s))).cast("long")
        + (F.abs(F.xxhash64("id", F.lit(5))) % 10_000)
    )
    user = ha % n_users
    session_bucket = (ts / F.lit(1_800_000)).cast("long")
    page = _pick(PAGE_TYPES, ha)
    return df.select(
        F.format_string("click_%012x", "id").alias("event_id"),
        F.format_string("user_%06d", user.cast("long")).alias("user_id"),
        F.md5(F.concat(user.cast("string"), F.lit(":"), session_bucket.cast("string")))
        .substr(1, 12)
        .alias("session_id"),
        F.concat(F.lit("https://ecommerce-demo.com/"), F.lower(page)).alias("page_url"),
        page.alias("page_type"),
        F.when(page.isin("PRODUCT", "CART"), F.format_string("prod_%06d", (ha % 500).cast("long")))
        .alias("item_id"),
        F.when(page.isin("PRODUCT", "CATEGORY"), _pick(("electronics", "clothing", "books", "home", "sports"), ha))
        .alias("category_id"),
        F.when(page == "CART", F.lit("ADD_TO_CART"))
        .when(page == "CHECKOUT", F.lit("PURCHASE"))
        .otherwise(_pick(("VIEW", "CLICK", "SEARCH"), ha))
        .alias("action_type"),
        F.when(ha % 3 == 0, F.lit("https://google.com")).alias("referrer_url"),
        F.format_string("dev_%012x", F.abs(F.xxhash64("id", F.lit(2)))).alias("device_id"),
        F.lit("Mozilla/5.0").alias("user_agent"),
        F.format_string("10.%d.%d.%d", (ha % 256).cast("int"),
                        (F.abs(F.xxhash64("id", F.lit(3))) % 256).cast("int"),
                        (F.abs(F.xxhash64("id", F.lit(4))) % 256).cast("int")).alias("ip_address"),
        F.when(F.col("id") % 7 != 0, (ha % 299_000 + 1000)).cast("long").alias("dwell_time_ms"),
        F.round(F.col("u1"), 3).alias("scroll_depth"),
        ts.alias("timestamp"),
        F.lit(None).cast("long").alias("processing_time"),
        F.when(ha % 2 == 0, F.array(_pick(("exp_a", "exp_b", "exp_c"), ha)))
        .otherwise(F.array().cast("array<string>"))
        .alias("experiment_ids"),
        F.create_map(F.lit("device_type"), _pick(("desktop", "mobile", "tablet"), ha)).alias("metadata"),
    )


def generate_devices(
    spark: SparkSession,
    n: int,
    seed: int = 44,
    start_ms: int = 1_704_067_200_000,
) -> DataFrame:
    """Device-profile enrichment table (devices.v1.avsc; consumed by the
    stream-stream device join J2 that the reference declared but never
    built — DesignDoc.md:81)."""
    df = spark.range(n)
    h = F.abs(F.xxhash64("id"))
    return df.select(
        F.format_string("dev_%012x", h).alias("device_id"),
        F.md5(F.col("id").cast("string")).alias("fingerprint_hash"),
        F.lit("Mozilla/5.0").alias("user_agent"),
        _pick(("chrome", "firefox", "safari"), h).alias("browser"),
        _pick(("linux", "macos", "windows", "android", "ios"), h).alias("os"),
        _pick(("DESKTOP", "MOBILE", "TABLET", "BOT", "UNKNOWN"), h).alias("device_type"),
        F.lit(None).cast("string").alias("screen_resolution"),
        F.lit(None).cast("string").alias("timezone"),
        F.lit(None).cast("string").alias("language"),
        F.array().cast("array<string>").alias("plugins"),
        F.format_string("172.16.%d.%d", (h % 256).cast("int"), (h % 199).cast("int")).alias("ip_address"),
        _pick(COUNTRIES + HIGH_RISK_COUNTRIES, h).alias("geo_country"),
        F.lit(None).cast("string").alias("geo_region"),
        F.lit(None).cast("string").alias("isp"),
        (h % 20 == 0).alias("is_proxy"),
        (h % 50 == 0).alias("is_tor"),
        F.round((h % 1000) / 1000.0, 3).alias("risk_score"),
        (F.lit(start_ms) - h % 86_400_000).alias("first_seen"),
        (F.lit(start_ms) + (F.col("id") * 50)).alias("last_seen"),
        (h % 10_000).alias("total_events"),
        (F.lit(start_ms) + (F.col("id") * 50)).alias("timestamp"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )


def rate_stream_transactions(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Live synthetic stream: the rate source's (timestamp, value) feeds the
    same deterministic expressions — the streaming twin of
    ``generate_transactions`` for demos/load tests."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "id")
    )
    h = F.abs(F.xxhash64("id"))
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.format_string("card_%08d", (h % 50_000).cast("long")).alias("card_id"),
        F.round((h % 19_900) / 100.0 + 1.0, 2).alias("amount"),
        _pick(MCCS, h).alias("mcc"),
        (h % 50 == 0).alias("is_fraud"),
    )
