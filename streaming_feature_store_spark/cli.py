"""Command-line entry points — the reference's script surface
(stream_processor/feature_job/train CLIs) condensed into one tool.

    python -m streaming_feature_store_spark.cli generate --kind transactions --n 100000 --out /tmp/tx
    python -m streaming_feature_store_spark.cli materialize --events /tmp/events --latest /tmp/latest --log /tmp/log
    python -m streaming_feature_store_spark.cli stream --src /tmp/incoming --latest /tmp/latest --log /tmp/log --checkpoint /tmp/ckpt
    python -m streaming_feature_store_spark.cli replay --log /tmp/log --latest /tmp/latest
    python -m streaming_feature_store_spark.cli query --name q01_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m streaming_feature_store_spark.cli profile --path /data/events.parquet
    python -m streaming_feature_store_spark.cli quality --path /data/lineitem.parquet \
        --rule 'neg_price:l_extendedprice < 0' --rule 'null_date:l_shipdate IS NULL' \
        --fail-on-violation
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="streaming_feature_store_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="seeded synthetic event generation (S12)")
    g.add_argument("--kind", choices=["transactions", "clicks", "devices"], required=True)
    g.add_argument("--n", type=int, default=100_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out", required=True)

    m = sub.add_parser("materialize", help="batch: events → latest view + feature log")
    m.add_argument("--events", required=True)
    m.add_argument("--latest", required=True)
    m.add_argument("--log", required=True)
    m.add_argument("--entity", default="user_id")

    s = sub.add_parser("stream", help="streaming pipeline over a file source")
    s.add_argument("--src", required=True)
    s.add_argument("--latest", required=True)
    s.add_argument("--log", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--entity", default="user_id")

    r = sub.add_parser("replay", help="rebuild latest view from the feature log (T11)")
    r.add_argument("--log", required=True)
    r.add_argument("--latest", required=True)
    r.add_argument("--entity", default="user_id")
    r.add_argument("--ts-col", default="window_start_s")

    q = sub.add_parser("query", help="run a catalog query and show the result")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    pr = sub.add_parser(
        "profile", help="per-column data-quality profile of any table"
    )
    pr.add_argument("--path", required=True)
    pr.add_argument("--format", default="parquet")
    pr.add_argument("--columns", default="", help="comma-separated subset")

    dq = sub.add_parser(
        "quality",
        help="declarative data-quality gate: named rules over any table",
    )
    dq.add_argument("--path", required=True)
    dq.add_argument("--format", default="parquet")
    dq.add_argument(
        "--rule",
        action="append",
        required=True,
        metavar="NAME:SQL_EXPR",
        help="violation condition as a SQL boolean expression, e.g. "
        "'neg_amount:amount < 0' (repeatable)",
    )
    dq.add_argument(
        "--fail-on-violation",
        action="store_true",
        help="exit 1 if any rule has violations (CI-gate mode)",
    )

    args = p.parse_args(argv)

    from streaming_feature_store_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "generate":
            from streaming_feature_store_spark.sources import generators as gen

            fn = {
                "transactions": gen.generate_transactions,
                "clicks": gen.generate_clicks,
                "devices": gen.generate_devices,
            }[args.kind]
            df = fn(spark, args.n, seed=args.seed)
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.n} {args.kind} to {args.out}")
        elif args.cmd == "materialize":
            from streaming_feature_store_spark.registry import default_registry
            from streaming_feature_store_spark.store import materialize

            events = spark.read.parquet(args.events)
            view = default_registry().views["transaction_stats_5m"]
            feats = materialize(spark, view, events, args.latest, args.log)
            print(f"materialized {feats.count()} feature rows")
        elif args.cmd == "stream":
            from streaming_feature_store_spark.streaming.pipeline import (
                read_file_stream,
                start_feature_pipeline,
            )

            schema = spark.read.parquet(args.src).schema
            stream = read_file_stream(spark, args.src, schema)
            q_ = start_feature_pipeline(
                spark, stream, args.latest, args.log,
                entity_col=args.entity, checkpoint=args.checkpoint,
            )
            q_.awaitTermination()
            print("stream drained (availableNow)")
        elif args.cmd == "replay":
            from streaming_feature_store_spark.store import replay

            replay(spark, args.log, args.latest, args.entity, args.ts_col)
            print(f"latest view rebuilt at {args.latest}")
        elif args.cmd == "query":
            from streaming_feature_store_spark.plans.queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query {args.name}; available: {sorted(QUERIES)}")
                return 2
            QUERIES[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        elif args.cmd == "profile":
            from streaming_feature_store_spark.operators.profile import (
                profile_columns,
            )
            from streaming_feature_store_spark.sources.file import read_files

            df = read_files(spark, args.path, format=args.format)
            cols = [c for c in args.columns.split(",") if c] or None
            profile_columns(df, cols).orderBy("column").show(100, truncate=False)
        elif args.cmd == "quality":
            import pyspark.sql.functions as F

            from streaming_feature_store_spark.operators.profile import (
                data_quality_report,
            )
            from streaming_feature_store_spark.sources.file import read_files

            rules = {}
            for spec in args.rule:
                name, _, expr = spec.partition(":")
                name = name.strip()
                if not expr:
                    print(f"bad --rule {spec!r}: expected NAME:SQL_EXPR")
                    return 2
                if name in rules:
                    # a silently-overwritten rule would drop a CI gate
                    print(f"duplicate rule name {name!r}")
                    return 2
                try:
                    rules[name] = F.expr(expr)
                except Exception as e:
                    print(f"bad --rule {spec!r}: {type(e).__name__}: {e}")
                    return 2
            df = read_files(spark, args.path, format=args.format)
            try:
                report = data_quality_report(df, rules).orderBy("rule")
                rows = report.collect()
            except Exception as e:
                # a rule referencing a missing column (or other analysis
                # failure) should exit cleanly, not stack-trace
                lines = [ln for ln in str(e).splitlines() if ln.strip()]
                msg = lines[0] if lines else type(e).__name__
                print(f"rule evaluation failed: {msg}")
                return 2
            for r in rows:
                print(
                    f"{r['rule']}: {r['n_violations']}/{r['n_rows']} "
                    f"({r['violation_rate']})"
                )
            if args.fail_on_violation and any(
                r["n_violations"] > 0 for r in rows
            ):
                return 1
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
