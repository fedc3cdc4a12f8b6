"""Shuffle/IO codec A/B (guide §2.3): lz4 (default) vs zstd on the
shuffle-heaviest catalog queries.  Codec is JVM-wide, so each arm runs
in a FRESH subprocess; arms are INTERLEAVED (lz4, zstd, lz4, ...) so
host-band drift lands on both, and per-query time is min over the
in-process reps of all rounds of that arm.

Usage: python tools/codec_ab_probe.py [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

QUERIES = [
    "q40_simhash_near_dups",
    "q214_leakage_screen",
    "q223_incremental_neardup_screen",
    "q119_brand_basket_lift",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from streaming_feature_store_spark.plans.queries import QUERIES
from streaming_feature_store_spark.session import get_spark

codec = sys.argv[1]
names = json.loads(sys.argv[2])
spark = get_spark("codec-ab-" + codec, configs={"spark.io.compression.codec": codec})
spark.sparkContext.setLogLevel("ERROR")

def force(df):
    df.write.mode("overwrite").format("noop").save()

force(spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) s"))
force(spark.read.parquet("/root/testdata/sf0.1/region.parquet").selectExpr("count(*) n"))
out = {}
for name in names:
    ts = []
    for _ in range(3):
        t0 = time.time()
        force(QUERIES[name](spark, "/root/testdata/sf0.1"))
        ts.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    out[name] = ts
print("RESULT " + json.dumps(out))
spark.stop()
"""


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or QUERIES
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CHILD % {"repo": repo}
    acc: dict[str, dict[str, list[float]]] = {c: {} for c in ("lz4", "zstd")}
    for r in range(rounds):
        for codec in ("lz4", "zstd"):
            p = subprocess.run(
                [sys.executable, "-c", script, codec, json.dumps(names)],
                capture_output=True,
                text=True,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(f"round {r} {codec}: FAILED\n{p.stderr[-2000:]}")
                continue
            res = json.loads(line[0][7:])
            for n, ts in res.items():
                acc[codec].setdefault(n, []).extend(ts)
            print(f"round {r} {codec}: " + json.dumps(res))
    print("\n=== min per arm ===")
    for n in names:
        a = min(acc["lz4"].get(n, [float("inf")]))
        b = min(acc["zstd"].get(n, [float("inf")]))
        print(f"{n}: lz4 {a}  zstd {b}  ({(b - a) / a * 100:+.1f}%)")


if __name__ == "__main__":
    main()
