"""q39/q40 noise-band A/B (round 10, VERDICT r9 item #6).

q39_minhash_near_dups drifted 1.60 -> 2.41 s across r8/r9 bench runs with
UNTOUCHED lineage; q40 shows the same shape.  Both run the Arrow-batched
shingle kernel (dedup._shingle_index) — the only hot Python-worker path in
the dedup family — so the suspects are Python-worker lifecycle effects,
not the plan.  This probe pins it: each VARIANT runs in a FRESH JVM
(subprocess) and repeats q39+q40 at sf0.1 several times, so we can
separate (a) within-JVM rep noise, (b) across-JVM variance, and
(c) config effects:

- stock        : session.get_spark defaults (worker reuse ON)
- noreuse      : spark.python.worker.reuse=false (fresh worker per task —
                 if reuse-related state/GC is the noise, this shifts it)
- batch2k      : arrow maxRecordsPerBatch=2000 (smaller kernel batches)
- batch100k    : arrow maxRecordsPerBatch=100000 (one batch per partition)

Usage:
  python tools/noise_ab_probe.py              # parent: run all variants
  python tools/noise_ab_probe.py CHILD <variant> <sf_dir> <reps>  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

VARIANTS: dict[str, dict[str, str]] = {
    "stock": {},
    "noreuse": {"spark.python.worker.reuse": "false"},
    "batch2k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
    "batch100k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "100000"},
}

QUERIES = ("q39_minhash_near_dups", "q40_simhash_near_dups")


def child(variant: str, sf_dir: str, reps: int) -> None:
    sys.path.insert(0, "/root/repo")
    from streaming_feature_store_spark.session import get_spark

    spark = get_spark(f"noise-ab-{variant}", configs=VARIANTS[variant])
    spark.sparkContext.setLogLevel("ERROR")
    from streaming_feature_store_spark.plans.queries import QUERIES as CAT

    out: dict[str, list[float]] = {q: [] for q in QUERIES}
    for rep in range(reps):
        for q in QUERIES:
            spark.catalog.clearCache()
            t0 = time.monotonic()
            CAT[q](spark, sf_dir).collect()
            out[q].append(round(time.monotonic() - t0, 3))
    print("CHILD_RESULT " + json.dumps({"variant": variant, "times": out}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "CHILD":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    jvms = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    results: list[dict] = []
    for variant in VARIANTS:
        for seed in range(jvms):
            r = subprocess.run(
                [sys.executable, __file__, "CHILD", variant, sf_dir, str(reps)],
                capture_output=True,
                text=True,
                timeout=900,
                env={**os.environ, "SPARK_UI_ENABLED": "false"},
            )
            line = next(
                (
                    ln
                    for ln in r.stdout.splitlines()
                    if ln.startswith("CHILD_RESULT ")
                ),
                None,
            )
            if line is None:
                print(f"{variant} jvm{seed}: FAILED\n{r.stderr[-2000:]}")
                continue
            rec = json.loads(line[len("CHILD_RESULT "):])
            rec["jvm"] = seed
            results.append(rec)
            for q, ts in rec["times"].items():
                print(
                    f"{variant:10s} jvm{seed} {q}: "
                    f"min={min(ts):.2f} med={sorted(ts)[len(ts)//2]:.2f} "
                    f"max={max(ts):.2f}  {ts}"
                )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
