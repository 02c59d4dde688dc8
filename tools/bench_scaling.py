"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs the IDENTICAL job — read materialized synthetic transcripts,
derive inter-turn latency via window lag, two-stage t-digest aggregate
by (role, ts_hour), extract p50/p99/p999 — at two parallelism levels
(local[8] and local[32], the sandbox stand-in for N vs 4N executors)
on the SAME input, and reports throughput at both plus
efficiency = (thr_32 / thr_8) / 4.

Each level runs in its own subprocess (fresh JVM) to avoid any
context reuse; per level: 1 warmup + ``--reps`` timed runs, best taken.

Usage: python tools/bench_scaling.py [--convs 300000] [--reps 2]
Writes BENCH/scaling.json and BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cpus: int, path: str, reps: int) -> dict:
    """Child-process entry: run the job at local[cpus]."""
    from pyspark.sql import functions as F

    from t_digest_spark.operators.aggregate import tdigest_aggregate
    from t_digest_spark.operators.extract import quantiles_of
    from t_digest_spark.session import build_session

    spark = build_session(
        f"local[{cpus}]", cpus, app_name=f"scaling-{cpus}",
        **{"spark.driver.memory": "40g", "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from t_digest_spark.sources.tables import turn_metrics

    def job():
        t = spark.read.parquet(path)
        m = turn_metrics(t).where(F.col("latency_s").isNotNull())
        agg = tdigest_aggregate(m, "latency_s", ["role", "ts_hour"])
        rows = agg.select(
            "role", "ts_hour", "rows",
            quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"),
        ).collect()
        return sum(r["rows"] for r in rows)

    job()  # warmup (JIT, python worker pool)
    times = []
    n = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n = job()
        times.append(time.perf_counter() - t0)
    spark.stop()
    best = min(times)
    return {"cpus": cpus, "rows": n, "times": [round(t, 3) for t in times],
            "best_sec": round(best, 3),
            "rows_per_sec": round(n / best, 1)}


def materialize(convs: int) -> str:
    from t_digest_spark.session import build_session
    from t_digest_spark.sources.tables import synth_transcripts

    path = f"/tmp/tdigest_bench/transcripts_{convs}_s42.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = build_session("local[32]", 32,
                              **{"spark.driver.memory": "40g",
                                 "spark.ui.enabled": "false"})
        spark.sparkContext.setLogLevel("ERROR")
        synth_transcripts(spark, n_convs=convs, seed=42, partitions=256,
                          with_text=False).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=3_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--path", type=str, default="")
    args = ap.parse_args()

    if args.child:
        print(json.dumps(run_one(args.child, args.path, args.reps)))
        return

    path = materialize(args.convs)
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus),
             "--path", path, "--reps", str(args.reps)],
            capture_output=True, text=True, cwd=REPO, check=True)
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(results[cpus])

    thr8 = results[8]["rows_per_sec"]
    thr32 = results[32]["rows_per_sec"]
    eff = thr32 / thr8 / (32 / 8)
    summary = {
        "job": "transcripts latency window-lag + t-digest by (role, ts_hour) "
               "+ p50/p99/p999 extract",
        "input_rows": results[32]["rows"],
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling & throughput evidence

## Scaling efficiency (north_rule: >=0.8 from N to 4N)

Same job, same input ({summary['input_rows']:,} turns with latency,
materialized synthetic transcripts, seed=42), two parallelism levels
(sandbox stand-in for N vs 4N executors per task instruction):

| parallelism | best wall (s) | turns/sec |
|---|---|---|
| local[8]  | {results[8]['best_sec']} | {thr8:,.0f} |
| local[32] | {results[32]['best_sec']} | {thr32:,.0f} |

**Scaling efficiency = (thr_32 / thr_8) / 4 = {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Job: read parquet -> window lag latency per (conv_id, turn_idx) ->
two-stage mergeable t-digest aggregate by (role, ts_hour) ->
p50/p99/p999 extraction.  Raw rows shuffle once (window); digests
(~1 KB) are the only aggregation shuffle payload.

## Reference throughput context

Reference MergingDigest.add(): ~140 ns/point single JVM thread
(README.md:23) = ~7.1M points/s.  Our core: ~225 ns/point single
Python worker; the Spark pipeline above includes parquet scan, window
shuffle, and Arrow transfer — end-to-end turns/sec is the honest
pipeline number, not a bare add() loop.
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
