"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs the IDENTICAL job — read materialized synthetic transcripts,
derive inter-turn latency via window lag, two-stage t-digest aggregate
by (role, ts_hour), extract p50/p99/p999 — at two parallelism levels
N and 4N cores on the SAME input (the sandbox stand-in for N vs 4N
executors, per task instruction), and reports throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

Level choice: this sandbox is a shared/throttled VM.  A pure-CPU
calibration (fixed work per process, median of 5) shows the hardware
itself cannot scale 8->32 vCPUs at better than ~0.64 efficiency, while
4->16 reaches ~0.88.  The calibration runs first and is written into
the report so the job's efficiency can be judged against the hardware
ceiling.  Default levels: local[4] vs local[16].

Each level runs in its own subprocess (fresh JVM); per level: 1 warmup
+ ``--reps`` timed runs, median taken.  Shuffle partitions are held
constant across levels so both do identical work.

Usage: python tools/bench_scaling.py [--convs 3000000] [--reps 3]
Writes BENCH/scaling.json and BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS = (4, 16)
SHUFFLE_PARTITIONS = 64  # identical work at both levels


def _burn(_):
    x = 0.0
    for i in range(12_000_000):
        x += i * 1e-9
    return x


def calibrate() -> dict:
    """Pure-CPU fixed-work scaling ceiling of this machine."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for n in sorted(set(LEVELS)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            with mp.Pool(n) as p:
                p.map(burn, range(n))
            ts.append(time.perf_counter() - t0)
        out[n] = n / statistics.median(ts)
    out["ceiling"] = round(
        (out[LEVELS[1]] / out[LEVELS[0]]) / (LEVELS[1] / LEVELS[0]), 3)
    return out


def run_one(cpus: int, path: str, reps: int) -> dict:
    from pyspark.sql import functions as F

    from t_digest_spark.operators.extract import quantiles_of
    from t_digest_spark.session import build_session
    from t_digest_spark.sources.tables import latency_digests_clustered

    spark = build_session(
        f"local[{cpus}]", cpus, app_name=f"scaling-{cpus}",
        **{"spark.driver.memory": "40g", "spark.ui.enabled": "false",
           "spark.sql.shuffle.partitions": str(SHUFFLE_PARTITIONS),
           # one whole file per scan partition: never split a file
           # (clustered-lag contract) and never pack several into one
           # task — 256 equal tasks balance both core counts
           "spark.sql.files.openCostInBytes": str(128 << 20),
           # tmpfs shuffle dirs: the sandbox disk shows multi-x run-to-run
           # variance from writeback stalls; RAM-backed local dirs make
           # the measurement about compute, not the VM's block device
           "spark.local.dir": "/dev/shm/spark-local"})
    # NOTE round 2: the round-1 ParallelGC -Xmn12g tuning is GONE — with
    # the fused one-pass kernel it was measured 5x slower on the pure
    # scan phase at 16 cores (12 GB young-gen copies with default GC
    # thread count on an oversubscribed VM); default G1 wins on the
    # full job at both core counts now that the python kernel dominates
    spark.sparkContext.setLogLevel("ERROR")

    def job():
        # fused clustered lag + partial digests (materialized input is
        # conv-clustered, sorted within files): raw rows cross Python
        # ONCE; only ~1 KB digest rows cross the single Exchange
        t = spark.read.parquet(path)
        agg = latency_digests_clustered(t, ["role", "ts_hour"])
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
    med = statistics.median(times)
    return {"cpus": cpus, "rows": n, "times": [round(t, 3) for t in times],
            "median_sec": round(med, 3),
            "rows_per_sec": round(n / med, 1)}


def materialize(convs: int) -> str:
    from t_digest_spark.session import build_session
    from t_digest_spark.sources.tables import synth_transcripts

    # prefer tmpfs (RAM-backed) input when available - removes block-
    # device variance from the measurement
    shm = f"/dev/shm/tdigest_input/transcripts_{convs}_s42.parquet"
    if os.path.exists(os.path.join(shm, "_SUCCESS")):
        return shm
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--path", type=str, default="")
    args = ap.parse_args()

    if args.child:
        print(json.dumps(run_one(args.child, args.path, args.reps)))
        return

    cal = calibrate()
    print("hardware calibration:", cal)
    path = materialize(args.convs)

    def child(cpus: int, reps: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus),
             "--path", path, "--reps", str(reps)],
            capture_output=True, text=True, cwd=REPO, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # the sandbox's effective speed drifts ~2x over minutes (host-level
    # steal, invisible to the guest) — so measure the two levels in
    # temporally adjacent PAIRS and take the median of per-pair ratios
    lo, hi = LEVELS
    pairs = []
    results = {lo: None, hi: None}
    for i in range(args.pairs):
        # alternate order within pairs to de-bias monotone drift
        if i % 2 == 0:
            r_lo = child(lo, 1)
            r_hi = child(hi, 1)
        else:
            r_hi = child(hi, 1)
            r_lo = child(lo, 1)
        pairs.append({"pair": i, "lo": r_lo, "hi": r_hi,
                      "ratio": r_hi["rows_per_sec"] / r_lo["rows_per_sec"]})
        print(pairs[-1])
        if results[lo] is None or \
                r_lo["rows_per_sec"] > results[lo]["rows_per_sec"]:
            results[lo] = r_lo
        if results[hi] is None or \
                r_hi["rows_per_sec"] > results[hi]["rows_per_sec"]:
            results[hi] = r_hi
    ratios = sorted(p["ratio"] for p in pairs)
    med_ratio = ratios[len(ratios) // 2]
    thr_lo = results[lo]["rows_per_sec"]
    thr_hi = results[hi]["rows_per_sec"]
    eff = med_ratio / (hi / lo)
    summary = {
        "job": "transcripts latency clustered shuffle-free lag + t-digest "
               "by (role, ts_hour) + p50/p99/p999 extract",
        "input_rows": results[hi]["rows"],
        "levels": list(LEVELS),
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        "pair_ratios": [round(r, 3) for r in ratios],
        "scaling_efficiency": round(eff, 3),
        "hardware_cpu_ceiling": cal["ceiling"],
        "efficiency_vs_ceiling": round(eff / cal["ceiling"], 3),
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
N={lo} and 4N={hi} cores (sandbox stand-in for N vs 4N executors per
task instruction), shuffle partitions held constant.  Because the
sandbox's effective speed drifts ~2x over minutes (host-level steal),
the levels run in {args.pairs} temporally adjacent pairs; efficiency is
the median of per-pair throughput ratios / 4.  Best observed per level:

| parallelism | best wall (s) | best turns/sec |
|---|---|---|
| local[{lo}]  | {results[lo]['median_sec']} | {thr_lo:,.0f} |
| local[{hi}] | {results[hi]['median_sec']} | {thr_hi:,.0f} |

per-pair throughput ratios: {[round(r, 2) for r in ratios]}

**Scaling efficiency = median ratio / 4 = {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

### Hardware context

This sandbox is a shared/throttled microVM.  Pure-CPU fixed-work
calibration (no Spark, median of 5): {lo} procs = {cal[lo]:.1f} units/s,
{hi} procs = {cal[hi]:.1f} units/s → the hardware itself scales {lo}->{hi}
at {cal['ceiling']:.3f} efficiency.  (8->32 vCPUs calibrates at ~0.64 —
beyond ~16 runnable threads the VM stops adding throughput, which is
why the levels are {lo}/{hi}.)  The job reaches
{summary['efficiency_vs_ceiling']:.0%} of the hardware ceiling.

Job: read parquet -> shuffle-free clustered lag latency per
(conv_id, turn_idx) via mapInArrow (input is conv-clustered and
sorted within files; window fallback tested bit-equal) -> two-stage
mergeable t-digest aggregate by (role, ts_hour) -> p50/p99/p999
extraction.  Raw rows NEVER shuffle; digests (~1 KB) are the only
shuffle payload in the whole job.

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
