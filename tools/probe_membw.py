"""Direct evidence for the memory-bandwidth ceiling claim in
BENCH/BASELINE.md: on this shared microVM, a DRAM-bandwidth-bound
stage runs at ~the same WALL time at 2 and at 8 cores (both saturate
the VM's allotted memory bus), so in a 2-vs-8 scaling window it
behaves as an Amdahl serial term that grows with data size — while
the adjacent pure-CPU calibration (cache-resident fixed work, what
``bench_scaling.calibrate`` runs) scales near-perfectly and cannot
flag it.  On a real cluster N vs 4N executors bring their own memory
buses, so this term scales with nodes.

Two probes, each at 2 and 8 worker processes:

1. ``numpy stream``: per-process out-of-cache array copy+add over a
   fixed TOTAL volume split across workers (the textbook STREAM
   shape) — pure DRAM, no Spark.
2. ``spark sort``: a Spark range -> repartition(hash) -> sort job
   over a fixed row count — the exchange+sort shape the dedup job's
   non-signature fraction is made of.

Writes BENCH/membw_probe.json: per-probe wall at each level, the
wall ratio (1.0 = no scaling: pure bandwidth bound; 4.0 = perfect
CPU scaling), plus the adjacent pure-CPU ceiling for contrast.

Usage: python tools/probe_membw.py [--gb 8] [--rows 40000000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _stream_worker(n_bytes: int) -> float:
    import numpy as np

    n = n_bytes // 8
    a = np.arange(n, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.perf_counter()
    for _ in range(4):
        np.add(a, 1.0, out=b)      # read a + write b: 2x volume
        np.add(b, 1.0, out=a)
    return time.perf_counter() - t0


def stream_probe(workers: int, total_gb: float) -> float:
    """Fixed TOTAL volume split across workers: perfect scaling halves
    wall when workers double; a saturated bus keeps wall flat."""
    per = int(total_gb * (1 << 30) / workers)
    with mp.Pool(workers) as p:
        t0 = time.perf_counter()
        p.map(_stream_worker, [per] * workers)
        return time.perf_counter() - t0


def spark_sort_child(cpus: int, rows: int) -> float:
    """One fresh-JVM Spark job: range -> exchange -> sort -> count."""
    code = f"""
import time
from t_digest_spark.session import build_session
from pyspark.sql import functions as F
spark = build_session("local[{cpus}]", {cpus}, app_name="membw-{cpus}",
    **{{"spark.driver.memory": "24g", "spark.ui.enabled": "false",
       "spark.sql.shuffle.partitions": "64",
       "spark.local.dir": "/dev/shm/spark-local"}})
spark.sparkContext.setLogLevel("ERROR")
df = (spark.range({rows})
      .select((F.col("id") * 2654435761 % 1000000007).alias("k"),
              F.col("id").alias("v")))
df.repartition(64, "k").sortWithinPartitions("k").count()  # warmup
t0 = time.perf_counter()
df.repartition(64, "k").sortWithinPartitions("k").count()
print("WALL", time.perf_counter() - t0)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("WALL"):
            return float(line.split()[1])
    raise RuntimeError(out.stdout + out.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=8.0)
    ap.add_argument("--rows", type=int, default=40_000_000)
    args = ap.parse_args()

    from bench_scaling import calibrate

    out: dict = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    cal = calibrate((2, 8))
    out["adjacent_cpu_ceiling_2v8"] = cal["ceiling"]

    s2 = stream_probe(2, args.gb)
    s8 = stream_probe(8, args.gb)
    out["numpy_stream"] = {
        "total_gb": args.gb, "wall_2w_s": round(s2, 3),
        "wall_8w_s": round(s8, 3),
        "speedup_2w_to_8w": round(s2 / s8, 3),
        "note": "4.0 = perfect CPU scaling; ~1.0 = bus saturated",
    }

    t2 = spark_sort_child(2, args.rows)
    t8 = spark_sort_child(8, args.rows)
    out["spark_exchange_sort"] = {
        "rows": args.rows, "wall_2c_s": round(t2, 3),
        "wall_8c_s": round(t8, 3),
        "speedup_2c_to_8c": round(t2 / t8, 3),
        "note": "the exchange+sort shape of the dedup job's "
                "non-signature fraction",
    }
    cal2 = calibrate((2, 8))
    out["adjacent_cpu_ceiling_2v8_after"] = cal2["ceiling"]

    path = os.path.join(REPO, "BENCH", "membw_probe.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
            hist = prev if isinstance(prev, list) else [prev]
    hist.append(out)
    with open(path, "w") as f:
        json.dump(hist, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
