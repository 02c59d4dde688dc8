"""Per-stage attribution of the minhash_dedup scaling job.

Same methodology as profile_scaling.py (which profiled the flagship
digest job and found the stage-2 applyInPandas bottleneck): run the
EXACT bench_dedup job once at a given core count with the Spark event
log on, parse into a per-stage table — wall, summed task run/cpu time,
GC, shuffle write/fetch, occupancy — plus the driver gap (job launch /
planning / per-round convergence actions), the serial Amdahl term.

Compare --cpus 2 vs --cpus 8: components whose absolute seconds don't
shrink ~4x are the non-scaling fraction.

Usage: python tools/profile_dedup.py --cpus 2 [--docs 400000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_dedup import corpus  # noqa: E402
from profile_scaling import parse_eventlog  # noqa: E402


def run_profiled(cpus: int, n_docs: int, cluster_size: int,
                 dup_frac: float, reps: int) -> dict:
    from t_digest_spark.operators.dedup import minhash_dedup
    from t_digest_spark.session import build_session

    evdir = f"/tmp/tdigest_dedup_eventlog_{cpus}_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    spark = build_session(
        f"local[{cpus}]", cpus, app_name=f"profile-dedup-{cpus}",
        **{"spark.driver.memory": "24g", "spark.ui.enabled": "false",
           "spark.sql.shuffle.partitions": "64",
           "spark.sql.files.openCostInBytes": str(128 << 20),
           "spark.local.dir": "/dev/shm/spark-local",
           "spark.eventLog.enabled": "true",
           "spark.eventLog.compress": "false",
           "spark.eventLog.rolling.enabled": "false",
           "spark.eventLog.dir": f"file://{evdir}"})
    spark.sparkContext.setLogLevel("ERROR")
    df, expected = corpus(spark, n_docs, cluster_size, dup_frac)
    path = f"/dev/shm/tdigest_input/dedup_{n_docs}_{cluster_size}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.repartition(64).write.mode("overwrite").parquet(path)

    def job() -> int:
        docs = spark.read.parquet(path)
        dec = minhash_dedup(docs, "text", "doc_id", k_shingle=5,
                            num_perm=64, bands=16)
        return dec.where("is_keeper").count()

    assert job() == expected  # warmup
    marks = []
    for _ in range(reps):
        t0 = time.time()
        assert job() == expected
        marks.append((t0, time.time()))
    spark.stop()
    time.sleep(1.0)
    logs = sorted(glob.glob(os.path.join(evdir, "*")),
                  key=os.path.getmtime)
    return parse_eventlog(logs[-1], marks, cpus)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cluster-size", type=int, default=100)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    print(json.dumps(run_profiled(args.cpus, args.docs,
                                  args.cluster_size, args.dup_frac,
                                  args.reps), indent=2))


if __name__ == "__main__":
    main()
