"""Throughput + N-vs-4N scaling evidence for the cluster-scale dedup
operator (minhash_dedup: signatures -> banded buckets -> O(k) candidate
edges -> min-label components).

The driver testdata documents tables are tiny (5k docs at sf0.1), so
this bench synthesizes a deterministic corpus with Spark expressions
only (no external data): ``--docs`` documents of 40 hash-derived words
each; the first ``--dup-frac`` of ids form duplicate clusters of
``--cluster-size`` identical documents, the rest are unique.  The
correct keeper count is known in closed form and asserted every run.

Levels run in separate subprocesses (fresh JVM), temporally adjacent,
same input seedless-deterministic corpus.  Output appends to
BENCH/dedup_scaling.json.

Usage: python tools/bench_dedup.py [--docs 400000] [--levels 2,8]
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


def corpus(spark, n_docs: int, cluster_size: int, dup_frac: float):
    """Deterministic synthetic corpus: duplicate clusters + uniques.

    ids [0, n_dup) share one text per ``cluster_size``-sized cluster;
    ids [n_dup, n_docs) are unique.  Text = 40 tokens derived from
    xxhash64 of (seed_id, position) — pure JVM expressions."""
    from pyspark.sql import functions as F

    n_dup = int(n_docs * dup_frac)
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    seed = F.when(F.col("doc_id") < n_dup,
                  (F.col("doc_id") / cluster_size).cast("long")
                  + 10_000_000_000
                  ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(F.lit("w"),
                           F.pmod(F.xxhash64(seed, i), F.lit(50_000))))
    expected_keepers = (n_docs - n_dup) + (n_dup + cluster_size - 1) \
        // cluster_size
    return base.withColumn("text", F.concat_ws(" ", words)), \
        expected_keepers


def run_one(cpus: int, n_docs: int, cluster_size: int,
            dup_frac: float, reps: int) -> dict:
    from pyspark.sql import functions as F

    from t_digest_spark.operators.dedup import minhash_dedup
    from t_digest_spark.session import build_session

    spark = build_session(
        f"local[{cpus}]", cpus, app_name=f"dedup-scaling-{cpus}",
        **{"spark.driver.memory": "24g", "spark.ui.enabled": "false",
           "spark.sql.shuffle.partitions": "64",
           "spark.local.dir": "/dev/shm/spark-local"})
    spark.sparkContext.setLogLevel("ERROR")
    df, expected = corpus(spark, n_docs, cluster_size, dup_frac)
    # materialize the corpus so generation cost is excluded; tmpfs
    path = f"/dev/shm/tdigest_input/dedup_{n_docs}_{cluster_size}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.repartition(64).write.mode("overwrite").parquet(path)

    def job() -> int:
        docs = spark.read.parquet(path)
        dec = minhash_dedup(docs, "text", "doc_id", k_shingle=5,
                            num_perm=64, bands=16)
        return dec.where("is_keeper").count()

    keepers = job()  # warmup
    assert keepers == expected, (keepers, expected)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        assert job() == expected
        times.append(time.perf_counter() - t0)
    spark.stop()
    med = statistics.median(times)
    return {"cpus": cpus, "docs": n_docs, "keepers": keepers,
            "times": [round(t, 3) for t in times],
            "median_sec": round(med, 3),
            "docs_per_sec": round(n_docs / med, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cluster-size", type=int, default=100)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--levels", type=str, default="2,8")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args()

    if args.child:
        print(json.dumps(run_one(args.child, args.docs,
                                 args.cluster_size, args.dup_frac,
                                 args.reps)))
        return

    lo, hi = (int(x) for x in args.levels.split(","))

    def child(cpus: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(cpus), "--docs", str(args.docs),
             "--cluster-size", str(args.cluster_size),
             "--dup-frac", str(args.dup_frac),
             "--reps", str(args.reps)],
            capture_output=True, text=True, cwd=REPO, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    r_lo = child(lo)
    r_hi = child(hi)
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    summary = {
        "job": "minhash_dedup keep/drop (64 perms, 16 bands, "
               "components to fixpoint)",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "docs": args.docs,
        "cluster_size": args.cluster_size,
        "dup_frac": args.dup_frac,
        f"local{lo}": r_lo,
        f"local{hi}": r_hi,
        "efficiency": round(eff, 3),
    }
    out_path = os.path.join(REPO, "BENCH", "dedup_scaling.json")
    hist = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            hist = json.load(f)
    hist.append(summary)
    with open(out_path, "w") as f:
        json.dump(hist, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
