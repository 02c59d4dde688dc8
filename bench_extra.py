"""Extra benchmark instrumentation for the optimization rounds
(bench.py itself is frozen for the driver's measurement).

Per headline query, isolates the pipeline phases with the noop sink
(guide §1.4) so the computation is timed, not the collect, and brackets
every rep set with a fixed-work N-PROCESS calibration burn so records
self-identify multi-core host steal (the failure mode single-thread
calibration cannot see — VERDICT r5 "What's wrong" #2).

Phases per query:
  scan        — narrow column scan only (noop)
  partial     — stage-1 mapInArrow partial digests (noop)
  agg         — partials + merge stage (noop)
  full        — the exact bench.py query incl. extract + collect

Prints ONE JSON line; also appends to BENCH/bench_extra_history.json.

Usage: python bench_extra.py [--reps 5] [--queries q1,q3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_CONVS", "300000"))


def _burn(_):
    x = 0.0
    for i in range(12_000_000):
        x += i * 1e-9
    return x


def calibrate(n: int, reps: int = 2) -> float:
    """Wall seconds for n processes each doing the fixed burn — the
    multi-core steal probe.  Unthrottled n<=cores expectation: ~ the
    single-thread burn time (~0.65 s nominal)."""
    import multiprocessing as mp

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        with mp.Pool(n) as p:
            p.map(_burn, range(n))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--queries", type=str, default="q1,q2,q3,q4")
    args = ap.parse_args()
    wanted = set(args.queries.split(","))

    from pyspark.sql import functions as F

    from bench import _transcripts_path
    from t_digest_spark.operators.aggregate import (
        partial_digests, tdigest_aggregate,
    )
    from t_digest_spark.operators.extract import quantiles_of, trimmed_mean_of
    from t_digest_spark.session import build_session
    from t_digest_spark.sources.tables import (
        latency_digests_clustered, load_table,
    )

    spark = build_session(f"local[{CPUS}]", CPUS, app_name="bench-extra",
                          **{"spark.driver.memory": "16g",
                             "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    events = load_table(spark, SF_DIR, "events")
    li = load_table(spark, SF_DIR, "lineitem")
    tpath = _transcripts_path(spark)
    t = spark.read.parquet(tpath)

    def q1_phases():
        narrow = events.select("event_type", "value")
        agg = tdigest_aggregate(events, "value", ["event_type"])
        return {
            "scan": lambda: noop(narrow),
            "partial": lambda: noop(partial_digests(
                events, "value", ["event_type"])),
            "agg": lambda: noop(agg),
            "full": lambda: (agg.select(
                "event_type",
                quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"),
            ).collect(), events.count()),
        }

    def q2_phases():
        agg = tdigest_aggregate(li, "l_extendedprice", tree=True)
        return {
            "scan": lambda: noop(li.select("l_extendedprice")),
            "partial": lambda: noop(partial_digests(li, "l_extendedprice")),
            "agg": lambda: noop(agg),
            "full": lambda: (agg.select(
                quantiles_of("digest", [0.01, 0.5, 0.99]).alias("qs")
            ).collect(), li.count()),
        }

    def q3_phases():
        narrow = t.select("conv_id", "turn_idx", "role", "ts")
        agg = latency_digests_clustered(t, ["role", "ts_hour"])
        return {
            "scan": lambda: noop(narrow),
            "agg": lambda: noop(agg),
            "full": lambda: agg.select(
                "role", "ts_hour", "rows",
                quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"),
            ).collect(),
        }

    def q4_phases():
        agg = tdigest_aggregate(li, "l_extendedprice",
                                ["l_returnflag", "l_linestatus"])
        return {
            "partial": lambda: noop(partial_digests(
                li, "l_extendedprice", ["l_returnflag", "l_linestatus"])),
            "agg": lambda: noop(agg),
            "full": lambda: (agg.select(
                "l_returnflag", "l_linestatus",
                quantiles_of("digest", [0.5, 0.95]).alias("qs"),
                trimmed_mean_of("digest", 0.05, 0.95).alias("tmean"),
            ).collect(), li.count()),
        }

    queries = {"q1": q1_phases, "q2": q2_phases, "q3": q3_phases,
               "q4": q4_phases}

    out: dict = {"sf": SF_DIR, "cpus": CPUS, "reps": args.reps,
                 "burn_nproc_pre_s": round(calibrate(CPUS), 3)}
    for qname, mk in queries.items():
        if qname not in wanted:
            continue
        phases = mk()
        rec: dict = {}
        for pname, fn in phases.items():
            sc.setJobDescription(f"{qname}:{pname}")
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn()
                ts.append(round(time.perf_counter() - t0, 3))
            rec[pname] = {"min": min(ts), "med": statistics.median(ts),
                          "samples": ts}
            sc.setJobDescription(None)
        out[qname] = rec
    out["burn_nproc_post_s"] = round(calibrate(CPUS), 3)
    print(json.dumps(out))
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH", "bench_extra_history.json")
    try:
        with open(hist_path) as fh:
            hist = json.load(fh)
    except Exception:
        hist = []
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    hist.append(out)
    with open(hist_path, "w") as fh:
        json.dump(hist, fh, indent=1)


if __name__ == "__main__":
    main()
