"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Queries:
  q1_events_digest      — grouped t-digest (event_type) + quantile extract
  q2_lineitem_global    — global tree-merged digest over 600k prices
  q3_transcripts        — synthetic transcripts (~1M turns): shuffle-
                          free clustered lag latency metric → digest by
                          (role, hour) → p50/p99/p999 (the north_star
                          job shape; window fallback tested equal)
  q4_lineitem_grouped   — digest by (returnflag, linestatus) + trimmed mean

Throughput context (reference single-thread: ~140 ns/point add ⇒
~7.1M points/sec, README.md:23) is reported as rows_per_sec extras.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from t_digest_spark.operators.aggregate import tdigest_aggregate  # noqa: E402
from t_digest_spark.operators.extract import (  # noqa: E402
    quantiles_of, trimmed_mean_of,
)
from t_digest_spark.sources.tables import (  # noqa: E402
    latency_digests_clustered, load_table, synth_transcripts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_CONVS", "300000"))  # ~1M turns


def q1_events_digest(spark):
    events = load_table(spark, SF_DIR, "events")
    agg = tdigest_aggregate(events, "value", ["event_type"])
    return agg.select(
        "event_type",
        quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"),
    ).collect(), events.count()


def q2_lineitem_global(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    agg = tdigest_aggregate(li, "l_extendedprice", tree=True)
    return agg.select(
        quantiles_of("digest", [0.01, 0.5, 0.99]).alias("qs")
    ).collect(), li.count()


def _transcripts_path(spark):
    """Materialize the synthetic transcripts once (generation is test
    fixture cost, not engine throughput); cached across bench runs."""
    path = f"/tmp/tdigest_bench/transcripts_{N_CONVS}_s42.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t = synth_transcripts(spark, n_convs=N_CONVS, seed=42,
                              partitions=CPUS * 2, with_text=False)
        t.write.mode("overwrite").parquet(path)
    return path


def q3_transcripts(spark):
    # fused clustered lag + partial digests: the materialized
    # transcripts are conv-clustered and (conv_id, turn_idx)-sorted
    # within files, so the lag derives per scan partition and the raw
    # rows cross Python exactly once (zero raw-row Exchange);
    # equality with the window path is asserted in tests/test_spark_agg
    t = spark.read.parquet(_transcripts_path(spark))
    agg = latency_digests_clustered(t, ["role", "ts_hour"])
    rows = agg.select(
        "role", "ts_hour", "rows",
        quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"),
    ).collect()
    total_turns = sum(r["rows"] for r in rows)
    return rows, total_turns


def q4_lineitem_grouped(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    agg = tdigest_aggregate(li, "l_extendedprice",
                            ["l_returnflag", "l_linestatus"])
    return agg.select(
        "l_returnflag", "l_linestatus",
        quantiles_of("digest", [0.5, 0.95]).alias("qs"),
        trimmed_mean_of("digest", 0.05, 0.95).alias("tmean"),
    ).collect(), li.count()


def main():
    from t_digest_spark.session import build_session

    spark = build_session(f"local[{CPUS}]", CPUS, app_name="t-digest-bench",
                          **{"spark.driver.memory": "16g",
                             "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up python workers / JIT so q1 isn't charged for it
    warm = spark.createDataFrame([(float(i),) for i in range(1000)],
                                 "v double")
    tdigest_aggregate(warm.repartition(CPUS), "v").collect()

    queries = {
        "q1_events_digest": q1_events_digest,
        "q2_lineitem_global": q2_lineitem_global,
        "q3_transcripts": q3_transcripts,
        "q4_lineitem_grouped": q4_lineitem_grouped,
    }
    timings = {}
    rates = {}
    total = 0.0
    for name, fn in queries.items():
        t0 = time.perf_counter()
        _rows, n_in = fn(spark)
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        rates[name] = round(n_in / dt, 1)
        total += dt
    # warm steady-state passes (first execution of each query shape
    # pays one-time Catalyst planning / codegen / UDF pickling —
    # ~1.5-2s, which dwarfs the sub-second small-table queries).
    # MEDIAN OF 3 per query: the sandbox host throttles unpredictably
    # (a single warm run of q3 once measured 19.4s vs 6.1s cold in the
    # same process), so single-shot warm numbers carry no round-over-
    # round signal; the raw samples are kept for transparency.
    warm_samples: dict[str, list[float]] = {n: [] for n in queries}
    warm_rates = {}
    for _rep in range(3):
        for name, fn in queries.items():
            t0 = time.perf_counter()
            _rows, n_in = fn(spark)
            dt = time.perf_counter() - t0
            warm_samples[name].append(round(dt, 3))
            warm_rates[name] = n_in
    warm_timings = {n: sorted(s)[len(s) // 2]
                    for n, s in warm_samples.items()}
    warm_rates = {n: round(warm_rates[n] / warm_timings[n], 1)
                  for n in queries}
    spark.stop()

    # single-thread core ingest figure (comparable to the reference's
    # ~140 ns/point JMH number, its README.md:23) — no Spark in the
    # loop; best-of-5 because the sandbox host throttles unpredictably
    # right after a 32-thread Spark job
    import numpy as _np

    from t_digest_spark.core import TDigest as _TD
    from t_digest_spark.operators.aggregate import DEFAULT_BUFFER as _BUF
    # pure-CPU calibration adjacent to the micro-bench: a fixed-work
    # single-thread burn whose unthrottled time on this host class is
    # known (~0.65 s, best observed; tools/bench_scaling.py uses the
    # same loop).  A throttled record then self-identifies — e.g. a
    # core_ns_per_point reading taken while the burn runs 1.7x slow is
    # a throttle artifact, not a regression — and consumers should
    # prefer min-across-recorded-runs for cross-round comparisons.
    _NOMINAL_BURN_S = 0.65

    def _burn_1thread() -> float:
        x = 0.0
        for i in range(12_000_000):
            x += i * 1e-9
        return x

    _burn_s = float("inf")
    for _ in range(3):
        _t0 = time.perf_counter()
        _burn_1thread()
        _burn_s = min(_burn_s, time.perf_counter() - _t0)

    _data = _np.random.default_rng(1).gamma(2.0, 1.0, size=1_000_000)
    _core_ns = float("inf")
    for _ in range(5):
        # the Spark stage-1 buffer size (64 Ki), not the constructor's
        # reference-faithful 5x(2*compression) default — this figure
        # describes the ingest path partials actually run
        _d = _TD(100.0, buffer_size=_BUF)
        _t0 = time.perf_counter()
        _d.add_batch(_data)
        _d.compress()
        _core_ns = min(_core_ns,
                       (time.perf_counter() - _t0) / _data.size * 1e9)

    print(json.dumps({
        "metric": "tdigest headline queries wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "value_warm_median": round(sum(warm_timings.values()), 3),
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows_per_sec": rates,
        "queries_warm": warm_timings,
        "queries_warm_samples": warm_samples,
        "rows_per_sec_warm": warm_rates,
        "core_ns_per_point_1thread": round(_core_ns, 1),
        "reference_ns_per_point_1thread": 140.0,
        "cpu_calibration": {
            "burn_1thread_s": round(_burn_s, 3),
            "nominal_unthrottled_s": _NOMINAL_BURN_S,
            "throttle_factor": round(_burn_s / _NOMINAL_BURN_S, 2),
        },
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
