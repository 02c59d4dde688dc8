"""Port of the reference's system/use-case test: the latency-regression
detector (core ComparisonTest.java:38-161) — per-minute digests
compared against a trailing-hour merged digest via the chi2/G-test and
KS scores.  Here the per-minute digests come from the Spark two-stage
aggregate over a synthetic latency stream with a regression injected in
the last minutes."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from t_digest_spark.core import TDigest, merge_digests
from t_digest_spark.functions.compare import compare_chi2_digests, ks
from t_digest_spark.operators.aggregate import tdigest_aggregate


def test_latency_regression_detector(spark):
    rng = np.random.default_rng(42)
    rows = []
    # 70 minutes of latency samples; minutes 65+ run 50% slower
    for minute in range(70):
        scale = 1.5 if minute >= 65 else 1.0
        lat = rng.gamma(2.0, scale, size=2000)
        rows.extend((minute, float(v)) for v in lat)
    sdf = spark.createDataFrame(rows, "minute int, latency double") \
        .repartition(16)

    agg = tdigest_aggregate(sdf, "latency", ["minute"])
    per_minute = {
        r.minute: TDigest.from_bytes(bytes(r.digest))
        for r in agg.collect()
    }
    assert len(per_minute) == 70

    # trailing-hour reference = merge of minutes 0..59 (pure sketch
    # algebra, no rescan — the whole point of mergeability)
    baseline = merge_digests([per_minute[m] for m in range(60)])
    assert baseline.size == 120_000

    # chi2 9-dof 99.9th percentile ~ 27.9 (the reference's threshold
    # family); healthy minutes stay below, regressed minutes blow past
    healthy = [compare_chi2_digests(baseline, per_minute[m])
               for m in range(60, 65)]
    regressed = [compare_chi2_digests(baseline, per_minute[m])
                 for m in range(65, 70)]
    assert max(healthy) < 60          # no false alarm margin
    assert min(regressed) > 200       # unmissable signal
    assert min(regressed) > 5 * max(healthy)

    ks_healthy = [ks(baseline, per_minute[m]) for m in range(60, 65)]
    ks_regressed = [ks(baseline, per_minute[m]) for m in range(65, 70)]
    assert min(ks_regressed) > 2 * max(ks_healthy)
