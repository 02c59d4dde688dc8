"""FloatHistogram/LogHistogram semantics (HistogramTestCases-style) and
Comparison drift scores (ComparisonTest.java scenarios)."""

import math

import numpy as np
import pytest

from t_digest_spark.core import TDigest
from t_digest_spark.functions.compare import (
    compare_chi2_digests, compare_chi2_histograms, ks, llr,
)
from t_digest_spark.functions.histogram import (
    FloatHistogram, LogHistogram, histogram_aggregate, histogram_from_bytes,
)


def test_float_histogram_bucket_monotone_log_spaced():
    h = FloatHistogram(1e-3, 10.0)
    bounds = h.get_bounds()
    assert (np.diff(bounds) > 0).all()
    # log-spaced: ratio between consecutive bounds roughly constant
    ratios = bounds[1:] / bounds[:-1]
    assert ratios.max() / ratios.min() < 1.6
    # clamping (Histogram.java:71-79)
    assert h.bucket(0.0) == 0
    assert h.bucket(1e-9) == 0
    assert h.bucket(1e9) == len(h.get_counts()) - 1
    # bucket of lower bound round-trips to that bucket
    for k in (0, 5, 50, len(bounds) - 1):
        assert h.bucket(bounds[k] * 1.0000001) == k


def test_float_histogram_counts_and_merge():
    rng = np.random.default_rng(1)
    x = np.exp(rng.uniform(math.log(1e-3), math.log(10), size=100_000))
    whole = FloatHistogram(1e-3, 10.0)
    whole.add(x)
    assert whole.get_counts().sum() == x.size
    parts = []
    for i in range(4):
        p = FloatHistogram(1e-3, 10.0)
        p.add(x[i::4])
        parts.append(p)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert (merged.get_counts() == whole.get_counts()).all()
    rt = histogram_from_bytes(merged.to_bytes())
    assert (rt.get_counts() == whole.get_counts()).all()


def test_float_histogram_merge_incompatible():
    a = FloatHistogram(1e-3, 10.0)
    b = FloatHistogram(1e-2, 10.0)
    with pytest.raises(ValueError):
        a.merge(b)


def test_log_histogram_approx_log2():
    # LogHistogram.java:64-69 — error < ±0.01, exact at powers of two
    xs = np.exp(np.random.default_rng(2).uniform(-20, 20, size=10_000))
    err = LogHistogram.approx_log2(xs) - np.log2(xs)
    assert np.abs(err).max() < 0.01
    for p in (0.25, 0.5, 1.0, 2.0, 1024.0):
        assert float(LogHistogram.approx_log2(p)) == pytest.approx(
            math.log2(p), abs=1e-12)
    # pow2 is the exact inverse
    ys = np.linspace(-10, 10, 101)
    back = LogHistogram.approx_log2(LogHistogram.pow2(ys))
    assert np.abs(back - ys).max() < 1e-9


def test_log_histogram_counts():
    rng = np.random.default_rng(3)
    x = np.exp(rng.uniform(math.log(1e-2), math.log(100), size=50_000))
    h = LogHistogram(1e-2, 100.0)
    h.add(x)
    assert h.get_counts().sum() == x.size
    rt = histogram_from_bytes(h.to_bytes())
    assert (rt.get_counts() == h.get_counts()).all()
    # quantile/cdf sanity at bin resolution (eps=0.1 → ~10% bins)
    q50 = h.quantile(0.5)
    exact = np.quantile(x, 0.5)
    assert q50 == pytest.approx(exact, rel=0.15)


def test_llr_basics():
    # identical count rows → no signal
    same = np.array([[10.0, 20, 30], [10, 20, 30]])
    assert llr(same) == pytest.approx(0.0, abs=1e-9)
    # disjoint support → strong signal
    disjoint = np.array([[100.0, 0], [0, 100.0]])
    assert llr(disjoint) > 100
    with pytest.raises(ValueError):
        llr(np.array([[-1.0, 2.0]]))


def test_compare_chi2_digests_detects_shift():
    rng = np.random.default_rng(4)
    base = TDigest(100)
    base.add_batch(rng.gamma(2.0, 1.0, size=100_000))
    same = TDigest(100)
    same.add_batch(rng.gamma(2.0, 1.0, size=100_000))
    shifted = TDigest(100)
    shifted.add_batch(rng.gamma(2.0, 1.3, size=100_000))  # 30% slower
    score_same = compare_chi2_digests(base, same)
    score_shift = compare_chi2_digests(base, shifted)
    # chi2(9 dof) 99.9th pct ~ 27.9 (ComparisonTest uses this family of
    # thresholds); a 30% scale shift at 100k samples is a huge signal
    assert score_same < 100
    assert score_shift > 1000
    assert score_shift > 20 * score_same


def test_compare_chi2_histograms_detects_shift():
    rng = np.random.default_rng(5)
    mk = lambda scale: np.exp(rng.normal(math.log(scale), 0.5, size=50_000))
    h1 = FloatHistogram(1e-3, 1e3)
    h1.add(mk(1.0))
    h2 = FloatHistogram(1e-3, 1e3)
    h2.add(mk(1.0))
    h3 = FloatHistogram(1e-3, 1e3)
    h3.add(mk(1.5))
    assert compare_chi2_histograms(h1, h2) < 200
    assert compare_chi2_histograms(h1, h3) > 2000


def test_ks_statistic():
    rng = np.random.default_rng(6)
    a = TDigest(100)
    a.add_batch(rng.uniform(size=50_000))
    b = TDigest(100)
    b.add_batch(rng.uniform(size=50_000))
    c = TDigest(100)
    c.add_batch(rng.uniform(size=50_000) + 0.1)
    # same distribution: normalized KS ~ O(1); shifted: ~ 0.1*sqrt(n/2)
    assert ks(a, b) < 3
    assert ks(a, c) > 10


def test_spark_histogram_aggregate(spark):
    from pyspark.sql import functions as F

    sdf = spark.range(0, 50_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.exp(F.rand(seed=7) * 6 - 3)).alias("v"))
    agg = histogram_aggregate(sdf.repartition(8), "v", ["g"],
                              kind="float", min_=1e-3, max_=1e3)
    rows = agg.collect()
    assert len(rows) == 4
    total = 0
    for r in rows:
        h = histogram_from_bytes(bytes(r.histogram))
        total += int(h.get_counts().sum())
        assert h.get_counts().sum() == r.rows
    assert total == 50_000
