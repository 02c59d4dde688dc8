"""Category-1 exact-semantics tests: faithful ports of the reference's
golden edge-case tests (SURVEY.md §5.1).  Zero or near-zero tolerance —
these pin the singleton/tail interpolation logic where the ppm-level
accuracy lives."""

import math

import numpy as np
import pytest

from t_digest_spark.core import TDigest
from t_digest_spark.scale import K_0

from conftest import dist_cdf, dist_quantile

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")



def test_single_value():
    # TDigestTest.java:365-374
    rng = np.random.default_rng(7)
    value = rng.uniform() * 1000
    d = TDigest(100)
    d.add(value)
    for q in (0.0, rng.uniform(), 1.0):
        assert d.quantile(q) == pytest.approx(value, abs=1e-3)


def test_empty():
    # TDigestTest.java:500-504
    d = TDigest(100)
    assert math.isnan(d.quantile(0.5))
    assert math.isnan(d.cdf(0.5)) or d.size == 0


def test_nan_rejected():
    # TDigestTest.java:552-570
    d = TDigest(100)
    d.add_batch(np.random.default_rng(0).uniform(size=50))
    with pytest.raises(ValueError):
        d.add(math.nan)
    with pytest.raises(ValueError):
        d.add_batch(np.array([1.0, math.nan]))


def test_single_single_range():
    # TDigestTest.java:257-272 — cdf is a step function between singletons
    d = TDigest(100)
    for v in (1, 2, 3):
        d.add(v)
    assert d.cdf(1) == 0.5 / 3.0
    assert d.cdf(1 + 1e-10) == 1 / 3.0
    assert d.cdf(2 - 1e-10) == 1 / 3.0
    assert d.cdf(2) == 1.5 / 3.0
    assert d.cdf(2 + 1e-10) == 2 / 3.0
    assert d.cdf(3 - 1e-10) == 2 / 3.0
    assert d.cdf(3) == 2.5 / 3.0
    assert d.cdf(3 + 1e-10) == 1.0


def test_singleton_quantiles():
    # TDigestTest.java:236-251 — brute force vs the exact Dist oracle
    data = np.arange(20, dtype=np.float64)
    d = TDigest(100)
    d.add_batch(data)
    for x in np.arange(d.min - 0.1, d.max + 0.1, 1e-2):
        assert d.cdf(x) == dist_cdf(x, data), x
    for q in np.arange(0, 1.0001, 1e-3):
        q = min(q, 1.0)
        assert d.quantile(q) == dist_quantile(q, data), q


def test_singleton_at_end():
    # TDigestTest.java:279-342 (first part)
    d = TDigest(100)
    for v in (1, 2, 3):
        d.add(v)
    assert d.min == 1
    assert d.max == 3
    assert d.centroid_count() == 3
    assert d.cdf(0) == 0
    assert d.cdf(1 - 1e-9) == 0
    assert d.cdf(1) == pytest.approx(0.5 / 3, abs=1e-10)
    assert d.cdf(1 + 1e-10) == pytest.approx(1.0 / 3, abs=1e-10)
    assert d.cdf(3 - 1e-9) == 2.0 / 3
    assert d.cdf(3) == 2.5 / 3
    assert d.cdf(3 + 1e-9) == 1.0
    d.add(1)
    assert d.cdf(1) == 1.0 / 4


def test_singleton_at_end_forced():
    # TDigestTest.java:301-342 — min/max stay singletons even under heavy
    # compression; K_0, compression forced up to 10
    d = TDigest(1, scale=K_0)
    for _ in range(100):
        d.add_batch(np.array([1.0, 2.0, 3.0]))
    d.add(0)
    means, weights = d.centroids()
    assert weights[0] == 1
    assert means[0] == d.min == 0.0
    n = d.size
    assert d.cdf(0 - 1e-9) == 0
    assert d.cdf(0) == pytest.approx(0.5 / n, abs=1e-10)
    assert d.cdf(1e-9) == pytest.approx(1.0 / n, abs=1e-10)
    assert d.quantile(0) == 0
    assert d.quantile(0.5 / n) == 0
    assert d.quantile(1.0 / n - 1e-10) == 0
    assert d.quantile(1.0 / n) == 0

    d.add(4)
    means, weights = d.centroids()
    assert weights[-1] == 1.0
    assert means[-1] == 4
    n = d.size
    assert d.cdf(d.max + 1e-9) == 1.0
    assert d.cdf(d.max) == 1 - 0.5 / n
    assert d.cdf(d.max - 1e-9) == pytest.approx(1 - 1.0 / n, abs=1e-10)
    assert d.quantile(1) == 4
    assert d.quantile(1 - 0.5 / n) == 4
    assert d.quantile(1 - 1.0 / n + 1e-10) == 4
    assert d.quantile(1 - 1.0 / n) == 4


def test_big_jump():
    # TDigestTest.java:131-160
    d = TDigest(100)
    for i in range(1, 20):
        d.add(i)
    d.add(1_000_000)
    assert d.quantile(0.89999999) == 18
    assert d.quantile(0.9) == 19
    assert d.quantile(0.949999999) == 19
    assert d.quantile(0.95) == 1_000_000
    assert d.cdf(19) == pytest.approx(0.925, abs=1e-11)
    assert d.cdf(19.0000001) == pytest.approx(0.95, abs=1e-11)
    assert d.cdf(19 - 0.0000001) == pytest.approx(0.9, abs=1e-11)

    d = TDigest(80, scale=K_0)
    for _ in range(100):
        d.add_batch(np.arange(1.0, 20.0))
        d.add(1_000_000)
    assert d.quantile(0.885) == 18.0
    assert d.quantile(0.915) == 19.0
    assert d.quantile(0.935) == 19.0
    assert d.quantile(0.965) == 1_000_000.0


def test_small_count_quantile():
    # TDigestTest.java:163-174
    d = TDigest(200)
    d.add_batch(np.array([15.0, 20.0, 32.0, 60.0]))
    assert d.quantile(0.4) == pytest.approx(20, abs=1e-10)
    assert d.quantile(0.25) == pytest.approx(20, abs=1e-10)
    assert d.quantile(0.25 - 1e-10) == pytest.approx(15, abs=1e-10)
    assert d.quantile(0.5 - 1e-10) == pytest.approx(20, abs=1e-10)
    assert d.quantile(0.5) == pytest.approx(32, abs=1e-10)


def test_issue_167():
    # TDigestTest.java:348-361
    d = TDigest(100)
    d.add_batch(np.full(2, 9000.0))
    d.add_batch(np.full(11, 3000.0))
    d.add_batch(np.full(26, 1000.0))
    assert d.quantile(0.9) == 3000.0
    assert d.quantile(0.95) == 9000.0


def test_singleton_in_a_crowd():
    # TDigestTest.java:824-839
    d = TDigest(100)
    d.add_batch(np.full(10000, 10.0))
    d.add(20)
    d.compress()
    for q in (0, 0.5, 0.8, 0.9, 0.99, 0.999):
        assert d.quantile(q) == 10.0, q
    assert d.quantile(1) == 20.0


def test_three_point_example():
    # TDigestTest.java:790-821
    d = TDigest(100)
    x0, x1, x2 = 0.18615591526031494, 0.4241943657398224, 0.8813006281852722
    for v in (x0, x1, x2):
        d.add(v)
    p10, p50, p90, p95, p99 = (d.quantile(q)
                               for q in (0.1, 0.5, 0.9, 0.95, 0.99))
    assert p10 <= p50 <= p90 <= p95 <= p99
    assert p10 == x0
    assert p99 == x2


def test_mid_point_rule():
    # TDigestTest.java:626-663
    d = TDigest(200)
    d.add(1)
    d.add(2)
    scale = 0.0
    for i in range(1000):
        d.add(1)
        d.add(2)
        if i % 8 == 0:
            assert d.cdf(1 - 1e-9) == 0, i
            assert d.cdf(1) == pytest.approx(0.25, abs=0.01 * scale + 1e-12), i
            assert d.cdf(1 + 1e-9) == pytest.approx(0.5, abs=0.03 * scale + 1e-12), i
            assert d.cdf(2 - 1e-9) == pytest.approx(0.5, abs=0.03 * scale + 1e-12), i
            assert d.cdf(2) == pytest.approx(0.75, abs=0.01 * scale + 1e-12), i
            assert d.cdf(2 + 1e-9) == 1, i
            for q in (0, 0.1, 0.2, 0.4):
                assert d.quantile(q) == 1, (i, q)
            for q in (0.6, 0.7, 0.8, 0.9, 1):
                assert d.quantile(q) == 2, (i, q)
        if i >= 39:
            scale = 1.0


def test_few_values():
    # TDigestTest.java:377-403 — with few values quantiles are exact
    rng = np.random.default_rng(11)
    for _ in range(10):
        d = TDigest(100)
        length = rng.integers(1, 10)
        values = []
        for i in range(length):
            if i == 0 or rng.uniform() < 0.5:
                v = rng.uniform() * 100
            else:
                v = values[-1]  # duplicates
            values.append(v)
            d.add(v)
        values = np.sort(np.asarray(values))
        assert d.centroid_count() == len(values)
        for q in (0, 1e-10, rng.uniform(), 0.5, 1 - 1e-10, 1):
            assert d.quantile(q) == pytest.approx(
                dist_quantile(q, values), abs=0.03)


def test_more_than_2b_values():
    # TDigestTest.java:507-529 — weights are double, counts can pass 2^31
    d = TDigest(100)
    n = 3e9
    q0 = 0.0
    for _ in range(200):
        if q0 >= 1 - 1e-10:
            break
        k0 = d.scale.k_cn(q0, d.public_compression, n)
        q = d.scale.q_cn(k0 + 1, d.public_compression, n)
        m = max(1, int(n * (q - q0)))
        d.add((q + q0) / 2, m)
        q0 = q0 + m / n
    d.compress()
    assert d.size == 3_000_000_000
    assert d.size > 2**31
    prev = -math.inf
    for q in (0, 0.1, 0.5, 0.9, 1):
        v = d.quantile(q)
        assert v >= prev
        prev = v


def test_repeated_values():
    # TDigestTest.java:666-709 — 11 discrete values, 1M samples
    rng = np.random.default_rng(42)
    x = np.rint(rng.uniform(size=1_000_000) * 10) / 10.0
    d = TDigest(400)
    d.add_batch(x)
    assert len(d.centroids()[0]) < d.public_compression
    for i in range(10):
        z = i / 10.0
        for delta in (0.01, 0.02, 0.03, 0.07, 0.08, 0.09):
            q = z + delta
            assert d.cdf(q) == pytest.approx(z + 0.05, abs=0.03), q
            assert d.quantile(q) == pytest.approx(
                np.rint(q * 10) / 10.0, abs=0.02), q
