"""Category-2 statistical accuracy vs the exact oracle, porting the
reference runTest harness (TDigestTest.java:424-497) with its exact
tolerances: cdf error <= 0.08, quantile round-trip error <= 0.012,
< 3 soft errors > 0.005, centroid count <= public compression."""

import numpy as np
import pytest

from t_digest_spark.core import TDigest

from conftest import dist_cdf, dist_quantile

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


Q_VALUES = np.array([0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999])
N = 100_000


def _run_test(data: np.ndarray, compression: float = 100.0,
              scale="K_2") -> None:
    d = TDigest(compression, scale=scale)
    d.add_batch(data)
    data = np.sort(data)
    x_values = np.array([dist_quantile(q, data) for q in Q_VALUES])

    means, weights = d.centroids()
    assert len(means) <= d.public_compression, "Summary is too large"
    assert weights.sum() == pytest.approx(d.size, abs=1e-10)

    soft_errors = 0
    for q, x in zip(Q_VALUES, x_values):
        estimate = d.cdf(x)
        assert estimate == pytest.approx(q, abs=0.08), f"cdf at q={q}"
        estimate = dist_cdf(d.quantile(q), data)
        if abs(q - estimate) > 0.005:
            soft_errors += 1
        assert estimate == pytest.approx(q, abs=0.012), f"quantile at q={q}"
    assert soft_errors < 3


def test_uniform():
    # TDigestTest.java:574-581
    rng = np.random.default_rng(1)
    _run_test(rng.uniform(size=N))


def test_gamma():
    # TDigestTest.java:584-597 — 11 orders of magnitude of skew;
    # reference uses compression 200 for this distribution
    rng = np.random.default_rng(2)
    _run_test(rng.gamma(0.1, 10.0, size=N), compression=200)


def test_narrow_normal_mixture():
    # TDigestTest.java:600-623 — half U(-1,1), half N(0, 1e-5);
    # reference uses compression 400
    rng = np.random.default_rng(3)
    pick = rng.uniform(size=N) < 0.5
    data = np.where(pick, rng.uniform(-1, 1, size=N),
                    rng.normal(0, 1e-5, size=N))
    _run_test(data, compression=400)


def test_sequential_points():
    # TDigestTest.java:712-725 — adversarial sorted input
    data = np.arange(N, dtype=np.float64) * np.pi * 1e-5
    _run_test(data)


@pytest.mark.parametrize("scale", ["K_1", "K_2", "K_3"])
def test_scales_uniform(scale):
    rng = np.random.default_rng(4)
    _run_test(rng.uniform(size=N), scale=scale)


@pytest.mark.parametrize("compression", [50, 200, 400])
def test_compressions_uniform(compression):
    rng = np.random.default_rng(5)
    _run_test(rng.uniform(size=N), compression=compression)


def test_klimit_mode_uniform():
    # AccuracyTest.java:273-288 sweeps useWeightLimit in {true, false};
    # the k-limit path is our fully-vectorized variant
    rng = np.random.default_rng(6)
    d = TDigest(100, use_weight_limit=False)
    data = rng.uniform(size=N)
    d.add_batch(data)
    data = np.sort(data)
    for q in Q_VALUES:
        estimate = dist_cdf(d.quantile(q), data)
        assert estimate == pytest.approx(q, abs=0.012)


def test_tail_accuracy_ppm():
    # docs/vldb/short.tex:265 — extreme-tail rank error should be tiny
    # relative to q (we assert <= 10x the claimed single-digit ppm at 1e6
    # samples to keep the test robust across seeds)
    rng = np.random.default_rng(7)
    data = rng.uniform(size=1_000_000)
    d = TDigest(100)
    d.add_batch(data)
    data = np.sort(data)
    for q in (1e-4, 1e-3, 0.999, 0.9999):
        est = d.quantile(q)
        rank_err = abs(np.searchsorted(data, est) / data.size - q)
        assert rank_err < 50e-6, (q, rank_err)


def test_offset_uniform():
    # TDigestTest.java:104-128 — U(50,51), checks relative x error sanity
    rng = np.random.default_rng(8)
    data = rng.uniform(50, 51, size=N)
    d = TDigest(100)
    d.add_batch(data)
    data = np.sort(data)
    for q in (0.5, 0.9, 0.99, 0.999):
        x1 = dist_quantile(q, data)
        x2 = d.quantile(q)
        assert abs(x1 - x2) / (1 - q) < 1.0, q


def test_adversarial_magnitudes():
    # MergingDigestTest.java:206-236 — inputs spanning e±308
    rng = np.random.default_rng(9)
    out = []
    for e in (10, 100, 300, 700):
        u = rng.uniform(size=2000)
        sign = np.where(rng.uniform(size=2000) < 0.5, -1.0, 1.0)
        vals = sign * np.exp(np.clip((2 * u - 1) * e, -700, 700))
        out.append(vals)
    data = np.concatenate(out)
    d = TDigest(100)
    d.add_batch(data)
    data = np.sort(data)
    # the reference test (MergingDigestTest.java:206-236) asserts nothing
    # beyond not crashing — it dumps a CSV for offline study.  We pin the
    # structural guarantees: finite, monotone, extremes exact.
    prev = -np.inf
    for q in np.linspace(0, 1, 101):
        v = d.quantile(q)
        assert np.isfinite(v)
        assert v >= prev
        prev = v
    assert d.quantile(0) == data[0]
    assert d.quantile(1) == data[-1]
