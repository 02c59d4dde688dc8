"""Category-5 serialization round-trip tests (TDigestTest.java:728-783,
SerializationTest.java): byte-layout compatibility with the reference
encodings, size caps, quantile drift bounds."""

import math
import struct

import numpy as np
import pytest

from t_digest_spark.core import TDigest


def _uniform_digest(n=100_000, compression=100, seed=1):
    rng = np.random.default_rng(seed)
    d = TDigest(compression)
    d.add_batch(rng.uniform(size=n))
    return d


def test_verbose_roundtrip_exact():
    # VERBOSE is float64 — round trip must be value-exact
    d = _uniform_digest()
    b = d.to_bytes()
    d2 = TDigest.from_bytes(b)
    assert d2.size == d.size
    assert d2.min == d.min
    assert d2.max == d.max
    for q in np.linspace(0, 1, 101):
        assert d2.quantile(q) == d.quantile(q)
    for x in np.linspace(0.01, 0.99, 51):
        assert d2.cdf(x) == d.cdf(x)


def test_small_roundtrip_drift():
    # SMALL truncates to float32; drift <= 1e-6 for data in [0,1]
    # (TDigestTest.java:773-774)
    d = _uniform_digest()
    d2 = TDigest.from_bytes(d.to_small_bytes())
    for q in np.linspace(0, 1, 101):
        assert abs(d2.quantile(q) - d.quantile(q)) < 1e-6


def test_byte_sizes():
    # MergingDigest.java:832-846: 16c+32 verbose, 8c+30 small; < 12000/6000
    # bytes at 100k points, delta<=120 (TDigestTest.java:740,764)
    d = _uniform_digest(compression=100)
    b = d.to_bytes()
    c = len(d.centroids()[0])
    assert len(b) == 16 * c + 32 == d.byte_size()
    assert len(b) < 12_000
    sb = d.to_small_bytes()
    assert len(sb) == 8 * c + 30 == d.small_byte_size()
    assert len(sb) < 6_000


def test_verbose_byte_layout():
    # layout per MergingDigest.java:868-880 — big-endian:
    # int code=1, double min, double max, double compression, int n,
    # then (weight, mean) double pairs
    d = TDigest(100)
    d.add_batch(np.array([1.0, 2.0, 3.0]))
    b = d.to_bytes()
    code, mn, mx, comp, n = struct.unpack_from(">idddi", b, 0)
    assert code == 1
    assert mn == 1.0 and mx == 3.0
    assert comp == 100.0
    assert n == 3
    pairs = struct.unpack_from(f">{2 * n}d", b, 32)
    assert pairs == (1.0, 1.0, 1.0, 2.0, 1.0, 3.0)


def test_small_byte_layout():
    # layout per MergingDigest.java:882-896
    d = TDigest(100)
    d.add_batch(np.array([1.0, 2.0, 3.0]))
    b = d.to_small_bytes()
    code, mn, mx, comp, _sz, _bsz, n = struct.unpack_from(">iddfhhh", b, 0)
    assert code == 2
    assert mn == 1.0 and mx == 3.0
    assert comp == pytest.approx(100.0)
    assert n == 3
    pairs = struct.unpack_from(f">{2 * n}f", b, 30)
    assert pairs == (1.0, 1.0, 1.0, 2.0, 1.0, 3.0)


def test_empty_digest_roundtrip():
    d = TDigest(100)
    d2 = TDigest.from_bytes(d.to_bytes())
    assert d2.size == 0
    assert math.isnan(d2.quantile(0.5))


def test_weighted_roundtrip():
    d = TDigest(100)
    rng = np.random.default_rng(2)
    d.add_batch(rng.uniform(size=1000), rng.integers(1, 1e6, 1000).astype(float))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert d2.size == d.size
    for q in (0.01, 0.5, 0.99):
        assert d2.quantile(q) == d.quantile(q)


def test_big_weights_survive_verbose():
    # float64 weights: > 2^31 total survives VERBOSE round trip
    d = TDigest(100)
    d.add(1.0, 3e9)
    d.add(0.0)
    d.add(2.0)
    d2 = TDigest.from_bytes(d.to_bytes())
    assert d2.size == 3e9 + 2
    assert d2.quantile(0.5) == 1.0


def test_invalid_format():
    with pytest.raises(ValueError):
        TDigest.from_bytes(struct.pack(">i", 99) + b"\0" * 64)
