"""Property-based fuzzing (hypothesis) of the digest core: the
randomized/property category of the reference test strategy
(SURVEY.md §5.6, carrotsearch RandomizedRunner analogue).

Every property here is a published contract of the algorithm, checked
on arbitrary float data (finite, deduplicated-or-not, any scale):

- quantile/cdf stay within [min, max] / [0, 1] and are monotone
- quantile(0)=min, quantile(1)=max
- total weight conserved; centroids sorted; end centroids singleton
- serialization round-trips exactly (VERBOSE)
- merging a random partition of the data stays within the reference
  merge bound
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from t_digest_spark.core import TDigest, merge_digests

from conftest import dist_cdf

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


finite_floats = st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e12, max_value=1e12)


@st.composite
def float_arrays(draw, min_size=1, max_size=3000):
    n = draw(st.integers(min_size, max_size))
    # mix three generation modes: iid uniform-ish, heavy duplicates,
    # adversarial near-constant
    mode = draw(st.integers(0, 2))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if mode == 0:
        lo = draw(finite_floats)
        hi = draw(finite_floats.filter(lambda x: abs(x) < 1e11))
        lo, hi = min(lo, hi), max(lo, hi) + 1e-6
        return rng.uniform(lo, hi, size=n)
    if mode == 1:
        vals = rng.integers(-5, 6, size=n).astype(np.float64)
        return vals * draw(st.sampled_from([1.0, 1e-9, 1e9]))
    base = draw(finite_floats)
    return base + rng.normal(0, 1e-9, size=n)


@settings(max_examples=40, deadline=None)
@given(data=float_arrays(), compression=st.sampled_from([20, 100, 300]))
def test_digest_contracts(data, compression):
    d = TDigest(compression)
    d.add_batch(data)
    s = np.sort(data)
    lo, hi = float(s[0]), float(s[-1])

    assert d.size == data.size
    assert d.min == lo and d.max == hi
    assert d.quantile(0) == lo
    assert d.quantile(1) == hi

    qs = np.linspace(0, 1, 41)
    est = d.quantiles(qs)
    assert (est >= lo - 1e-12).all() and (est <= hi + 1e-12).all()
    assert (np.diff(est) >= -1e-9 * max(1.0, abs(hi))).all()

    xs = np.linspace(lo, hi, 17)
    cdfs = np.asarray([d.cdf(float(x)) for x in xs])
    assert (cdfs >= 0).all() and (cdfs <= 1).all()
    assert (np.diff(cdfs) >= 0).all()

    means, weights = d.centroids()
    assert (np.diff(means) >= 0).all()
    assert weights.sum() == pytest.approx(data.size, abs=1e-9)
    if len(weights) >= 2:
        assert weights[0] == 1 and weights[-1] == 1

    rt = TDigest.from_bytes(d.to_bytes())
    assert rt.quantile(0.5) == d.quantile(0.5)
    assert rt.size == d.size


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       chunks=st.integers(1, 6),
       buffer=st.sampled_from([-1, 2048, 65536]))
def test_unit_weight_fast_path_equivalence(seed, chunks, buffer):
    """The unit-weight merge fast path (introsort + searchsorted
    centroid splice) must be bit-identical to the stable-argsort path
    under arbitrary interleavings of unit adds, explicit-ones adds,
    truly weighted adds, digest merges, and mid-stream compress()."""
    rng = np.random.default_rng(seed)
    a = TDigest(100.0, buffer_size=buffer)
    b = TDigest(100.0, buffer_size=buffer)
    for _ in range(chunks):
        kind = rng.integers(0, 4)
        n = int(rng.integers(1, 30_000))
        data = rng.normal(size=n) * 10.0 ** float(rng.integers(-3, 4))
        if kind == 0:                       # unit (fast path in a only)
            a.add_batch(data)
            b.add_batch(data, np.ones_like(data))
        elif kind == 1:                     # explicit weights
            w = rng.uniform(0.5, 4.0, size=n)
            a.add_batch(data, w)
            b.add_batch(data, w)
        elif kind == 2:                     # digest merge
            other = TDigest(100.0)
            other.add_batch(data)
            o2 = TDigest(100.0)
            o2.add_batch(data)
            a.merge(other)
            b.merge(o2)
        else:                               # unit + mid-stream compress
            a.add_batch(data)
            b.add_batch(data, np.ones_like(data))
            a.compress()
            b.compress()
    a.compress()
    b.compress()
    ma, wa = a.centroids()
    mb, wb = b.centroids()
    assert np.array_equal(ma, mb) and np.array_equal(wa, wb)
    assert a.size == b.size and a.min == b.min and a.max == b.max


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), parts=st.integers(2, 20))
def test_random_partition_merge_bound(seed, parts):
    rng = np.random.default_rng(seed)
    data = rng.uniform(size=20_000)
    perm = rng.permutation(data.size)
    cuts = np.sort(rng.choice(
        np.arange(1, data.size), size=parts - 1, replace=False))
    digests = []
    for chunk in np.split(data[perm], cuts):
        t = TDigest(100)
        if chunk.size:
            t.add_batch(chunk)
        digests.append(t)
    merged = merge_digests(digests)
    s = np.sort(data)
    assert merged.size == data.size
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert abs(dist_cdf(merged.quantile(q), s) - q) < 0.02


@settings(max_examples=20, deadline=None)
@given(data=float_arrays(min_size=1, max_size=500))
def test_kll_contracts(data):
    from t_digest_spark.functions.kll import KLLSketch

    sk = KLLSketch(64)
    sk.update(data)
    s = np.sort(data)
    assert sk.n == data.size
    assert sk.quantile(0) == s[0]
    assert sk.quantile(1) == s[-1]
    est = [sk.quantile(q) for q in np.linspace(0, 1, 21)]
    assert est == sorted(est)
    rt = KLLSketch.from_bytes(sk.to_bytes())
    assert rt.quantile(0.5) == sk.quantile(0.5)
