"""Category-4 merge/distribution tests — the map-reduce contract
(AccuracyTest.java:48-151): estimates from k-way partition merges stay
within abs error < 0.015 regardless of split count or merge order."""

import numpy as np
import pytest

from t_digest_spark.core import TDigest, merge_digests

from conftest import dist_cdf

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


N = 100_000
QS = np.array([0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999])


def _build_parts(data: np.ndarray, parts: int) -> list[TDigest]:
    digests = []
    for i in range(parts):
        d = TDigest(100)
        chunk = data[i::parts]
        if chunk.size:
            d.add_batch(chunk)
        digests.append(d)
    return digests


@pytest.mark.parametrize("parts", [2, 5, 10, 20, 50, 100])
def test_merge_accuracy(parts):
    # AccuracyTest.java:131-151 — abs err < 0.015 for any split count
    rng = np.random.default_rng(100 + parts)
    data = rng.uniform(size=N)
    merged = merge_digests(_build_parts(data, parts))
    assert merged.size == N
    sorted_data = np.sort(data)
    for q in QS:
        est = merged.quantile(q)
        q_back = dist_cdf(est, sorted_data)
        assert abs(q_back - q) < 0.015, (parts, q)


def test_merge_order_independence_in_bounds():
    # docs/vldb/short.tex:160 — invariants hold regardless of merge order
    # (bound satisfaction, not bit equality — SURVEY.md §7.4)
    rng = np.random.default_rng(200)
    data = rng.uniform(size=N)
    parts = _build_parts(data, 16)
    sorted_data = np.sort(data)
    for seed in range(3):
        order = np.random.default_rng(seed).permutation(16)
        merged = merge_digests([parts[i] for i in order])
        for q in QS:
            q_back = dist_cdf(merged.quantile(q), sorted_data)
            assert abs(q_back - q) < 0.015, (seed, q)
        w = merged.centroids()[1]
        assert w[0] == 1 and w[-1] == 1


def test_tree_merge_two_level():
    # digest-of-digest stability (TDigestTest.java:207-230) + stratified
    # two-level merge (docs/vldb/short.tex:185-198)
    rng = np.random.default_rng(300)
    data = rng.uniform(size=N)
    leaves = _build_parts(data, 64)
    mids = [merge_digests(leaves[i:i + 8]) for i in range(0, 64, 8)]
    root = merge_digests(mids)
    flat = merge_digests(leaves)
    sorted_data = np.sort(data)
    assert root.size == N
    for q in QS:
        for m in (root, flat):
            q_back = dist_cdf(m.quantile(q), sorted_data)
            assert abs(q_back - q) < 0.015, q


def test_merge_preserves_extremes():
    rng = np.random.default_rng(400)
    data = rng.normal(size=N)
    merged = merge_digests(_build_parts(data, 10))
    assert merged.min == data.min()
    assert merged.max == data.max()
    assert merged.quantile(0) == data.min()
    assert merged.quantile(1) == data.max()


def test_merge_empty_and_single():
    d0 = TDigest(100)
    d1 = TDigest(100)
    d1.add(42.0)
    merged = merge_digests([d0, d1, TDigest(100)])
    assert merged.size == 1
    assert merged.quantile(0.5) == 42.0
    assert merge_digests([]).size == 0


def test_merge_via_bytes_roundtrip():
    # the distributed path always moves digests as bytes — merge after a
    # serialization round trip must stay in bounds
    rng = np.random.default_rng(500)
    data = rng.gamma(0.1, 10.0, size=N)
    parts = _build_parts(data, 32)
    blobs = [p.to_bytes() for p in parts]
    restored = [TDigest.from_bytes(b) for b in blobs]
    merged = merge_digests(restored)
    sorted_data = np.sort(data)
    assert merged.size == N
    for q in QS:
        q_back = dist_cdf(merged.quantile(q), sorted_data)
        assert abs(q_back - q) < 0.015, q


def test_incremental_merge_method():
    rng = np.random.default_rng(600)
    data = rng.uniform(size=N)
    acc = TDigest(100)
    for part in _build_parts(data, 8):
        acc.merge(part)
    sorted_data = np.sort(data)
    assert acc.size == N
    for q in QS:
        q_back = dist_cdf(acc.quantile(q), sorted_data)
        assert abs(q_back - q) < 0.015, q


def test_mega_merge_scale():
    # MegaMergeTest.java:37-142 scaled down: many small digests merge to
    # one digest with bounded size and sane quantiles
    rng = np.random.default_rng(700)
    digests = []
    all_data = []
    for _ in range(280):
        x = rng.normal(size=1000)
        all_data.append(x)
        d = TDigest(100)
        d.add_batch(x)
        digests.append(d)
    merged = merge_digests(digests)
    data = np.sort(np.concatenate(all_data))
    assert merged.size == 280_000
    assert len(merged.centroids()[0]) <= 100
    for q in QS:
        q_back = dist_cdf(merged.quantile(q), data)
        assert abs(q_back - q) < 0.015, q


def test_merge_blobs_equals_merge_digests():
    # the zero-copy blob fast path must be bit-identical to
    # merge_digests over deserialized digests (same add_centroids call)
    import numpy as np

    from t_digest_spark.core import TDigest, merge_blobs, merge_digests

    rng = np.random.default_rng(5)
    blobs = []
    for i in range(40):
        d = TDigest(100.0)
        d.add_batch(rng.gamma(2.0, 1.0, size=500))
        blobs.append(d.to_bytes(compress=(i % 2 == 0)))
    a = merge_blobs(blobs, compression=100.0)
    b = merge_digests([TDigest.from_bytes(x) for x in blobs],
                      compression=100.0)
    assert a.size == b.size
    assert a.min == b.min and a.max == b.max
    ma, wa = a.centroids()
    mb, wb = b.centroids()
    assert np.array_equal(ma, mb) and np.array_equal(wa, wb)
    # SMALL encoding decodes through the same path
    small = merge_blobs([TDigest.from_bytes(blobs[0]).to_small_bytes()])
    assert small.size == TDigest.from_bytes(blobs[0]).size
