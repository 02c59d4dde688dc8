"""KLL sketch: accuracy, mergeability, serde, Spark aggregation."""

import numpy as np
import pytest

from t_digest_spark.functions.kll import (
    KLLSketch, kll_aggregate, kll_quantiles_of,
)

from conftest import dist_cdf


def test_kll_uniform_accuracy():
    rng = np.random.default_rng(1)
    data = rng.uniform(size=100_000)
    sk = KLLSketch(k=200)
    sk.update(data)
    s = np.sort(data)
    # KLL rank error is uniform in q, ~O(1/k); allow 3/k
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(q)
        assert abs(dist_cdf(est, s) - q) < 3.0 / 200, q
    assert sk.quantile(0) == data.min()
    assert sk.quantile(1) == data.max()
    # bounded size
    assert sum(lv.size for lv in sk.levels) < 10 * 200


def test_kll_merge_split_bounds():
    rng = np.random.default_rng(2)
    data = rng.gamma(2.0, 1.0, size=100_000)
    parts = []
    for i in range(16):
        sk = KLLSketch(k=200, seed=i)
        sk.update(data[i::16])
        parts.append(sk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == data.size
    s = np.sort(data)
    for q in (0.05, 0.5, 0.95):
        assert abs(dist_cdf(merged.quantile(q), s) - q) < 0.03, q


def test_kll_cdf_and_serde():
    rng = np.random.default_rng(3)
    data = rng.normal(size=50_000)
    sk = KLLSketch(k=256)
    sk.update(data)
    s = np.sort(data)
    for v in (-2.0, 0.0, 2.0):
        assert sk.cdf(v) == pytest.approx(dist_cdf(v, s), abs=0.02)
    rt = KLLSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n
    for q in (0.1, 0.5, 0.9):
        assert rt.quantile(q) == sk.quantile(q)


def test_kll_weight_conservation():
    """Regression: _compact on an odd-size level with offset=1 used to
    drop the unpaired max element entirely — n permanently disagreed
    with the sum of level weights (observed: n=100000, weight=99968)
    and the loss was always the level max, biasing the upper tail."""
    rng = np.random.default_rng(7)
    for seed in range(8):
        sk = KLLSketch(k=64, seed=seed)
        data = rng.uniform(size=50_001)
        # odd-size drip feed maximizes odd-level compactions
        for i in range(0, data.size, 997):
            sk.update(data[i:i + 997])
        total_w = sum(lv.size * 2 ** i for i, lv in enumerate(sk.levels))
        assert total_w == sk.n == data.size, seed
        # merged sketches conserve weight too
        other = KLLSketch(k=64, seed=seed + 100)
        other.update(rng.uniform(size=33_333))
        sk.merge(other)
        total_w = sum(lv.size * 2 ** i for i, lv in enumerate(sk.levels))
        assert total_w == sk.n == data.size + 33_333, seed


def test_kll_nan_rejected():
    sk = KLLSketch()
    with pytest.raises(ValueError):
        sk.update(np.array([1.0, np.nan]))


def test_kll_spark_aggregate(spark):
    from pyspark.sql import functions as F

    sdf = spark.range(0, 40_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.rand(seed=5).alias("v"))
    pdf = sdf.collect()
    by_g = {}
    for r in pdf:
        by_g.setdefault(r.g, []).append(r.v)
    agg = kll_aggregate(sdf.repartition(8), "v", ["g"], k=200)
    rows = agg.select("g", "rows",
                      kll_quantiles_of("kll", [0.1, 0.5, 0.9]).alias("qs")) \
        .collect()
    assert len(rows) == 2
    for r in rows:
        data = np.sort(np.asarray(by_g[r.g]))
        assert r.rows == data.size
        for q, est in zip([0.1, 0.5, 0.9], r.qs):
            assert abs(dist_cdf(est, data) - q) < 0.03
