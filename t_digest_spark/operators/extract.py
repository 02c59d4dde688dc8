"""Scalar extraction functions over digest (binary) columns.

These run *after* aggregation, over one row per group — cheap O(delta)
work per row (SURVEY.md §3.3), implemented as Arrow-batched pandas UDFs.

Public surface (SURVEY.md §2.B "UDF/UDAF surface"):
  quantile_of / quantiles_of / cdf_of / cdfs_of / trimmed_mean_of /
  digest_stats / median_of
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StructField, StructType,
)

from ..core import TDigest

__all__ = [
    "quantile_of", "quantiles_of", "cdf_of", "cdfs_of",
    "trimmed_mean_of", "digest_stats", "digest_summary", "STATS_SCHEMA",
]

STATS_SCHEMA = StructType([
    StructField("n", DoubleType()),            # total weight (float64 — >2^31 safe)
    StructField("centroids", IntegerType()),
    StructField("min", DoubleType()),
    StructField("max", DoubleType()),
    StructField("compression", DoubleType()),
    StructField("bytes", IntegerType()),
])


def _decode(blob) -> TDigest | None:
    if blob is None:
        return None
    return TDigest.from_bytes(bytes(blob))


def quantile_of(digest: Column | str, q: float) -> Column:
    """quantile(q) of each digest (MergingDigest.java:697-783 semantics)."""
    qv = float(q)

    @pandas_udf(DoubleType())
    def f(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: np.nan if b is None else _decode(b).quantile(qv))

    return f(digest)


def quantiles_of(digest: Column | str, qs: Sequence[float]) -> Column:
    """array of quantiles at the given probabilities."""
    qvs = [float(q) for q in qs]

    @pandas_udf(ArrayType(DoubleType()))
    def f(blobs: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return [np.nan] * len(qvs)
            return _decode(b).quantiles(qvs).tolist()
        return blobs.map(one)

    return f(digest)


def cdf_of(digest: Column | str, x: float) -> Column:
    xv = float(x)

    @pandas_udf(DoubleType())
    def f(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: np.nan if b is None else _decode(b).cdf(xv))

    return f(digest)


def cdfs_of(digest: Column | str, xs: Sequence[float]) -> Column:
    xvs = [float(x) for x in xs]

    @pandas_udf(ArrayType(DoubleType()))
    def f(blobs: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return [np.nan] * len(xvs)
            return _decode(b).cdfs(xvs).tolist()
        return blobs.map(one)

    return f(digest)


def trimmed_mean_of(digest: Column | str, q0: float, q1: float) -> Column:
    """Mean of samples between rank-quantiles q0 and q1 (SURVEY §2.A8)."""
    a, b_ = float(q0), float(q1)

    @pandas_udf(DoubleType())
    def f(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: np.nan if b is None else _decode(b).trimmed_mean(a, b_))

    return f(digest)


def digest_summary(digest: Column | str, qs: Sequence[float],
                   trim: tuple[float, float] = (0.05, 0.95)) -> Column:
    """All common statistics in ONE digest decode per row: struct of
    quantiles array, trimmed mean, n, min, max, centroids.

    Prefer this over stacking quantile_of/trimmed_mean_of/digest_stats
    when extracting several statistics — each of those decodes the blob
    again (docs/DESIGN.md §8)."""
    qvs = [float(q) for q in qs]
    t0, t1 = float(trim[0]), float(trim[1])
    schema = StructType([
        StructField("quantiles", ArrayType(DoubleType())),
        StructField("trimmed_mean", DoubleType()),
        StructField("n", DoubleType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
        StructField("centroids", IntegerType()),
    ])

    @pandas_udf(schema)
    def f(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            if b is None:
                rows.append(([np.nan] * len(qvs), np.nan, np.nan,
                             np.nan, np.nan, 0))
                continue
            d = _decode(b)
            rows.append((d.quantiles(qvs).tolist(),
                         d.trimmed_mean(t0, t1), float(d.size),
                         d.min, d.max, int(d.centroid_count())))
        return pd.DataFrame(rows, columns=[fld.name for fld in schema.fields])

    return f(digest)


def digest_stats(digest: Column | str) -> Column:
    """Metadata struct: n, centroid count, min, max, compression, bytes.

    These are *exact* (min/max/n track the raw stream), so they are
    DuckDB-oracle-checkable — SURVEY.md §7.5.
    """

    @pandas_udf(STATS_SCHEMA)
    def f(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            if b is None:
                rows.append((np.nan, 0, np.nan, np.nan, np.nan, 0))
                continue
            d = _decode(b)
            rows.append((float(d.size), int(d.centroid_count()),
                         d.min, d.max, d.public_compression, len(bytes(b))))
        return pd.DataFrame(
            rows, columns=[fld.name for fld in STATS_SCHEMA.fields])

    return f(digest)
