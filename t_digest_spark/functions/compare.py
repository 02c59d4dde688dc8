"""Distribution-drift scores between two sketches (reference
Comparison.java:40-230): G-test / chi^2 over quantile bins, and a
normalized Kolmogorov-Smirnov statistic walking both digests' centroid
locations.

These power the monitoring use-case (core ComparisonTest.java:38-161:
per-minute digests vs a trailing-hour merge flagging latency
regressions) — with mergeable digests per time bucket that comparison
is a pure driver/extract-side computation, no rescan of the data.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from ..core import TDigest
from .histogram import _BaseHistogram

__all__ = ["compare_chi2_digests", "compare_chi2_histograms", "llr", "ks",
           "drift_scores"]


def llr(count: np.ndarray) -> float:
    """G-test score = 2N * mutual information of a 2 x k count table
    (Comparison.java:115-162)."""
    count = np.asarray(count, dtype=np.float64)
    if count.size == 0:
        raise ValueError("Must have some data in llr")
    if (count < 0).any():
        raise ValueError("Illegal negative count")
    total = count.sum()
    norm = total * math.log(total) if total > 0 else 0.0
    pos = count[count > 0]
    h = float((pos * np.log(pos)).sum()) - norm
    rs = count.sum(axis=1)
    rs = rs[rs > 0]
    hr = float((rs * np.log(rs)).sum()) - norm
    cs = count.sum(axis=0)
    cs = cs[cs > 0]
    hc = float((cs * np.log(cs)).sum()) - norm
    return 2 * (h - hr - hc)


def compare_chi2_digests(d1: TDigest, d2: TDigest,
                         q_cuts: Sequence[float] = (0.1, 0.2, 0.3, 0.4, 0.5,
                                                    0.6, 0.7, 0.8, 0.9)) -> float:
    """Bin both digests at d1's quantile cuts, G-test the count table
    (Comparison.java:49-75)."""
    q_cuts = list(q_cuts)
    k = len(q_cuts) + 1
    count = np.zeros((2, k), dtype=np.float64)
    old_q = 0.0
    old_q2 = 0.0
    for i in range(k):
        if i == len(q_cuts):
            new_q = 1.0
            x = max(d1.max, d2.max) + 1
        else:
            new_q = q_cuts[i]
            x = d1.quantile(new_q)
        count[0][i] = d1.size * (new_q - old_q)
        q2 = d2.cdf(x)
        count[1][i] = d2.size * (q2 - old_q2)
        old_q = new_q
        old_q2 = q2
    return llr(count)


def compare_chi2_histograms(h1: _BaseHistogram, h2: _BaseHistogram) -> float:
    """G-test over identically-binned histograms (Comparison.java:90-112)."""
    if type(h1) is not type(h2):
        raise ValueError("Must have same class arguments")
    k1, k2 = h1.get_counts(), h2.get_counts()
    if (len(k1) != len(k2) or h1._lower_bound(0) != h2._lower_bound(0)
            or h1._lower_bound(len(k1) - 1) != h2._lower_bound(len(k1) - 1)):
        raise ValueError("Incompatible histograms in terms of size or bounds")
    return llr(np.vstack([k1, k2]).astype(np.float64))


def ks(d1: TDigest, d2: TDigest) -> float:
    """Normalized KS statistic: max |cdf1 - cdf2| over both digests'
    centroid locations, scaled by sqrt(n1*n2/(n1+n2))
    (Comparison.java:173-217).  The walk is re-expressed as a vectorized
    sweep over the merged sorted evaluation points — same evaluation set,
    same max."""
    m1, _ = d1.centroids()
    m2, _ = d2.centroids()
    xs = np.unique(np.concatenate([
        [d1.min], m1, [d1.max], [d2.min], m2, [d2.max]]))
    xs = xs[np.isfinite(xs)]
    diff = 0.0
    for x in xs:
        diff = max(diff, abs(d1.cdf(float(x)) - d2.cdf(float(x))))
    n1, n2 = d1.size, d2.size
    return diff * math.sqrt(n1 * n2 / (n1 + n2))


def drift_scores(blob1: bytes, blob2: bytes,
                 q_cuts: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9,
                                            0.99)) -> dict:
    """Convenience: decode two serialized digests and compute both
    scores (used by the Spark-side drift query)."""
    d1 = TDigest.from_bytes(bytes(blob1))
    d2 = TDigest.from_bytes(bytes(blob2))
    return {
        "chi2": compare_chi2_digests(d1, d2, q_cuts),
        "ks": ks(d1, d2),
    }
