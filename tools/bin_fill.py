"""Bin-fill study: how full is each centroid relative to its k-span
budget?  Runnable analogue of the reference quality module's
BinFill.java:41-125 (the bin-fill.csv dump consumed by bin-fill.r).

For every scale function (NO_NORM excluded, like the reference), over
uniform / gamma / lognormal data at two compressions, dump one row per
centroid: mid-quantile, mean, k-span dk = k(q1) - k(q0) (should be
<= 1 everywhere and ~1 when full), and the weight vs the local weight
cap n*max(q).  Summarizes per (scale, delta, dist): mean dk of interior
centroids, max dk, and the share of interior centroids at least
half-full — the "bins are well filled" claim of the t-digest paper.

Writes docs/BINFILL.md + docs/bin_fill.csv.  Deterministic seeds.
Usage: python tools/bin_fill.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t_digest_spark.core import TDigest  # noqa: E402
from t_digest_spark.scale import get_scale  # noqa: E402

N = 100_000
SCALES = ("K_0", "K_1", "K_2", "K_3")
DELTAS = (50, 100)


def dists():
    rng = np.random.default_rng(21)
    yield "uniform", rng.uniform(size=N)
    yield "gamma(0.1)", rng.gamma(0.1, 10.0, size=N)
    yield "lognormal", rng.lognormal(0, 2, size=N)


def main() -> None:
    rows = []
    md = [
        "# Bin-fill study — centroid k-span vs budget\n",
        "Reference analogue: quality/BinFill.java:41-125.  For each "
        "centroid, dk = k(q1) - k(q0) is its k-span; the merge "
        "criterion guarantees dk <= 1 (+fp slack) and a well-tuned "
        "digest keeps interior bins mostly full (dk near 1).  Interior "
        "= all but the forced singleton endpoints.\n",
        "| scale | δ | dist | centroids | mean dk (interior) | max dk "
        "(interior) | ≥half-full share | check_weights |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, data in [(n, d) for n, d in dists()]:
        for scale in SCALES:
            for delta in DELTAS:
                td = TDigest(float(delta), scale=scale)
                td.add_batch(data)
                means, weights = td.centroids()
                n = float(weights.sum())
                sc = get_scale(scale)
                norm = sc.normalizer(td.public_compression, n)
                q1s = np.cumsum(weights) / n
                q0s = q1s - weights / n
                ks0 = sc.k(q0s, norm)
                ks1 = sc.k(q1s, norm)
                dk = ks1 - ks0
                interior = slice(1, len(means) - 1)
                dki = dk[interior]
                for j in range(len(means)):
                    rows.append((scale, delta, name, j,
                                 float((q0s[j] + q1s[j]) / 2),
                                 float(means[j]), float(dk[j]),
                                 float(weights[j])))
                try:
                    td.check_weights()   # the reference invariant
                    wc = "pass"
                except AssertionError:
                    wc = "FAIL"
                md.append(
                    f"| {scale} | {delta} | {name} | {len(means)} "
                    f"| {dki.mean():.3f} | {dki.max():.3f} "
                    f"| {(dki >= 0.5).mean():.2f} | {wc} |")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "docs", "BINFILL.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    with open(os.path.join(here, "docs", "bin_fill.csv"), "w") as f:
        f.write("scale,delta,dist,centroid,q_mid,mean,dk,count\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print("wrote docs/BINFILL.md +", len(rows), "csv rows")


if __name__ == "__main__":
    main()
