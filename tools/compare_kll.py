"""KLL-vs-t-digest comparison at EQUAL serialized size.

Runnable analogue of the reference quality-module study
(quality/CompareKllTest.java:168-238): for each distribution, build a
t-digest at compression delta, then auto-tune KLL's k so the two
sketches serialize to (approximately) the same number of bytes, and
report rank error |rank(estimate) - q| across a q grid for both.

The published claim this reproduces (docs/vldb/short.tex:270 analogue):
at equal memory, the t-digest's tail error is orders of magnitude
smaller while KLL wins (mildly) in the mid-range, because t-digest
spends its centroid budget non-uniformly via the scale function.

Writes docs/COMPARE_KLL.md + docs/compare_kll.csv.  Deterministic.
Usage: python tools/compare_kll.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t_digest_spark.core import TDigest  # noqa: E402
from t_digest_spark.functions.kll import KLLSketch  # noqa: E402

N = 1_000_000
QS = [1e-4, 1e-3, 1e-2, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 0.9999]
DELTAS = (100, 200)


def rank_of(x: float, s: np.ndarray) -> float:
    lo = np.searchsorted(s, x, side="left")
    hi = np.searchsorted(s, x, side="right")
    return (lo + hi) / 2 / s.size


def dists():
    rng = np.random.default_rng(13)
    yield "uniform", rng.uniform(size=N)
    yield "gamma(0.1)", rng.gamma(0.1, 10.0, size=N)
    yield "lognormal", rng.lognormal(0, 2, size=N)


def tune_kll_k(data: np.ndarray, target_bytes: int) -> KLLSketch:
    """Smallest-|size error| KLL whose serialization is closest to
    target_bytes (binary search on k; retained items grow ~3k)."""
    lo_k, hi_k = 8, 4096
    best, best_err = None, None
    while lo_k <= hi_k:
        k = (lo_k + hi_k) // 2
        s = KLLSketch(k=k, seed=17)
        s.update(data)
        sz = len(s.to_bytes())
        err = abs(sz - target_bytes)
        if best is None or err < best_err:
            best, best_err = s, err
        if sz < target_bytes:
            lo_k = k + 1
        else:
            hi_k = k - 1
    return best


def main() -> None:
    rows = []  # dist, delta, q, td_err, kll_err, td_bytes, kll_bytes, kll_k
    md = [
        "# KLL vs t-digest at equal serialized size\n",
        f"{N:,} samples per distribution; KLL's k is auto-tuned so its "
        "serialization matches the t-digest's byte size (reference "
        "quality/CompareKllTest.java:168-238 analogue).  Cells are "
        "absolute rank error |rank(estimate) - q|.\n",
    ]
    for name, data in dists():
        s = np.sort(data)
        md.append(f"\n## {name}\n")
        for delta in DELTAS:
            td = TDigest(float(delta))
            td.add_batch(data)
            td_bytes = len(td.to_bytes())
            kll = tune_kll_k(data, td_bytes)
            kll_bytes = len(kll.to_bytes())
            md.append(
                f"\n### t-digest δ={delta} ({td_bytes} B) vs "
                f"KLL k={kll.k} ({kll_bytes} B)\n")
            md.append("| q | tdigest | KLL | tdigest wins |")
            md.append("|---|---|---|---|")
            for q in QS:
                e_td = abs(rank_of(td.quantile(q), s) - q)
                e_kll = abs(rank_of(kll.quantile(q), s) - q)
                rows.append((name, delta, q, e_td, e_kll,
                             td_bytes, kll_bytes, kll.k))
                md.append(f"| {q} | {e_td:.2e} | {e_kll:.2e} | "
                          f"{'yes' if e_td <= e_kll else 'no'} |")
            tail = [r for r in rows[-len(QS):]
                    if r[2] <= 1e-3 or r[2] >= 0.999]
            td_tail = max(r[3] for r in tail)
            kll_tail = max(r[4] for r in tail)
            md.append(
                f"\nworst tail (q≤0.001 or ≥0.999) error: tdigest "
                f"{td_tail:.2e} vs KLL {kll_tail:.2e} "
                f"({kll_tail / max(td_tail, 1e-12):.0f}x)")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "docs", "COMPARE_KLL.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    with open(os.path.join(here, "docs", "compare_kll.csv"), "w") as f:
        f.write("dist,delta,q,tdigest_rank_err,kll_rank_err,"
                "tdigest_bytes,kll_bytes,kll_k\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print("wrote docs/COMPARE_KLL.md +", len(rows), "csv rows")


if __name__ == "__main__":
    main()
