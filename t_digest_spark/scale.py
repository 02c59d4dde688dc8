"""Scale functions for the t-digest: the q <-> k mappings that control
adaptive cluster sizing.

Semantics follow the reference (tdunning/t-digest) enum
``core/src/main/java/com/tdunning/math/stats/ScaleFunction.java:30-483``:

- ``K_0``   — uniform cluster sizes (comparison only).
- ``K_1``   — sizes ~ sqrt(q(1-q)) via arcsin.  (``K_1_FAST`` in the
  reference only swaps in a polynomial asin approximation,
  ScaleFunction.java:574-637; NumPy's arcsin is already vectorized so
  here it is a straight alias.)
- ``K_2``   — sizes ~ q(1-q), normalizer Z = 4 ln(n/delta) + 24
  (ScaleFunction.java:278-280).  Default for MergingDigest.
- ``K_3``   — sizes ~ min(q, 1-q), normalizer Z = 4 ln(n/delta) + 21
  (ScaleFunction.java:351-353).
- ``K_2_NO_NORM`` / ``K_3_NO_NORM`` — un-normalized variants; the
  reference rejects them for MergingDigest (MergingDigest.java:853-856)
  and so do we — they exist only for scale-function parity tests.

All functions are NumPy-vectorized: they accept scalars or ndarrays.
``limit_call`` of the reference (ScaleFunction.java:642-650) becomes
``np.clip`` on the input.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "K_0",
    "K_1",
    "K_1_FAST",
    "K_2",
    "K_3",
    "K_2_NO_NORM",
    "K_3_NO_NORM",
    "SCALE_FUNCTIONS",
    "get_scale",
]

_EPS = 1e-15


class _ScaleFunction:
    """Contract per ScaleFunction.java:494-563: k(q), q(k), max(q) and
    normalizer(compression, n), in both (compression, n) and
    pre-computed-normalizer forms."""

    name = "?"
    #: usable by MergingDigest (NO_NORM variants are not)
    normalized = True

    # -- normalizer form (hot path) ------------------------------------
    def k(self, q, normalizer):
        raise NotImplementedError

    def q(self, k, normalizer):
        raise NotImplementedError

    def max_size(self, q, normalizer):
        """Maximum cluster size (as a fraction of total weight) at q."""
        raise NotImplementedError

    def normalizer(self, compression, n):
        raise NotImplementedError

    # -- pure-Python scalar forms (merge-loop hot path: one call per
    #    output centroid; avoids NumPy scalar-dispatch overhead) -------
    def max_py(self, q: float, normalizer: float) -> float:
        return float(self.max_size(q, normalizer))

    def k_py(self, q: float, normalizer: float) -> float:
        return float(self.k(q, normalizer))

    def q_py(self, k: float, normalizer: float) -> float:
        return float(self.q(k, normalizer))

    # -- (compression, n) form (parity tests) --------------------------
    def k_cn(self, q, compression, n):
        return self.k(q, self.normalizer(compression, n))

    def q_cn(self, k, compression, n):
        return self.q(k, self.normalizer(compression, n))

    def max_cn(self, q, compression, n):
        return self.max_size(q, self.normalizer(compression, n))

    def __repr__(self):  # pragma: no cover
        return self.name


class _K0(_ScaleFunction):
    name = "K_0"

    def k(self, q, normalizer):
        return normalizer * np.asarray(q, dtype=np.float64)

    def q(self, k, normalizer):
        return np.asarray(k, dtype=np.float64) / normalizer

    def max_size(self, q, normalizer):
        return np.broadcast_to(np.float64(1.0 / normalizer), np.shape(q)).copy() \
            if np.ndim(q) else 1.0 / normalizer

    def normalizer(self, compression, n):
        return compression / 2.0

    def max_py(self, q, normalizer):
        return 1.0 / normalizer

    def k_py(self, q, normalizer):
        return normalizer * q

    def q_py(self, k, normalizer):
        return k / normalizer


class _K1(_ScaleFunction):
    name = "K_1"

    def k(self, q, normalizer):
        q = np.clip(np.asarray(q, dtype=np.float64), _EPS, 1 - _EPS)
        return normalizer * np.arcsin(2 * q - 1)

    def q(self, k, normalizer):
        x = np.clip(np.asarray(k, dtype=np.float64) / normalizer,
                    -np.pi / 2, np.pi / 2)
        return (np.sin(x) + 1) / 2

    def max_size(self, q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        inside = (q > 0) & (q < 1)
        out = np.zeros_like(q, dtype=np.float64)
        qq = np.where(inside, q, 0.5)
        out = np.where(
            inside,
            2 * np.sin(0.5 / normalizer) * np.sqrt(qq * (1 - qq)),
            0.0,
        )
        return out if out.ndim else float(out)

    def normalizer(self, compression, n):
        return compression / (2 * np.pi)

    def max_py(self, q, normalizer):
        if q <= 0 or q >= 1:
            return 0.0
        return 2 * math.sin(0.5 / normalizer) * math.sqrt(q * (1 - q))

    def k_py(self, q, normalizer):
        q = min(max(q, 1e-15), 1 - 1e-15)
        return normalizer * math.asin(2 * q - 1)

    def q_py(self, k, normalizer):
        x = min(max(k / normalizer, -math.pi / 2), math.pi / 2)
        return (math.sin(x) + 1) / 2


class _K1Fast(_K1):
    # np.arcsin is vectorized; the reference's fastAsin is a scalar-JVM
    # speed hack (ScaleFunction.java:574-637) with no NumPy analogue.
    name = "K_1_FAST"


class _K2(_ScaleFunction):
    name = "K_2"

    def k(self, q, normalizer):
        q = np.clip(np.asarray(q, dtype=np.float64), _EPS, 1 - _EPS)
        return np.log(q / (1 - q)) * normalizer

    def q(self, k, normalizer):
        w = np.exp(np.asarray(k, dtype=np.float64) / normalizer)
        return w / (1 + w)

    def max_size(self, q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        out = q * (1 - q) / normalizer
        return out if out.ndim else float(out)

    def normalizer(self, compression, n):
        return compression / self._z(compression, n)

    def max_py(self, q, normalizer):
        return q * (1 - q) / normalizer

    def k_py(self, q, normalizer):
        q = min(max(q, 1e-15), 1 - 1e-15)
        return math.log(q / (1 - q)) * normalizer

    def q_py(self, k, normalizer):
        w = math.exp(k / normalizer)
        return w / (1 + w)

    @staticmethod
    def _z(compression, n):
        return 4 * np.log(n / compression) + 24

    def k_cn(self, q, compression, n):
        # special-cased for n <= 1 (ScaleFunction.java:224-233)
        if n <= 1:
            q = np.asarray(q, dtype=np.float64)
            out = np.where(q <= 0, -10.0, np.where(q >= 1, 10.0, 0.0))
            return out if out.ndim else float(out)
        return self.k(q, self.normalizer(compression, n))


class _K3(_ScaleFunction):
    name = "K_3"

    def k(self, q, normalizer):
        q = np.clip(np.asarray(q, dtype=np.float64), _EPS, 1 - _EPS)
        lo = np.log(2 * np.minimum(q, 0.5)) * normalizer
        hi = -np.log(2 * np.minimum(1 - q, 0.5)) * normalizer
        out = np.where(q <= 0.5, lo, hi)
        return out if out.ndim else float(out)

    def q(self, k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        neg = np.exp(np.minimum(k, 0.0) / normalizer) / 2
        pos = 1 - np.exp(-np.maximum(k, 0.0) / normalizer) / 2
        out = np.where(k <= 0, neg, pos)
        return out if out.ndim else float(out)

    def max_size(self, q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        out = np.minimum(q, 1 - q) / normalizer
        return out if out.ndim else float(out)

    def normalizer(self, compression, n):
        return compression / self._z(compression, n)

    def max_py(self, q, normalizer):
        return min(q, 1 - q) / normalizer

    def k_py(self, q, normalizer):
        q = min(max(q, 1e-15), 1 - 1e-15)
        if q <= 0.5:
            return math.log(2 * q) * normalizer
        return -math.log(2 * (1 - q)) * normalizer

    def q_py(self, k, normalizer):
        if k <= 0:
            return math.exp(k / normalizer) / 2
        return 1 - math.exp(-k / normalizer) / 2

    @staticmethod
    def _z(compression, n):
        return 4 * np.log(n / compression) + 21


class _K2NoNorm(_K2):
    name = "K_2_NO_NORM"
    normalized = False

    def normalizer(self, compression, n):  # ScaleFunction.java:362-420
        return compression

    def k_cn(self, q, compression, n):
        return self.k(q, compression)


class _K3NoNorm(_K3):
    name = "K_3_NO_NORM"
    normalized = False

    def normalizer(self, compression, n):
        return compression

    def k_cn(self, q, compression, n):
        return self.k(q, compression)


K_0 = _K0()
K_1 = _K1()
K_1_FAST = _K1Fast()
K_2 = _K2()
K_3 = _K3()
K_2_NO_NORM = _K2NoNorm()
K_3_NO_NORM = _K3NoNorm()

SCALE_FUNCTIONS = {
    s.name: s
    for s in (K_0, K_1, K_1_FAST, K_2, K_3, K_2_NO_NORM, K_3_NO_NORM)
}


def get_scale(name_or_fn):
    if isinstance(name_or_fn, _ScaleFunction):
        return name_or_fn
    try:
        return SCALE_FUNCTIONS[str(name_or_fn).upper()]
    except KeyError:
        raise ValueError(
            f"unknown scale function {name_or_fn!r}; "
            f"one of {sorted(SCALE_FUNCTIONS)}"
        ) from None
