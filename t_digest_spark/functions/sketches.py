"""Mergeable companion sketches: count-min, Bloom filter, HyperLogLog.

The north rule names the distributed-sketch family (HLL, count-min,
t-digest, KLL, Bloom); the t-digest is the reference's content
(core.py), these are its siblings, built the same Spark-first way:

- items are hashed JVM-side with ``F.xxhash64`` (vectorized, codegen)
  so only int64 hashes ever cross the Arrow boundary;
- per-partition sketch build is pure NumPy over Arrow batches;
- merge is elementwise (add / or / max) — associative + commutative,
  so two-stage (partial -> shuffle tiny sketch rows -> reduce)
  aggregation is exact-in-distribution, like the t-digest.

All state is NumPy arrays; serialization is a small struct header +
``tobytes`` (same idea as the digest codecs in core.py).
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["CountMinSketch", "BloomFilter", "HyperLogLog"]

_MAGIC_CM = 0x434D0001   # 'CM'
_MAGIC_BF = 0x42460001   # 'BF'
_MAGIC_HL = 0x484C0001   # 'HL'

# odd multipliers for double hashing derived from one xxhash64 value
_H2_MULT = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio (splitmix64)
_H2_XOR = np.uint64(0xBF58476D1CE4E5B9)


def _split_hash(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derive two ~independent 64-bit streams from one xxhash64 column
    (splitmix64-style finalization for the second)."""
    h = h.astype(np.uint64, copy=False)
    h2 = (h ^ (h >> np.uint64(30))) * _H2_MULT
    h2 = (h2 ^ (h2 >> np.uint64(27))) * _H2_XOR
    h2 = h2 ^ (h2 >> np.uint64(31))
    return h, h2 | np.uint64(1)  # odd so strides cover the table


class CountMinSketch:
    """Count-min sketch: d x w int64 matrix, conservative point query.

    estimate(x) >= true_count always; overestimate <= eps * N with
    probability 1-delta for w = ceil(e/eps), d = ceil(ln(1/delta)).
    """

    def __init__(self, width: int = 2048, depth: int = 5):
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0  # total added weight

    def add_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None):
        """Vectorized add of pre-hashed items (int64 xxhash64 column)."""
        h1, h2 = _split_hash(np.asarray(hashes))
        w = np.uint64(self.width)
        if weights is None:
            for i in range(self.depth):
                idx = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
                np.add.at(self.table[i], idx, 1)
            self.n += hashes.size
        else:
            weights = np.asarray(weights, dtype=np.int64)
            for i in range(self.depth):
                idx = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
                np.add.at(self.table[i], idx, weights)
            self.n += int(weights.sum())

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        h1, h2 = _split_hash(np.asarray(hashes))
        w = np.uint64(self.width)
        est = None
        for i in range(self.depth):
            idx = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
            row = self.table[i][idx]
            est = row if est is None else np.minimum(est, row)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("count-min shape mismatch")
        self.table += other.table
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        head = struct.pack(">iiiq", _MAGIC_CM, self.depth, self.width,
                           self.n)
        return head + self.table.astype(">i8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketch":
        magic, depth, width, n = struct.unpack_from(">iiiq", buf, 0)
        if magic != _MAGIC_CM:
            raise ValueError("not a count-min sketch")
        out = cls(width, depth)
        out.n = n
        out.table = np.frombuffer(buf, dtype=">i8", offset=20).reshape(
            depth, width).astype(np.int64)
        return out


class BloomFilter:
    """Bloom filter over pre-hashed items; k probes by double hashing.

    False-positive rate ~ (1 - e^{-kn/m})^k; use ``ideal(n, fpp)``.
    """

    def __init__(self, m_bits: int = 1 << 20, k: int = 7):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def ideal(cls, expected_items: int, fpp: float = 0.01) -> "BloomFilter":
        m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / max(1, expected_items) * math.log(2)))
        return cls(m, k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1, h2 = _split_hash(np.asarray(hashes))
        m = np.uint64(self.m)
        pos = np.empty((self.k, h1.size), dtype=np.uint64)
        for i in range(self.k):
            pos[i] = (h1 + np.uint64(i) * h2) % m
        return pos

    def add_hashes(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)
        self.n_added += int(np.asarray(hashes).size)

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit = (self.bits[word] & bit) != 0
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("bloom shape mismatch")
        self.bits |= other.bits
        self.n_added += other.n_added
        return self

    def to_bytes(self) -> bytes:
        head = struct.pack(">iiiq", _MAGIC_BF, self.m, self.k, self.n_added)
        return head + self.bits.astype(">u8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        magic, m, k, n = struct.unpack_from(">iiiq", buf, 0)
        if magic != _MAGIC_BF:
            raise ValueError("not a bloom filter")
        out = cls(m, k)
        out.n_added = n
        out.bits = np.frombuffer(buf, dtype=">u8", offset=20).astype(
            np.uint64)
        return out


class HyperLogLog:
    """Dense HyperLogLog (Flajolet et al. 2007) with the standard small/
    large range corrections; registers merge by elementwise max.
    """

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p in [4,18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes).astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rho = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (valid for the 53-bit range we use)
        rest_hi = (rest >> np.uint64(11)).astype(np.float64)  # 53 bits
        with np.errstate(divide="ignore"):
            lz = 53 - np.floor(np.log2(rest_hi + 0.5)).astype(np.int64) - 1
        rho = np.clip(lz + 1, 1, 64 - self.p).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("hll precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        regs = self.registers.astype(np.float64)
        est = alpha * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * math.log(m / zeros)
        if est > (1 << 32) / 30.0:
            return -(1 << 32) * math.log(1 - est / (1 << 32))
        return float(est)

    def to_bytes(self) -> bytes:
        head = struct.pack(">ii", _MAGIC_HL, self.p)
        return head + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        magic, p = struct.unpack_from(">ii", buf, 0)
        if magic != _MAGIC_HL:
            raise ValueError("not an hll")
        out = cls(p)
        out.registers = np.frombuffer(buf, dtype=np.uint8,
                                      offset=8).copy()
        return out


def sketch_from_bytes(buf: bytes):
    (magic,) = struct.unpack_from(">i", buf, 0)
    return {
        _MAGIC_CM: CountMinSketch,
        _MAGIC_BF: BloomFilter,
        _MAGIC_HL: HyperLogLog,
    }[magic].from_bytes(buf)
