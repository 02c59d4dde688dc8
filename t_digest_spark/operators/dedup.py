"""Deduplication operators for training-data pipelines.

Five levels, all shaped for 100 TB inputs:

- ``exact_dedup``          — hash-groupBy on a normalized fingerprint
  (one shuffle of (hash, id) pairs, never text).
- ``minhash_lsh_pairs``    — shingle → minhash signature → banded LSH
  bucket join → verified Jaccard.  Candidate generation touches only
  (band_hash, id); signatures are Arrow-batched NumPy.
- ``simhash_pairs``        — 64-bit simhash, chunked into 4x16-bit
  bucket keys so any pair within Hamming distance 3 shares a chunk
  (pigeonhole), verified by exact Hamming distance.
- ``ngram_jaccard``        — exact shingle-set Jaccard for a candidate
  pair set (the verifier used by both LSH paths).
- ``embedding_cosine_pairs`` — banded sign-of-random-hyperplane LSH
  over an embedding column (OR of n_bands AND-bands, like MinHash
  banding), cosine-verified.

Candidate joins are joins between small derived tables; Catalyst/AQE
broadcast them when they fit.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .text import fingerprint, shingle_fingerprints

__all__ = [
    "exact_dedup", "exact_dup_groups", "minhash_signature",
    "minhash_lsh_pairs", "simhash", "simhash_pairs", "ngram_jaccard",
    "embedding_cosine_pairs",
]

_MERSENNE = (1 << 61) - 1


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for uint64 x, using 2^61 ≡ 1 (mod p)."""
    p = np.uint64(_MERSENNE)
    x = (x >> np.uint64(61)) + (x & p)
    x = (x >> np.uint64(61)) + (x & p)
    return np.where(x >= p, x - p, x)


def _mulmod61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(a * h) mod (2^61 - 1) without overflow, both inputs already in
    [0, p).  Split into 31/30-bit limbs so every partial product fits
    uint64, then fold with 2^61 ≡ 1 (so 2^62 ≡ 2):

        a·h = a1·h1·2^62 + (a1·h0 + a0·h1)·2^31 + a0·h0

    This makes (a·h + b) mod p the genuine (a,b)-universal hash family
    the MinHash analysis assumes — plain uint64 arithmetic wraps a·h
    mod 2^64 BEFORE the Mersenne mod, which is not that family."""
    m31 = np.uint64((1 << 31) - 1)
    a1, a0 = a >> np.uint64(31), a & m31          # a1 < 2^30, a0 < 2^31
    h1, h0 = h >> np.uint64(31), h & m31
    t = a1 * h0 + a0 * h1                         # < 2^62
    # t·2^31 = t1·2^61 + t0·2^31 ≡ t1 + t0·2^31  (t = t1·2^30 + t0)
    mid = (t >> np.uint64(30)) + \
        ((t & np.uint64((1 << 30) - 1)) << np.uint64(31))
    x = np.uint64(2) * a1 * h1 + mid + a0 * h0    # < 2^63: safe
    return _mod61(x)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", keep: str = "min") -> DataFrame:
    """Keep one row per distinct normalized text: group by fingerprint,
    keep the min/max id.  Shuffles only (fingerprint, id)."""
    fp = df.select(F.col(id_col),
                   fingerprint(text_col).alias("__fp"))
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    keepers = fp.groupBy("__fp").agg(agg.alias(id_col)).select(id_col)
    return df.join(keepers, on=id_col, how="inner")


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Duplicate clusters: fingerprint → count + member ids (ids only
    for groups with >1 member)."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("__fp"))
    return (fp.groupBy("__fp")
            .agg(F.count("*").alias("n_dups"),
                 F.sort_array(F.collect_list(id_col)).alias("ids"))
            .where(F.col("n_dups") > 1))


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles_col, num_perm: int = 64,
                      seed: int = 7):
    """MinHash signature (array<long>) from an array-of-shingle-hashes
    column.  Vectorized: one (num_perm x n_shingles) NumPy min-reduce
    per row batch via a pandas UDF (shingle hashing itself already
    happened JVM-side in shingle_fingerprints)."""
    a, b = _perm_params(num_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def f(sh: pd.Series) -> pd.Series:
        aa = a.astype(np.uint64)[:, None]
        bb = b.astype(np.uint64)[:, None]
        n = len(sh)
        out = [None] * n
        vals = sh.to_numpy()
        lens = np.fromiter((0 if v is None else len(v) for v in vals),
                           dtype=np.int64, count=n)
        idx = np.flatnonzero(lens > 0)
        # whole-batch vectorization in row chunks: concatenate the
        # chunk's shingle hashes, one (num_perm x total_shingles)
        # modular-hash matrix, per-row minima via minimum.reduceat on
        # the row boundaries.  The chunk target bounds the matrix (and
        # the split-multiply temporaries) to ~num_perm * 64Ki u64.
        target = 65536
        start = 0
        while start < len(idx):
            end, tot = start, 0
            while end < len(idx) and (tot == 0
                                      or tot + lens[idx[end]] <= target):
                tot += lens[idx[end]]
                end += 1
            rows = idx[start:end]
            flat = np.concatenate(
                [np.asarray(vals[i], dtype=np.int64) for i in rows]
            ).astype(np.uint64)[None, :]
            sig = _mod61(_mulmod61(aa, _mod61(flat)) + bb)
            starts = np.concatenate(([0], np.cumsum(lens[rows])[:-1]))
            mins = np.minimum.reduceat(sig, starts, axis=1) \
                .astype(np.int64)
            for j, i in enumerate(rows):
                out[i] = mins[:, j].tolist()
            start = end
        return pd.Series(out)

    return f(shingles_col)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k_shingle: int = 5,
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.7,
                      verify: bool = True) -> DataFrame:
    """Near-duplicate pairs by MinHash + banded LSH.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold (estimated from signatures when verify=False).
    """
    rows_per_band = num_perm // bands
    sigs = df.select(
        F.col(id_col),
        shingle_fingerprints(text_col, k_shingle).alias("__sh"),
    ).withColumn("__sig", minhash_signature("__sh", num_perm))

    # band key: hash of each signature slice; explode to (band, key, id)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        id_col, "__sig",
        F.posexplode(F.transform(
            band_idx,
            lambda i: F.xxhash64(F.concat_ws(
                ",", F.slice("__sig", i * rows_per_band + 1,
                             rows_per_band))))).alias("__band", "__key"),
    )
    cand = (banded.alias("l")
            .join(banded.alias("r"),
                  on=[F.col("l.__band") == F.col("r.__band"),
                      F.col("l.__key") == F.col("r.__key"),
                      F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.__sig").alias("__sig_a"),
                    F.col("r.__sig").alias("__sig_b"))
            .dropDuplicates(["id_a", "id_b"]))
    # signature-estimated jaccard (fraction of matching minhashes)
    est = cand.withColumn(
        "jaccard",
        F.aggregate(
            F.zip_with("__sig_a", "__sig_b",
                       lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0), lambda acc, v: acc + v) / F.lit(num_perm),
    ).select("id_a", "id_b", "jaccard")
    if not verify:
        return est.where(F.col("jaccard") >= threshold)
    # exact verification on the candidate set only
    sh = df.select(F.col(id_col),
                   shingle_fingerprints(text_col, k_shingle).alias("__sh"))
    verified = (est
                .join(sh.select(F.col(id_col).alias("id_a"),
                                F.col("__sh").alias("__sh_a")), "id_a")
                .join(sh.select(F.col(id_col).alias("id_b"),
                                F.col("__sh").alias("__sh_b")), "id_b")
                .withColumn("jaccard", ngram_jaccard("__sh_a", "__sh_b"))
                .select("id_a", "id_b", "jaccard"))
    return verified.where(F.col("jaccard") >= threshold)


def ngram_jaccard(sh_a, sh_b):
    """Exact Jaccard of two shingle-hash arrays (JVM set ops)."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def simhash(text_col, num_bits: int = 64, seed: int = 11):
    """64-bit SimHash from token hashes: per bit, sign of the sum of
    ±1 contributions.  Token hashing JVM-side; bit-vote NumPy."""
    toks = F.transform(
        F.split(F.lower(F.trim(text_col if not isinstance(text_col, str)
                               else F.col(text_col))), r"\s+"),
        lambda w: F.xxhash64(w))

    @pandas_udf(LongType())
    def votes(hs: pd.Series) -> pd.Series:
        # whole-batch vectorization: concatenate every row's token
        # hashes, per-bit ±1 contributions in one (tokens x bits)
        # matrix, per-row sums via add.reduceat on the row boundaries,
        # then one shifted-sum bit-pack — no per-row Python loop.
        bits = np.arange(num_bits, dtype=np.uint64)
        lens = np.fromiter(
            (0 if a is None else len(a) for a in hs),
            dtype=np.int64, count=len(hs))
        out = np.zeros(len(hs), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in hs[nz]]
            ).astype(np.uint64)[:, None]
            contrib = (2 * ((flat >> bits[None, :]) & np.uint64(1))
                       .astype(np.int32) - 1)
            nz_lens = lens[nz]
            starts = np.concatenate(([0], np.cumsum(nz_lens)[:-1]))
            v = np.add.reduceat(contrib, starts, axis=0)   # (rows, bits)
            packed = (((v > 0).astype(np.uint64) << bits[None, :])
                      .sum(axis=1))
            out[nz] = packed.astype(np.int64)
        return pd.Series(out)

    return votes(toks)


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs whose simhashes differ in <= max_hamming bits.

    Bucket on each of (max_hamming + 1) bit chunks — by pigeonhole, a
    pair within the Hamming budget shares at least one chunk — then
    verify the exact Hamming distance.  Default 4 x 16-bit chunks for
    the conventional <=3-bit budget; larger budgets mean narrower
    chunks and proportionally more candidates.
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    sh = df.select(F.col(id_col), simhash(text_col).alias("__simhash"))
    chunks = sh.select(
        id_col, "__simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("__simhash", i * width).bitwiseAND(mask)
            for i in range(n_chunks)
        ])).alias("__chunk", "__ckey"))
    cand = (chunks.alias("l")
            .join(chunks.alias("r"),
                  on=[F.col("l.__chunk") == F.col("r.__chunk"),
                      F.col("l.__ckey") == F.col("r.__ckey"),
                      F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.__simhash").alias("__ha"),
                    F.col("r.__simhash").alias("__hb"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn(
        "hamming", F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"))


def embedding_cosine_pairs(df: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id", n_planes: int = 16,
                           n_bands: int = 4, threshold: float = 0.95,
                           seed: int = 13, dim: int | None = None) -> DataFrame:
    """Near-duplicate embeddings: banded random-hyperplane LSH, then
    exact cosine verification of the candidates.

    Each of ``n_bands`` bands hashes the sign bits of ``n_planes``
    independent projections; candidates collide in ANY band (same
    OR-of-ANDs shape as MinHash banding), so the per-pair miss
    probability at cosine c is (1 - p^n_planes)^n_bands with
    p = 1 - acos(c)/pi — e.g. < 1e-7 at c = 0.999 with 4x16.  Buckets
    are computed batch-vectorized (one matmul per Arrow batch); the
    join key is (band, bucket) so candidates never leave their band's
    bucket — at 10^9 rows this shuffles ids + vectors once, never
    all-pairs."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_bands, n_planes, dim)).astype(np.float64)
    weights = (1 << np.arange(n_planes, dtype=np.uint64))

    @pandas_udf(ArrayType(LongType()))
    def buckets(vs: pd.Series) -> pd.Series:
        mask = vs.notna().to_numpy()
        out: list = [None] * len(vs)
        if mask.any():
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vs[mask]])            # (rows, dim)
            sig = np.einsum("bpd,rd->rbp", planes, x) > 0
            codes = (sig.astype(np.uint64) * weights).sum(axis=2) \
                .astype(np.int64).tolist()
            for j, row in zip(np.flatnonzero(mask), codes):
                out[j] = row
        return pd.Series(out)

    b = df.select(F.col(id_col),
                  F.col(vec_col).cast("array<double>").alias("__v"),
                  F.posexplode(buckets(vec_col)).alias("__band", "__bucket"))
    cand = (b.alias("l")
            .join(b.alias("r"),
                  on=[F.col("l.__band") == F.col("r.__band"),
                      F.col("l.__bucket") == F.col("r.__bucket"),
                      F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.__v").alias("__va"),
                    F.col("r.__v").alias("__vb"))
            .dropDuplicates(["id_a", "id_b"]))
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform("__va", lambda x: x * x),
                            F.lit(0.0), lambda a, v: a + v))
    nb = F.sqrt(F.aggregate(F.transform("__vb", lambda x: x * x),
                            F.lit(0.0), lambda a, v: a + v))
    return (cand.withColumn("cosine", dot / (na * nb))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
