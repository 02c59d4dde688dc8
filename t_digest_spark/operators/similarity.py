"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k for a query vector.  The
  query is a broadcast literal; the dot product is a JVM
  ``aggregate(zip_with(...))`` expression (no Python in the scan), so
  the plan is scan → project → TakeOrderedAndProject — embarrassingly
  parallel and the right baseline at any scale.
- ``lsh_topk``: random-hyperplane-bucketed approximate variant — probe
  only rows whose sign-bucket is within ``probe_hamming`` of the
  query's bucket (multi-probe LSH).  At 100 TB the bucket predicate
  prunes the scan to a small fraction before any distance math.
- ``ivf_build`` / ``ivf_topk``: inverted-file index — k-means-lite
  centroids (NumPy, sampled), assignment JVM-side via a small broadcast
  centroid table, probe the ``nprobe`` nearest lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["brute_force_topk", "brute_force_topk_batch", "lsh_topk",
           "ivf_fit", "ivf_assign", "ivf_save", "ivf_load",
           "ivf_build", "ivf_topk", "ivf_topk_batch", "cosine_to_query"]


def _dot_with_literal(vec_col, query: np.ndarray):
    qarr = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, qarr, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(vec_col):
    return F.sqrt(F.aggregate(
        F.transform(vec_col, lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_to_query(vec_col, query) -> "F.Column":
    query = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(query))
    return _dot_with_literal(vec_col, query) / (_norm(vec_col) * qn)


def brute_force_topk(df: DataFrame, query, k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k; deterministic tiebreak by id."""
    scored = df.select(
        F.col(id_col),
        cosine_to_query(vec_col, query).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _bucket_expr(vec_col, planes: np.ndarray):
    """Sign-bit bucket as a JVM expression: one aggregate per plane."""
    bits = []
    for i, p in enumerate(planes):
        dot = _dot_with_literal(vec_col, p)
        bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(df: DataFrame, query, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", n_planes: int = 8,
             probe_hamming: int = 1, seed: int = 13,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: multi-probe random-hyperplane LSH.

    Scans only rows whose bucket is within ``probe_hamming`` bit flips
    of the query bucket, then exact cosine on the survivors.
    """
    query = np.asarray(query, dtype=np.float64)
    if dim is None:
        dim = int(query.size)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    qbits = int(sum((1 << i) for i, p in enumerate(planes)
                    if float(p @ query) > 0))
    probes = {qbits}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qbits ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbits ^ (1 << i) ^ (1 << j))
    bucketed = df.withColumn("__bucket", _bucket_expr(vec_col, planes))
    hit = bucketed.where(F.col("__bucket").isin(*sorted(probes)))
    return brute_force_topk(hit, query, k, vec_col, id_col)


def _kmeans_cosine(X: np.ndarray, n_lists: int, iters: int,
                   seed: int) -> np.ndarray:
    """Spherical k-means on unit-normalized rows (driver-side NumPy —
    the sample is small by construction)."""
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _bottom_m_map(m: int):
    """Arrow kernel: keep the ``m`` smallest ``__k`` keys (with their
    vectors) per partition — incremental prune per batch, so memory is
    bounded by m + one batch regardless of partition size."""
    import pyarrow as pa

    def bottom_m(batches):
        keys = None
        vecs = None
        for batch in batches:
            k = batch.column(0).to_numpy(zero_copy_only=False)
            v = batch.column(1)
            if keys is not None:
                k = np.concatenate([keys, k])
                v = pa.concat_arrays([vecs, v])
            if len(k) > m:
                idx = np.argpartition(k, m)[:m]
                keys = k[idx]
                vecs = v.take(pa.array(idx))
            else:
                keys, vecs = k, v
        if keys is not None and len(keys):
            yield pa.RecordBatch.from_arrays(
                [pa.array(keys, type=pa.float64()), vecs],
                names=["__k", "__v"])

    return bottom_m


def _ivf_sample_plan(df: DataFrame, vec_col: str, sample: int,
                     sample_per_partition: int, seed: int,
                     reduce_partitions: int = 2) -> DataFrame:
    """The bounded-driver-traffic sampling plan behind ``ivf_fit``:

    level 1: each input partition keeps its bottom-
    ``sample_per_partition`` rand keys (mergeable bottom-m sketch);
    level 2: survivors repartition to ``reduce_partitions`` tasks, each
    keeping its bottom-``sample`` (a partition must keep a FULL
    bottom-``sample`` — the global winners could all hash to one task).

    The driver therefore collects at most ``reduce_partitions x
    sample`` rows for ANY input partition count — at 100 TB with ~1e5
    scan partitions, level 1 alone would ship partitions x m vectors
    (~150 GB at 768-dim) to the driver; the second-level reduce caps it
    at a constant (~2 x 2048 rows by default)."""
    schema = "__k double, __v array<double>"
    keyed = df.select(F.rand(seed).alias("__k"),
                      F.col(vec_col).cast("array<double>").alias("__v")) \
        .where(F.col("__v").isNotNull())
    level1 = keyed.mapInArrow(_bottom_m_map(sample_per_partition), schema)
    return (level1.repartition(reduce_partitions)
            .mapInArrow(_bottom_m_map(sample), schema))


def ivf_fit(df: DataFrame, n_lists: int = 16, vec_col: str = "embedding",
            sample: int = 2048, sample_per_partition: int = 256,
            iters: int = 8, seed: int = 17,
            reduce_partitions: int = 2) -> np.ndarray:
    """Train IVF centroids with a DISTRIBUTED uniform sample: every row
    gets a JVM-side ``rand(seed)`` key, each partition keeps its
    bottom-``sample_per_partition`` keys (vectorized argpartition over
    Arrow batches — a mergeable bottom-m sketch, i.e. a uniform sample
    without replacement), a second-level bottom-``sample`` reduce over
    ``reduce_partitions`` tasks caps the survivor set, and the driver
    keeps the global bottom-``sample`` before fitting spherical
    k-means.  Driver traffic is bounded by ``reduce_partitions x
    sample`` rows regardless of table size AND partition count — no
    ``limit().collect()`` over the raw table, and no head-of-table bias
    (the old ``limit(sample)`` sampled whatever partition listed
    first)."""
    rows = _ivf_sample_plan(df, vec_col, sample, sample_per_partition,
                            seed, reduce_partitions).collect()
    rows.sort(key=lambda r: r["__k"])
    X = np.asarray([r["__v"] for r in rows[:sample]], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("ivf_fit: no non-null vectors to sample")
    return _kmeans_cosine(X, n_lists, iters, seed)


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               list_col: str = "__list",
               _impl: str | None = None) -> DataFrame:
    """Assign every row to its nearest centroid (max dot product on
    the raw vector — centroids are unit-norm, so this IS nearest by
    cosine).  Two physical paths, same semantics:

    - small centroid sets (<= 32): pure JVM expression — argmax over a
      literal centroid array, whole-stage-codegen'd, zero Python.
    - larger sets: one Arrow-batched matmul per batch against the
      closure-captured centroid matrix (a literal expression with
      hundreds of aggregate() terms would blow up codegen).

    ``_impl`` ("expr"/"arrow") forces a path — used by the parity test
    only; the default picks by centroid count."""
    if _impl not in (None, "expr", "arrow"):
        raise ValueError(f"unknown _impl {_impl!r}")
    if _impl == "expr" or (_impl is None and len(centroids) <= 32):
        dots = F.array(*[
            F.struct(_dot_with_literal(vec_col, c).alias("dot"),
                     F.lit(i).alias("list_id"))
            for i, c in enumerate(centroids)
        ])
        # Null vectors: aggregate() over a null array yields null dots,
        # and array_max over structs with null fields is implementation-
        # defined — guard explicitly so this path agrees with the Arrow
        # path's -1 sentinel (same pipeline must not change null-row
        # assignment when the centroid count crosses 32).
        vc = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        return df.withColumn(
            list_col,
            F.when(vc.isNull(), F.lit(-1))
            .otherwise(F.array_max(dots).getField("list_id"))
            .cast("int"))
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    cent_t = np.ascontiguousarray(centroids.T)

    @pandas_udf(IntegerType())
    def nearest(vs: pd.Series) -> pd.Series:
        mask = vs.notna().to_numpy()
        out = np.full(len(vs), -1, dtype=np.int32)
        if mask.any():
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vs[mask]])
            out[mask] = (x @ cent_t).argmax(axis=1).astype(np.int32)
        return pd.Series(out)

    return df.withColumn(
        list_col, nearest(F.col(vec_col).cast("array<double>")))


def ivf_save(spark, centroids: np.ndarray, path: str) -> None:
    """Persist the trained centroids as a (list_id, centroid) parquet
    table — train once, reuse across jobs; loaders broadcast it."""
    rows = [(int(i), [float(x) for x in c])
            for i, c in enumerate(centroids)]
    (spark.createDataFrame(rows, "list_id int, centroid array<double>")
     .coalesce(1).write.mode("overwrite").parquet(path))


def ivf_load(spark, path: str) -> np.ndarray:
    """Load persisted centroids back into the (tiny) driver-side
    matrix that ivf_assign/ivf_topk broadcast into their plans."""
    rows = spark.read.parquet(path).orderBy("list_id").collect()
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def ivf_build(df: DataFrame, n_lists: int = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", sample: int = 2048, iters: int = 8,
              seed: int = 17) -> tuple[DataFrame, np.ndarray]:
    """Inverted-file index: distributed sample → NumPy k-means →
    assign every row to its nearest centroid (ivf_assign).
    Returns (indexed_df, centroids).  For a persistent index, follow
    with ``ivf_save`` and later ``ivf_load`` + ``ivf_assign``."""
    cent = ivf_fit(df, n_lists, vec_col, sample=sample, iters=iters,
                   seed=seed)
    return ivf_assign(df, cent, vec_col), cent


def ivf_topk(indexed: DataFrame, centroids: np.ndarray, query,
             k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Probe the nprobe nearest inverted lists, exact cosine inside."""
    query = np.asarray(query, dtype=np.float64)
    qn = query / max(np.linalg.norm(query), 1e-12)
    order = np.argsort(-(centroids @ qn))[:nprobe]
    hit = indexed.where(F.col("__list").isin(*[int(i) for i in order]))
    return brute_force_topk(hit, query, k, vec_col, id_col)


def brute_force_topk_batch(df: DataFrame, queries: DataFrame, k: int = 10,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           qid_col: str = "query_id",
                           qvec_col: str = "query_vec") -> DataFrame:
    """Exact cosine top-k for MANY query vectors in ONE job.

    ``queries`` is a small (query_id, query_vec) table, broadcast; the
    scored rows rank per query via a window over query_id — one scan of
    ``df`` regardless of query count, instead of one job per query.
    Deterministic tiebreak by id.
    """
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"),
                   F.col(qvec_col).cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    scored = df.crossJoin(F.broadcast(queries)).select(
        F.col(qid_col), F.col(id_col),
        (dot / (_norm(vec_col) * _norm(qvec_col))).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(qid_col, id_col, "cosine", F.col("__rn").alias("rank")))


def ivf_topk_batch(indexed: DataFrame, centroids: np.ndarray,
                   queries: DataFrame, k: int = 10, nprobe: int = 4,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   qid_col: str = "query_id",
                   qvec_col: str = "query_vec") -> DataFrame:
    """IVF top-k for MANY queries in ONE job.

    Builds the (query_id, probed list_id) table driver-side (tiny:
    #queries x nprobe rows from the broadcast centroid matrix), joins
    it against the indexed rows on ``__list`` — so each query only
    scores rows in its probed inverted lists — then ranks per query.
    """
    spark = indexed.sparkSession
    qrows = queries.collect()  # bounded: the query set is small by contract
    probe_rows = []
    for r in qrows:
        q = np.asarray(r[qvec_col], dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        for li in np.argsort(-(centroids @ qn))[:nprobe]:
            probe_rows.append((r[qid_col], int(li)))
    probes = spark.createDataFrame(probe_rows, f"{qid_col} long, __list int")
    hit = indexed.join(F.broadcast(probes), "__list")
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"),
                   F.col(qvec_col).cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    scored = hit.join(F.broadcast(queries), qid_col).select(
        F.col(qid_col), F.col(id_col),
        (dot / (_norm(vec_col) * _norm(qvec_col))).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(qid_col, id_col, "cosine", F.col("__rn").alias("rank")))
