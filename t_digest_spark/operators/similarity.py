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

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["brute_force_topk", "brute_force_topk_batch", "lsh_topk",
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


def ivf_build(df: DataFrame, n_lists: int = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", sample: int = 2048, iters: int = 8,
              seed: int = 17) -> tuple[DataFrame, np.ndarray]:
    """Inverted-file index: sample → NumPy k-means → assign every row
    to its nearest centroid JVM-side (argmax over a small broadcast
    literal centroid set).  Returns (indexed_df, centroids)."""
    rows = (df.select(vec_col).limit(sample).collect())
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
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
    # assignment expression: argmax of dot(vec, centroid_c)
    dots = F.array(*[
        F.struct(_dot_with_literal(vec_col, c).alias("dot"),
                 F.lit(i).alias("list_id"))
        for i, c in enumerate(cent)
    ])
    indexed = df.withColumn("__list",
                            F.array_max(dots).getField("list_id"))
    return indexed, cent


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
