"""Two-stage Spark aggregation for count-min / Bloom / HLL sketches.

Spark-first split of work:
- hashing runs JVM-side (``F.xxhash64`` — codegen, vectorized, and the
  same function for build and probe, so estimates line up by construction);
- only int64 hashes cross the Arrow boundary;
- python does pure NumPy array updates;
- merge stages move only sketch blobs (KBs), never rows.

Same partial->merge shape as the t-digest aggregate (aggregate.py), so
skew in the hashed column is irrelevant to stage 1.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DoubleType, LongType, StructField,
    StructType,
)

from ..functions.sketches import (
    BloomFilter, CountMinSketch, HyperLogLog, sketch_from_bytes,
)

__all__ = [
    "sketch_aggregate", "hll_estimate", "cm_estimates", "bloom_contains",
    "hashed", "distinct_count_approx",
]

SKETCH_FIELD = "sketch"
_HASH = "__h"
_WEIGHT = "__w"


def hashed(col) -> Column:
    """The canonical item hash (JVM xxhash64, seed 42)."""
    return F.xxhash64(col)


def _make(kind: str, params: dict):
    if kind == "cm":
        return CountMinSketch(params.get("width", 2048),
                              params.get("depth", 5))
    if kind == "bloom":
        if "expected_items" in params:
            return BloomFilter.ideal(params["expected_items"],
                                     params.get("fpp", 0.01))
        return BloomFilter(params.get("m_bits", 1 << 20),
                           params.get("k", 7))
    if kind == "hll":
        return HyperLogLog(params.get("p", 14))
    raise ValueError(f"unknown sketch kind {kind!r}")


def sketch_aggregate(
    df: DataFrame,
    item_col: str,
    kind: str,
    group_cols: Sequence[str] = (),
    weight_col: str | None = None,
    **params,
) -> DataFrame:
    """Aggregate ``item_col`` into one sketch per group.

    Returns ``group_cols..., sketch binary, rows long``.
    """
    import pyarrow as pa

    group_cols = list(group_cols)
    use_weight = kind == "cm" and weight_col is not None
    sel = [F.col(c) for c in group_cols] + [hashed(item_col).alias(_HASH)]
    if use_weight:
        sel.append(F.col(weight_col).cast("long").alias(_WEIGHT))
    narrow = df.where(F.col(item_col).isNotNull()).select(*sel)
    n_keys = len(group_cols)
    out_schema = StructType(
        [narrow.schema[c] for c in group_cols]
        + [StructField(SKETCH_FIELD, BinaryType(), False),
           StructField("rows", LongType(), False)]
    )

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc

        acc: dict[tuple, object] = {}
        counts: dict[tuple, int] = {}
        key_types: list = [None] * n_keys

        def upd(key, h, w):
            sk = acc.get(key)
            if sk is None:
                sk = _make(kind, params)
                acc[key] = sk
                counts[key] = 0
            if kind == "cm":
                sk.add_hashes(h, w)
            else:
                sk.add_hashes(h)
            counts[key] += h.size

        for batch in batches:
            h = batch.column(n_keys).to_numpy(zero_copy_only=False)
            h = h.astype(np.int64, copy=False)
            w = (batch.column(n_keys + 1).to_numpy(zero_copy_only=False)
                 .astype(np.int64, copy=False) if use_weight else None)
            if n_keys == 0:
                if h.size:
                    upd((), h, w)
                continue
            combined = None
            for i in range(n_keys):
                key_types[i] = batch.schema.field(i).type
                enc = pc.dictionary_encode(batch.column(i))
                codes = pc.fill_null(enc.indices, -1).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                combined = codes + 1 if combined is None \
                    else combined * (len(enc.dictionary) + 1) + (codes + 1)
            order = np.argsort(combined, kind="stable")
            sc = combined[order]
            bounds = np.flatnonzero(np.diff(sc)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sc.size]))
            hs = h[order]
            ws = w[order] if w is not None else None
            for s, e in zip(starts, ends):
                row0 = order[s]
                key = tuple(batch.column(i)[row0].as_py()
                            for i in range(n_keys))
                upd(key, hs[s:e], ws[s:e] if ws is not None else None)

        if acc:
            keys = list(acc.keys())
            arrays = []
            for i, _c in enumerate(group_cols):
                arrays.append(pa.array([k[i] for k in keys],
                                       type=key_types[i]))
            arrays.append(pa.array([acc[k].to_bytes() for k in keys],
                                   type=pa.binary()))
            arrays.append(pa.array([counts[k] for k in keys],
                                   type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=group_cols + [SKETCH_FIELD, "rows"])

    partials = narrow.mapInArrow(build, schema=out_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sks = [sketch_from_bytes(bytes(b)) for b in pdf[SKETCH_FIELD]]
        out = sks[0]
        for s in sks[1:]:
            out.merge(s)
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        head[SKETCH_FIELD] = [out.to_bytes()]
        head["rows"] = [int(pdf["rows"].sum())]
        return pd.DataFrame(head)

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(
            merge, schema=out_schema)

    def merge_gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = None
        rows = 0
        for pdf in batches:
            for b in pdf[SKETCH_FIELD]:
                sk = sketch_from_bytes(bytes(b))
                out = sk if out is None else out.merge(sk)
            rows += int(pdf["rows"].sum())
        if out is None:
            out = _make(kind, params)
        yield pd.DataFrame({SKETCH_FIELD: [out.to_bytes()], "rows": [rows]})

    return partials.repartition(1).mapInPandas(merge_gen, schema=out_schema)


# ---------------------------------------------------------------------
# probes / extraction
# ---------------------------------------------------------------------

def hll_estimate(sketch: Column | str) -> Column:
    @pandas_udf(DoubleType())
    def f(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: np.nan if b is None
            else float(sketch_from_bytes(bytes(b)).estimate()))
    return f(sketch)


def cm_estimates(sketch: Column | str, hash_array: Column) -> Column:
    """Point estimates for a column of item-hash arrays (build the hash
    array with ``F.array(*[hashed(F.lit(v)) for v in items])`` so the
    probe uses the same JVM hash as the build)."""
    @pandas_udf(ArrayType(LongType()))
    def f(blobs: pd.Series, hs: pd.Series) -> pd.Series:
        def one(b, harr):
            if b is None:
                return None
            sk = sketch_from_bytes(bytes(b))
            return [int(x) for x in
                    sk.estimate_hashes(np.asarray(harr, dtype=np.int64))]
        return pd.Series([one(b, h) for b, h in zip(blobs, hs)])
    return f(sketch, hash_array)


def bloom_contains(sketch: Column | str, hash_array: Column) -> Column:
    @pandas_udf(ArrayType(BooleanType()))
    def f(blobs: pd.Series, hs: pd.Series) -> pd.Series:
        def one(b, harr):
            if b is None:
                return None
            sk = sketch_from_bytes(bytes(b))
            return [bool(x) for x in
                    sk.contains_hashes(np.asarray(harr, dtype=np.int64))]
        return pd.Series([one(b, h) for b, h in zip(blobs, hs)])
    return f(sketch, hash_array)


def distinct_count_approx(df: DataFrame, item_col: str,
                          group_cols: Sequence[str] = (),
                          method: str = "hll_own", **params) -> DataFrame:
    """Approximate distinct counts three ways:

    - ``hll_own``: this library's HLL (mergeable, inspectable bytes)
    - ``builtin``: Spark ``approx_count_distinct`` (HLL++)
    - ``datasketches``: Spark 3.5+ ``hll_sketch_agg`` family
    """
    group_cols = list(group_cols)
    if method == "hll_own":
        agg = sketch_aggregate(df, item_col, "hll", group_cols, **params)
        return agg.select(
            *group_cols, hll_estimate(SKETCH_FIELD).alias("approx_distinct"))
    if method == "builtin":
        out = (df.groupBy(*group_cols) if group_cols else df.groupBy())
        return out.agg(F.approx_count_distinct(item_col)
                       .cast("double").alias("approx_distinct"))
    if method == "datasketches":
        out = (df.groupBy(*group_cols) if group_cols else df.groupBy())
        return out.agg(F.hll_sketch_estimate(
            F.hll_sketch_agg(item_col)).cast("double")
            .alias("approx_distinct"))
    raise ValueError(method)
