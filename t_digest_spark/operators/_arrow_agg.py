"""Generic two-stage grouped aggregation scaffold for NumPy-state
sketches over Arrow batches.

Pattern shared by every mergeable sketch in this library
(t-digest / count-min / bloom / HLL / histogram / KLL):

  stage 1: mapInArrow over the unshuffled scan; group keys dictionary-
           encoded by Arrow C kernels, rows routed to per-key sketch
           objects via stable-sorted contiguous slices; one serialized
           sketch row per (input partition, key).
  stage 2: groupBy(keys) + applyInPandas merging blobs (or a
           repartition(1) funnel for the global case).

The caller supplies three small callables: make() -> sketch,
update(sketch, values ndarray), and merge_blobs(list[bytes]) -> bytes.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

__all__ = ["grouped_sketch_aggregate"]


def grouped_sketch_aggregate(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    make: Callable[[], object],
    update: Callable[[object, np.ndarray], None],
    to_bytes: Callable[[object], bytes],
    merge_blobs: Callable[[list[bytes]], bytes],
    out_field: str = "sketch",
    value_dtype=np.float64,
    drop_nan: bool = True,
) -> DataFrame:
    import pyarrow as pa

    group_cols = list(group_cols)
    narrow = df.where(F.col(value_col).isNotNull()) \
        .select(*(group_cols + [value_col]))
    n_keys = len(group_cols)
    out_schema = StructType(
        [narrow.schema[c] for c in group_cols]
        + [StructField(out_field, BinaryType(), False),
           StructField("rows", LongType(), False)]
    )

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc

        acc: dict[tuple, object] = {}
        counts: dict[tuple, int] = {}
        key_types: list = [None] * n_keys

        def upd(key, v):
            sk = acc.get(key)
            if sk is None:
                sk = make()
                acc[key] = sk
                counts[key] = 0
            update(sk, v)
            counts[key] += v.size

        for batch in batches:
            v = batch.column(n_keys).to_numpy(zero_copy_only=False)
            if v.dtype != value_dtype:
                v = v.astype(value_dtype)
            ok = ~np.isnan(v) if drop_nan and v.dtype.kind == "f" else None
            if n_keys == 0:
                vv = v[ok] if ok is not None and not ok.all() else v
                if vv.size:
                    upd((), vv)
                continue
            combined = None
            for i in range(n_keys):
                key_types[i] = batch.schema.field(i).type
                enc = pc.dictionary_encode(batch.column(i))
                codes = pc.fill_null(enc.indices, -1).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                combined = codes + 1 if combined is None \
                    else combined * (len(enc.dictionary) + 1) + (codes + 1)
            if ok is not None:
                combined = np.where(ok, combined, -1)
            order = np.argsort(combined, kind="stable")
            sc = combined[order]
            bounds = np.flatnonzero(np.diff(sc)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sc.size]))
            sv = v[order]
            for s, e in zip(starts, ends):
                if sc[s] < 0:
                    continue
                row0 = order[s]
                key = tuple(batch.column(i)[row0].as_py()
                            for i in range(n_keys))
                upd(key, sv[s:e])

        if acc:
            keys = list(acc.keys())
            arrays = [pa.array([k[i] for k in keys], type=key_types[i])
                      for i in range(n_keys)]
            arrays.append(pa.array([to_bytes(acc[k]) for k in keys],
                                   type=pa.binary()))
            arrays.append(pa.array([counts[k] for k in keys],
                                   type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=group_cols + [out_field, "rows"])

    partials = narrow.mapInArrow(build, schema=out_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = merge_blobs([bytes(b) for b in pdf[out_field]])
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        head[out_field] = [blob]
        head["rows"] = [int(pdf["rows"].sum())]
        return pd.DataFrame(head)

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(
            merge, schema=out_schema)

    def merge_gen(batches):
        blobs: list[bytes] = []
        rows = 0
        for pdf in batches:
            blobs.extend(bytes(b) for b in pdf[out_field])
            rows += int(pdf["rows"].sum())
        if not blobs:
            blobs = [to_bytes(make())]
        yield pd.DataFrame({out_field: [merge_blobs(blobs)],
                            "rows": [rows]})

    return partials.repartition(1).mapInPandas(merge_gen, schema=out_schema)
