"""Distributed t-digest aggregation over Spark DataFrames.

Execution model (SURVEY.md §3.2, designed for 100 TB inputs):

  stage 1  ``partial_digests``  — mapInPandas over the *unshuffled* scan:
           each input partition builds one digest per group key from
           Arrow batches (NumPy-vectorized, zero per-row Python).  Output
           is (group keys..., digest binary) — ~1 KB per (partition, key).
           This is map-side partial aggregation: the 100 TB of raw rows
           never shuffle; only sketches do.

  stage 2  ``merge_digests_df``  — groupBy(keys) over the tiny digest
           table + applyInPandas merge (MergingDigest.add(List) semantics,
           one concatenated merge pass per group).

  optional ``tree_merge`` — for extreme partition counts (10^5+ partials
           per key) an intermediate salt level bounds any single reduce
           task's fan-in, i.e. treeAggregate over digests.  Mergeability
           makes every layering *equally accurate* (AccuracyTest bounds
           hold for arbitrary splits), so salting/skew handling costs
           nothing in correctness.

Skewed group keys (e.g. hot conv_id / role values) are a non-issue in
stage 1 — each partition emits at most one digest per key regardless of
row skew — and bounded in stage 2 by ``tree_merge``.

Digests travel as the reference-compatible VERBOSE byte encoding
(float64 centroids — SMALL's float32 weights would overflow past 2^24
per centroid, see core.to_small_bytes).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StructField, StructType,
)

from ..core import TDigest, merge_blobs, merge_digests, try_singleton_blob

__all__ = [
    "partial_digests",
    "merge_digests_df",
    "tree_merge",
    "tdigest_aggregate",
    "tdigest_collect",
    "DigestAccumulator",
    "DIGEST_FIELD",
]

DIGEST_FIELD = "digest"

# Group keys are grouped in Python dicts inside the Arrow kernels, so
# they must be canonicalized to match Spark groupBy semantics first:
# NaN keys group together (hash(nan) is id-based on py3.10+, so two
# NaNs decoded from different Arrow batches would otherwise never
# merge), -0.0 groups with 0.0, and array/map-typed keys arrive as
# unhashable lists/dicts from to_pylist.
_NAN_KEY = object()


def _canon_key_val(v):
    if isinstance(v, float):
        if v != v:
            return _NAN_KEY
        if v == 0.0:
            return 0.0  # fold -0.0 into 0.0, like Spark's grouping
        return v
    if isinstance(v, list):
        return tuple(_canon_key_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_key_val(x)) for k, x in v.items()))
    return v


def _canon_key(key: tuple) -> tuple:
    return tuple(_canon_key_val(v) for v in key)


def _norm_orig_val(v):
    """Normalize a RAW group-key value for output: fold -0.0 into 0.0
    (recursively through lists/dicts) so the emitted key matches
    Spark's normalized groupBy output deterministically — a group
    containing both -0.0 and 0.0 must not surface whichever raw form a
    partition saw first.  NaN passes through unchanged (the canonical
    key already unifies NaNs; NaN itself is the correct output)."""
    if isinstance(v, float):
        return 0.0 if v == 0.0 else v
    if isinstance(v, list):
        return [_norm_orig_val(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm_orig_val(x) for k, x in v.items()}
    return v


def _norm_orig(key: tuple) -> tuple:
    return tuple(_norm_orig_val(v) for v in key)


def _shuffle_partitions(df: DataFrame) -> int:
    """spark.sql.shuffle.partitions as an int, tolerating non-numeric
    values some platforms set (e.g. "auto"); falls back to the
    cluster's default parallelism."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism

# Arrow batches are ~10k rows; we let each per-key digest buffer several
# batches before a merge pass (amortized buffering per
# MergingDigest.java:33-49 — bigger buffers are both faster and more
# accurate via two-level compression).
DEFAULT_BUFFER = 1 << 16


def _digest_schema(df: DataFrame, group_cols: Sequence[str]) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    return StructType(
        list(fields)
        + [
            StructField(DIGEST_FIELD, BinaryType(), False),
            StructField("rows", LongType(), False),
        ]
    )


def partial_digests(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    compression: float = 100.0,
    scale: str = "K_2",
    buffer_size: int = DEFAULT_BUFFER,
    weight_col: str | None = None,
) -> DataFrame:
    """Stage 1: per-(input partition, group) digests, no raw-row shuffle.

    Returns a DataFrame ``group_cols... , digest binary, rows long`` with
    at most (#partitions x #distinct keys) rows.

    Implemented over ``mapInArrow`` — values reach NumPy zero-copy-ish
    and group keys are dictionary-encoded by Arrow C kernels, so there
    is no pandas conversion and no per-row Python anywhere.
    """
    group_cols = list(group_cols)
    cols = group_cols + [value_col] + ([weight_col] if weight_col else [])
    narrow = df.select(*cols)  # column pruning reaches the scan
    out_schema = _digest_schema(narrow, group_cols)
    n_keys = len(group_cols)
    has_weight = weight_col is not None

    def build(batches):
        acc = DigestAccumulator(n_keys, group_cols, compression, scale,
                                buffer_size, has_weight)
        for batch in batches:
            acc.update(batch)
        out = acc.finish()
        if out is not None:
            yield out

    return narrow.mapInArrow(build, schema=out_schema)


class DigestAccumulator:
    """Per-partition digest accumulation over Arrow batches laid out as
    (key_cols..., value[, weight]).

    The stage-1 kernel shared by ``partial_digests`` and fused
    operators (e.g. ``sources.tables.latency_digests_clustered``, which
    derives its metric batch in the same Python pass): group keys are
    dictionary-encoded by Arrow C kernels, values reach NumPy
    zero-copy-ish, Python touches each *group* once per batch, never
    each row."""

    def __init__(self, n_keys: int, group_cols: Sequence[str],
                 compression: float, scale: str, buffer_size: int,
                 has_weight: bool = False):
        self.n_keys = n_keys
        self.group_cols = list(group_cols)
        self.compression = compression
        self.scale = scale
        self.buffer_size = buffer_size
        self.has_weight = has_weight
        self.acc: dict[tuple, TDigest] = {}
        self.counts: dict[tuple, int] = {}
        # canon key -> first-seen original values, for emission
        self._orig: dict[tuple, tuple] = {}
        # whether any key column's type can need canonicalization
        # (floats: NaN/-0.0 folding; nested: unhashable) — decided from
        # the first batch's Arrow schema; string/int/timestamp keys
        # skip the per-group canon+norm entirely
        self._needs_canon: bool | None = None
        self.key_schema: list = [None] * n_keys
        # per-key deferred chunks: when a batch spans many groups the
        # per-group slices are tiny (tens of rows) and TDigest.add_batch's
        # fixed cost (contiguity/NaN/min-max/append) dominates — so
        # slices are parked here (views, zero copy) and fed to the
        # digest in one concatenated call per ~buffer_size rows
        self._chunks: dict[tuple, list] = {}
        self._wchunks: dict[tuple, list] = {}
        self._chunk_rows: dict[tuple, int] = {}

    def _digest(self, key: tuple) -> TDigest:
        d = self.acc.get(key)
        if d is None:
            d = TDigest(self.compression, buffer_size=self.buffer_size,
                        scale=self.scale)
            self.acc[key] = d
            self.counts[key] = 0
        return d

    def _push(self, key: tuple, values, weights) -> None:
        lst = self._chunks.get(key)
        if lst is None:
            lst = self._chunks[key] = []
            self._chunk_rows[key] = 0
            if self.has_weight:
                self._wchunks[key] = []
        lst.append(values)
        if weights is not None:
            self._wchunks[key].append(weights)
        n = self._chunk_rows[key] + values.size
        self._chunk_rows[key] = n
        if n >= self.buffer_size:
            self._flush_key(key)

    def _flush_key(self, key: tuple) -> None:
        lst = self._chunks.pop(key, None)
        if not lst:
            return
        v = lst[0] if len(lst) == 1 else np.concatenate(lst)
        if self.has_weight:
            wl = self._wchunks.pop(key)
            w = wl[0] if len(wl) == 1 else np.concatenate(wl)
        else:
            w = None
        self._chunk_rows.pop(key, None)
        d = self._digest(key)
        d.add_batch(v, w)
        self.counts[key] += v.size

    def update(self, batch) -> None:
        import pyarrow as pa
        import pyarrow.compute as pc

        n_keys = self.n_keys
        values = batch.column(n_keys).to_numpy(zero_copy_only=False)
        if self.has_weight:
            weights = batch.column(n_keys + 1).to_numpy(
                zero_copy_only=False)
        else:
            weights = None
        ok = ~np.isnan(values)  # aggregate ignores NULL/NaN inputs
        if weights is not None:
            ok &= ~np.isnan(weights) & (weights > 0)
        if self._needs_canon is None and n_keys:
            def _can_need(t):
                return (pa.types.is_floating(t) or pa.types.is_nested(t)
                        or pa.types.is_decimal(t))
            self._needs_canon = any(
                _can_need(batch.schema.field(i).type)
                for i in range(n_keys))

        if n_keys == 0:
            v = values[ok] if not ok.all() else values
            if v.size == 0:
                return
            d = self._digest(())
            d.add_batch(v, weights[ok] if weights is not None else None)
            self.counts[()] += v.size
            return

        # dictionary-encode each key column (C kernel), combine codes
        combined = None
        codes_list = []
        dicts = []
        for i in range(n_keys):
            col = batch.column(i)
            self.key_schema[i] = batch.schema.field(i)
            try:
                enc = pc.dictionary_encode(col)
                codes = pc.fill_null(enc.indices, -1).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                # decode the (small) dictionary once — key tuples then
                # come from O(1) list indexing, not per-group pyarrow
                # scalar .as_py() (which dominated profiles at high
                # per-batch group cardinality)
                dict_vals = enc.dictionary.to_pylist()
            except pa.lib.ArrowNotImplementedError:
                # nested (array/map/struct) key columns have no Arrow
                # dictionary kernel — encode in Python.  Cold path:
                # it only runs for nested-typed GROUP columns, whose
                # per-batch cardinality is small by grouping contract.
                vals = col.to_pylist()
                code_of: dict = {}
                codes = np.empty(len(vals), dtype=np.int64)
                dict_vals = []
                for j, v in enumerate(vals):
                    if v is None:
                        codes[j] = -1
                        continue
                    ck = _canon_key_val(v)
                    c = code_of.get(ck)
                    if c is None:
                        c = code_of[ck] = len(dict_vals)
                        dict_vals.append(v)
                    codes[j] = c
            card = len(dict_vals) + 1
            combined = codes + 1 if combined is None \
                else combined * card + (codes + 1)
            codes_list.append(codes)
            dicts.append(dict_vals)
        if not ok.all():
            combined = np.where(ok, combined, -1)

        order = np.argsort(combined, kind="stable")
        sorted_codes = combined[order]
        # group boundaries over the sorted codes
        bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [sorted_codes.size]))
        sorted_values = values[order]
        sorted_weights = weights[order] if weights is not None else None
        needs_canon = self._needs_canon
        for s, e in zip(starts, ends):
            if sorted_codes[s] < 0:  # filtered-out rows bucket
                continue
            row0 = order[s]
            raw = tuple(
                dicts[i][codes_list[i][row0]]
                if codes_list[i][row0] >= 0 else None
                for i in range(n_keys))
            if needs_canon:
                key = _canon_key(raw)
                self._orig.setdefault(key, _norm_orig(raw))
            else:
                key = raw
            # .copy() so the parked chunk doesn't pin this batch's full
            # sorted array until flush time
            self._push(key, sorted_values[s:e].copy(),
                       sorted_weights[s:e].copy()
                       if sorted_weights is not None else None)

    def finish(self):
        import pyarrow as pa

        # small unit-weight keys take the bit-identical singleton
        # serialization fast path (core.try_singleton_blob): in
        # high-cardinality groupings (the flagship (role, ts_hour)
        # shape: thousands of keys x ~tens of rows each per partition)
        # the per-key digest construction + merge pass was the dominant
        # finalize cost (~55 us/key vs ~3 us packed) while provably
        # producing the same bytes.  Keys with a live digest (already
        # flushed once) or explicit weights use the full path.
        fast: dict[tuple, bytes] = {}
        for key in list(self._chunks):
            blob = None
            if not self.has_weight and key not in self.acc:
                lst = self._chunks[key]
                v = lst[0] if len(lst) == 1 else np.concatenate(lst)
                blob = try_singleton_blob(v, self.compression,
                                          self.buffer_size, self.scale)
            if blob is None:
                self._flush_key(key)
                continue
            fast[key] = blob
            self.counts[key] = self._chunk_rows.pop(key)
            del self._chunks[key]
        if not self.acc and not fast:
            return None
        keys = list(self.acc.keys()) + list(fast.keys())
        arrays = []
        names = []
        for i, c in enumerate(self.group_cols):
            typ = self.key_schema[i].type \
                if self.key_schema[i] is not None else None
            arrays.append(pa.array(
                [self._orig.get(k, k)[i] for k in keys], type=typ))
            names.append(c)
        arrays.append(pa.array(
            [fast[k] if k in fast
             else self.acc[k].to_bytes(compress=False) for k in keys],
            type=pa.binary()))
        names.append(DIGEST_FIELD)
        arrays.append(pa.array([self.counts[k] for k in keys],
                               type=pa.int64()))
        names.append("rows")
        return pa.RecordBatch.from_arrays(arrays, names=names)


def _partition_merge_gen(compression: float, scale: str,
                         group_cols: Sequence[str]):
    """Whole-partition stage-2 merge kernel: accumulate (key -> blobs)
    across the partition's Arrow batches, merge each key once at the
    end, emit one RecordBatch.  One Python round-trip per REDUCER
    PARTITION instead of one applyInPandas call per GROUP — profiled on
    the scaling job the per-group path cost ~10 ms/group (pandas
    construction + Arrow conversion per group), dominating the whole
    reduce stage at P=256 partials x K~3k keys."""
    group_cols = list(group_cols)
    n_keys = len(group_cols)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        batches = [b for b in batches if b.num_rows]
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)  # digest rows — tiny vs raw
        key_fields = [tbl.schema.field(i) for i in range(n_keys)]
        needs_canon = any(
            pa.types.is_floating(f.type) or pa.types.is_nested(f.type)
            or pa.types.is_decimal(f.type) for f in key_fields)
        n = tbl.num_rows
        bcol = tbl.column(n_keys).to_pylist()
        rcol = tbl.column(n_keys + 1).to_numpy(zero_copy_only=False)
        blobs: dict[tuple, list] = {}
        rows: dict[tuple, int] = {}
        origs: dict[tuple, tuple] = {}
        if needs_canon:
            # float / nested / decimal keys: per-row canonicalization
            # (NaN folding, -0.0, unhashable lists) — the cold path
            cols = [tbl.column(i).to_pylist() for i in range(n_keys)]
            for j in range(n):
                raw = tuple(c[j] for c in cols)
                key = _canon_key(raw)
                lst = blobs.get(key)
                if lst is None:
                    lst = blobs[key] = []
                    rows[key] = 0
                    origs[key] = _norm_orig(raw)
                lst.append(bcol[j])
                rows[key] += rcol[j]
        else:
            # vectorized grouping, same dictionary-encode + combined-
            # code scheme as stage 1 (DigestAccumulator.update): Python
            # touches each GROUP once, never each row
            combined = None
            codes_list = []
            dicts = []
            for i in range(n_keys):
                enc = pc.dictionary_encode(tbl.column(i).combine_chunks())
                codes = pc.fill_null(enc.indices, -1).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                dict_vals = enc.dictionary.to_pylist()
                card = len(dict_vals) + 1
                combined = codes + 1 if combined is None \
                    else combined * card + (codes + 1)
                codes_list.append(codes)
                dicts.append(dict_vals)
            order = np.argsort(combined, kind="stable")
            sorted_codes = combined[order]
            bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [n]))
            for s, e in zip(starts, ends):
                row0 = order[s]
                key = tuple(
                    dicts[i][codes_list[i][row0]]
                    if codes_list[i][row0] >= 0 else None
                    for i in range(n_keys))
                idx = order[s:e]
                blobs[key] = [bcol[j] for j in idx]
                rows[key] = int(rcol[idx].sum())
        keys = list(blobs)
        arrays = [
            pa.array([origs.get(k, k)[i] for k in keys],
                     type=key_fields[i].type)
            for i in range(n_keys)
        ]
        arrays.append(pa.array(
            [merge_blobs(blobs[k], compression=compression,
                         scale=scale).to_bytes() for k in keys],
            type=pa.binary()))
        arrays.append(pa.array([rows[k] for k in keys], type=pa.int64()))
        yield pa.RecordBatch.from_arrays(
            arrays, names=group_cols + [DIGEST_FIELD, "rows"])

    return gen


def merge_digests_df(
    partials: DataFrame,
    group_cols: Sequence[str] = (),
    compression: float = 100.0,
    scale: str = "K_2",
    pin_partitions: bool = False,
) -> DataFrame:
    """Stage 2: shuffle the (tiny) digest rows by key and merge per group.

    Grouped path: ``repartition(keys)`` co-locates every key's partials,
    then a whole-partition ``mapInArrow`` kernel merges all keys of the
    partition in ONE Python round-trip (see _partition_merge_gen).  The
    repartition is BY COLUMN with no pinned count by default, so AQE
    sizes the reduce stage by actual partial bytes (guide §2.2): a
    15-row digest table collapses to ONE task instead of
    spark.sql.shuffle.partitions near-empty Python round-trips
    (measured 0.65 s/query saved on the sf0.1 headline bench, where the
    pinned 64-task stage dominated the merge).  Every downstream
    consumer of the merge output (quantile-extract UDFs, collect)
    inherits the right-sized partitioning too.

    ``pin_partitions=True`` pins the exchange at
    spark.sql.shuffle.partitions instead — for callers that KNOW the
    partial table is large (high key cardinality x many partitions):
    AQE's byte-sized coalescing targets ~defaultParallelism tasks
    there, and the resulting single ragged wave quantizes badly on the
    core count (flagship 100M-row job, per-stage event-log profile:
    the 11-task coalesced merge stage scaled 0.46 from 2 to 8 cores
    with occupancy 0.73 and task CPU inflated 22 -> 37 core-s, while
    the pinned 64-task shape — 8 balanced waves — restores tail-hiding;
    the scan+kernel stage scales 0.95 in the same windows)."""
    group_cols = list(group_cols)
    schema = StructType(
        [partials.schema[c] for c in group_cols]
        + [StructField(DIGEST_FIELD, BinaryType(), False),
           StructField("rows", LongType(), False)]
    )
    if group_cols:
        sel = partials.select(*group_cols, DIGEST_FIELD, "rows")
        if pin_partitions:
            rep = sel.repartition(_shuffle_partitions(partials),
                                  *group_cols)
        else:
            rep = sel.repartition(*group_cols)
        return rep.mapInArrow(
            _partition_merge_gen(compression, scale, group_cols),
            schema=schema)
    # global aggregate: single group — funnel the per-partition digest rows
    # (already tiny) into one task and merge.  repartition, NOT coalesce:
    # coalesce(1) would collapse the whole upstream partial-build stage
    # into a single task; repartition keeps a shuffle barrier so partials
    # stay parallel and only ~1 KB digest rows funnel through it.
    return partials.repartition(1).mapInPandas(
        _global_merge_gen(compression, scale), schema=schema)


def _global_merge_gen(compression: float, scale: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        blobs: list[bytes] = []
        rows = 0
        for pdf in batches:
            blobs.extend(pdf[DIGEST_FIELD])
            rows += int(pdf["rows"].sum())
        merged = merge_blobs(blobs, compression=compression, scale=scale)
        yield pd.DataFrame({DIGEST_FIELD: [merged.to_bytes()],
                            "rows": [rows]})
    return gen


def tree_merge(
    partials: DataFrame,
    group_cols: Sequence[str] = (),
    compression: float = 100.0,
    scale: str = "K_2",
    fanout: int = 64,
) -> DataFrame:
    """treeAggregate-style two-level reduce over digest rows.

    Caps any single reduce task's fan-in at ~``fanout`` digests per key by
    pre-merging within salted buckets.  Use when #input-partitions per key
    is very large (10^4+).  Accuracy is unchanged — digest merging meets
    the same bounds for any split (AccuracyTest.java:131-151); stratified
    two-level merging is in fact *more* accurate (docs/vldb/short.tex:185-198).
    """
    group_cols = list(group_cols)
    salted = partials.withColumn(
        "__salt", F.pmod(F.crc32(F.col(DIGEST_FIELD)), F.lit(fanout))
    )
    schema = StructType(
        [partials.schema[c] for c in group_cols]
        + [StructField("__salt", salted.schema["__salt"].dataType, True),
           StructField(DIGEST_FIELD, BinaryType(), False),
           StructField("rows", LongType(), False)]
    )
    # intermediate level keeps 2x centroids (stratified merging: sub-digests
    # at delta' > delta are *more* accurate, docs/vldb/short.tex:185-198);
    # only the final level compresses to the public delta.  Same whole-
    # partition merge kernel as merge_digests_df: the salted level has
    # keys x fanout groups, where per-group applyInPandas overhead would
    # hurt the most.
    salt_keys = group_cols + ["__salt"]
    level1 = (salted.select(*salt_keys, DIGEST_FIELD, "rows")
              .repartition(*salt_keys)
              .mapInArrow(
                  _partition_merge_gen(2 * compression, scale, salt_keys),
                  schema=schema))
    return merge_digests_df(level1.drop("__salt"), group_cols,
                            compression, scale)


def tdigest_aggregate(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    compression: float = 100.0,
    scale: str = "K_2",
    buffer_size: int = DEFAULT_BUFFER,
    weight_col: str | None = None,
    tree: bool | str = "auto",
    fanout: int = 64,
) -> DataFrame:
    """Full two-stage digest aggregation: one digest row per group.

    Equivalent to ``groupBy(keys).agg(tdigest(value))`` but with explicit
    map-side partials so only sketches shuffle.

    ``tree``: ``True``/``False`` force the reduce shape; the default
    ``"auto"`` switches to the two-level ``tree_merge`` when the input
    has more than ~10^4 partitions — beyond that, a single reduce
    task's fan-in (one partial digest per key per partition) dominates
    the merge and the salted pre-reduce wins.  Accuracy is identical
    for any split (AccuracyTest.java:131-151; tests/test_mega_merge.py).
    """
    partials = partial_digests(df, value_col, group_cols, compression,
                               scale, buffer_size, weight_col)
    if tree == "auto":
        # Estimate stage-1 task count WITHOUT df.rdd (which forces a
        # full RDD conversion of the plan — measurable on wide plans and
        # illegal on streaming DataFrames).  inputFiles() is a metadata
        # listing; for non-file plans fall back to the cluster's default
        # parallelism, which bounds the partial-digest partition count
        # for any shuffle-free stage 1.  File count is a HEURISTIC for
        # task count, not equal to it: maxPartitionBytes splits large
        # files (undercount) and small files coalesce into shared
        # partitions (overcount) — acceptable here because the 10^4
        # threshold only picks the reduce shape, and both shapes are
        # correct for any split; force tree=True/False to override.
        try:
            n_parts = len(df.inputFiles())
        except Exception:
            n_parts = 0
        if n_parts == 0:
            n_parts = df.sparkSession.sparkContext.defaultParallelism
        tree = n_parts > 10_000
    if tree:
        return tree_merge(partials, group_cols, compression, scale, fanout)
    return merge_digests_df(partials, group_cols, compression, scale)


def tdigest_collect(
    df: DataFrame,
    value_col: str,
    compression: float = 100.0,
    scale: str = "K_2",
    buffer_size: int = DEFAULT_BUFFER,
) -> TDigest:
    """Global (ungrouped) digest, returned as a driver-side TDigest.

    Partition digests (~1 KB each) are the only data collected.
    """
    partials = partial_digests(df, value_col, (), compression, scale,
                               buffer_size)
    blobs = [r[DIGEST_FIELD] for r in partials.select(DIGEST_FIELD).collect()]
    return merge_digests([TDigest.from_bytes(b, scale=scale) for b in blobs],
                         compression=compression)
