"""Rollup / cube over mergeable digest tables.

With an ordinary aggregate, ROLLUP/CUBE rescan the input once per
grouping set.  Mergeable sketches do better: aggregate once at the
finest grain, then derive every coarser grouping set by *merging the
finer digests* — zero input rescans, each level costs only
(#finer-groups x ~1 KB) of sketch traffic.  Accuracy is the standard
merge bound (AccuracyTest.java:131-151), identical to having
aggregated that level directly.

Output mirrors SQL ROLLUP semantics: coarser levels carry NULL in the
rolled-up key columns, plus a ``grouping_level`` ordinal (0 = finest).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .aggregate import DIGEST_FIELD, merge_digests_df, tdigest_aggregate

__all__ = ["tdigest_rollup", "tdigest_cube"]


def _with_level(df: DataFrame, group_cols: Sequence[str],
                present: Sequence[str], level: int) -> DataFrame:
    cols = []
    for c in group_cols:
        if c in present:
            cols.append(F.col(c))
        else:
            cols.append(F.lit(None).cast(df.schema[c].dataType
                                         if c in df.columns else "string")
                        .alias(c))
    return df.select(*cols, DIGEST_FIELD, "rows",
                     F.lit(level).alias("grouping_level"))


def tdigest_rollup(df: DataFrame, value_col: str,
                   group_cols: Sequence[str],
                   compression: float = 100.0,
                   scale: str = "K_2") -> DataFrame:
    """All ROLLUP grouping sets of ``group_cols`` in one pass + merges.

    Level 0 = full key, level k = first len-k keys dropped from the
    right, last level = grand total.  Same rows as
    ``GROUP BY ROLLUP(...)``.
    """
    group_cols = list(group_cols)
    finest = tdigest_aggregate(df, value_col, group_cols, compression,
                               scale)
    finest = finest.cache()
    out = _with_level(finest, group_cols, group_cols, 0)
    prev = finest
    for level in range(1, len(group_cols) + 1):
        keys = group_cols[: len(group_cols) - level]
        merged = merge_digests_df(
            prev.select(*(keys + [DIGEST_FIELD, "rows"])),
            keys, compression, scale)
        out = out.unionByName(
            _with_level(merged, group_cols, keys, level))
        prev = merged
    return out


def tdigest_cube(df: DataFrame, value_col: str,
                 group_cols: Sequence[str],
                 compression: float = 100.0,
                 scale: str = "K_2") -> DataFrame:
    """All CUBE grouping sets, each derived from the finest level by
    merging (2^k sets, one merge stage each; no input rescans)."""
    group_cols = list(group_cols)
    finest = tdigest_aggregate(df, value_col, group_cols, compression,
                               scale).cache()
    out = None
    n = len(group_cols)
    for mask in range(1 << n):
        keys = [group_cols[i] for i in range(n) if mask & (1 << i)]
        if len(keys) == n:
            part = _with_level(finest, group_cols, keys, 0)
        else:
            merged = merge_digests_df(
                finest.select(*(keys + [DIGEST_FIELD, "rows"])),
                keys, compression, scale)
            part = _with_level(merged, group_cols, keys, n - len(keys))
        out = part if out is None else out.unionByName(part)
    return out
