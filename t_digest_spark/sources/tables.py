"""Table sources.

- ``load_table(s)``: driver testdata parquet (TESTDATA.md) or, when an
  Iceberg catalog is configured, ``spark.read.table`` — same DataFrame
  code path either way (SURVEY.md §7.4 "Iceberg at sandbox scale").
- ``synth_transcripts``: deterministic synthetic generator for the
  BASELINE.json ``input_hint`` table shape
  (conv_id, turn_idx, role, text, tool, ts) with Zipf-skewed
  conversation lengths (hot conv_id keys), lognormal text lengths and
  gamma inter-turn latencies per FIXTURES.md §1.  Generated
  *distributed* — one seeded chunk per Spark partition — so it scales to
  any row count without driver memory.
- ``turn_metrics``: derives the two digested metrics — text_len and
  inter-turn latency via a window lag over (conv_id, turn_idx).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

__all__ = ["TABLES", "load_table", "load_all", "synth_transcripts",
           "turn_metrics", "TRANSCRIPT_SCHEMA"]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; catalog table if ``sf_dir`` is a
    ``catalog:`` prefix (Iceberg), parquet path otherwise."""
    if sf_dir.startswith("catalog:"):
        return spark.read.table(f"{sf_dir[len('catalog:'):]}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


TRANSCRIPT_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), False),
    StructField("text", StringType(), False),
    StructField("tool", StringType(), True),
    StructField("ts", TimestampType(), False),
])

_ROLES = np.array(["user", "assistant", "system", "tool"])
_ROLE_P = np.array([0.45, 0.45, 0.02, 0.08])
_TOOLS = np.array([f"tool_{i:02d}" for i in range(12)])
_EPOCH = np.datetime64("2026-01-01T00:00:00")
_WORDS = np.array([
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "query", "result", "token", "spark",
])


def _gen_chunk(chunk_id: int, convs_per_chunk: int, seed: int,
               with_text: bool) -> pd.DataFrame:
    """Deterministic transcript chunk: conversation ids are globally
    unique per chunk; every statistic depends only on (seed, chunk_id)."""
    rng = np.random.default_rng((seed, chunk_id))
    # conversation length ~ Zipf(1.5) capped at 512 (hot-key skew)
    lengths = np.minimum(rng.zipf(1.5, size=convs_per_chunk), 512)
    total = int(lengths.sum())
    conv_base = chunk_id * convs_per_chunk
    conv_ids = np.repeat(
        np.arange(conv_base, conv_base + convs_per_chunk), lengths)
    turn_idx = np.concatenate([np.arange(n) for n in lengths]) \
        if convs_per_chunk else np.empty(0, dtype=np.int64)
    roles = _ROLES[rng.choice(len(_ROLES), size=total, p=_ROLE_P)]
    is_tool = roles == "tool"
    # Zipf-distributed tool popularity
    tool_rank = np.minimum(rng.zipf(1.8, size=total), len(_TOOLS)) - 1
    tools = np.where(is_tool, _TOOLS[tool_rank], None)
    # text length ~ lognormal(5, 1) clipped to [1, 32768]
    text_len = np.clip(
        rng.lognormal(5.0, 1.0, size=total), 1, 32768).astype(np.int64)
    if with_text:
        # deterministic pseudo-text of exactly text_len chars
        base = " ".join(_WORDS[rng.integers(0, len(_WORDS), size=64)])
        blob = (base * (32768 // len(base) + 2))
        texts = [blob[:n] for n in text_len]
    else:
        texts = [""] * total
    # conversation start uniform over 30 days; inter-turn latency
    # ~ gamma(0.5, 2.0) seconds (heavily skewed)
    start = rng.uniform(0, 30 * 86400, size=convs_per_chunk)
    lat = rng.gamma(0.5, 2.0, size=total)
    # cumulative latency within each conversation
    cum = np.cumsum(lat)
    off = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    conv_cum_base = np.repeat(cum[np.maximum(off - 1, 0)], lengths)
    conv_cum_base[: lengths[0] if convs_per_chunk else 0] = 0
    rel = cum - conv_cum_base
    ts_sec = np.repeat(start, lengths) + rel
    ts = _EPOCH + (ts_sec * 1e6).astype("timedelta64[us]")
    return pd.DataFrame({
        "conv_id": np.char.add("conv-", np.char.zfill(
            conv_ids.astype(str), 10)),
        "turn_idx": turn_idx.astype(np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    })


def synth_transcripts(spark: SparkSession, n_convs: int = 10_000,
                      seed: int = 42, partitions: int = 32,
                      with_text: bool = True) -> DataFrame:
    """Deterministic distributed transcripts table (input_hint shape).

    ~3x n_convs turns (Zipf(1.5) mean length ~3).  Same (seed, n_convs,
    partitions) → identical table, any cluster size.
    """
    convs_per_chunk = max(1, n_convs // partitions)
    chunks = spark.range(0, partitions, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for cid in pdf["id"]:
                yield _gen_chunk(int(cid), convs_per_chunk, seed, with_text)

    return chunks.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def turn_metrics(transcripts: DataFrame) -> DataFrame:
    """Derived per-turn metrics (never rewrites the payload — the text
    column passes through untouched, preserving the per-turn text
    equality invariant):

    - text_len: length(text)
    - latency_s: ts - lag(ts) over (partition by conv_id order by turn_idx)
    - ts_hour:  date_trunc('hour', ts)  (grouping bucket)
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # NTZ timestamps can't cast straight to double; go through timestamp
    ts_s = F.col("ts").cast("timestamp").cast("double")
    return (
        transcripts
        .withColumn("text_len", F.length("text").cast("double"))
        .withColumn("latency_s", ts_s - F.lag(ts_s).over(w))
        .withColumn("ts_hour", F.date_trunc("hour", "ts"))
    )
