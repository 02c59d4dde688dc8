"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio libraries, so the decode kernels are
STUBS — clearly marked, swappable (see ``set_decoder``): by default a
deterministic fake decoder derived from the payload bytes, or
``NotImplementedError`` in strict mode.  Everything Spark-side is real
and tested: schemas, batch iteration shape, partition behavior, the
mapInPandas/mapInArrow UDF signatures, and the metadata handling a
1000-executor pipeline needs (payload sizes stay off the shuffle paths;
only derived features move).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

__all__ = [
    "MEDIA_SCHEMA", "FEATURE_SCHEMA", "synth_media", "decode_features",
    "frame_sample", "set_decoder", "media_from_documents",
    "indexed_fake_decoder", "resize_images",
]

#: canonical multimodal table shape: id, modality, payload, metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), False),     # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),       # image/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),  # audio/video
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])


def _fake_decode(payload: bytes, modality: str, dim: int) -> np.ndarray:
    """Deterministic fake feature: seeded from a digest of the payload.
    Stands in for a real decode→model-embed kernel (which would need
    pillow/ffmpeg/torch — not in this container)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.normal(size=dim).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-12)


_DECODER: Callable[[bytes, str, int], np.ndarray] | None = _fake_decode


def set_decoder(fn: Callable[[bytes, str, int], np.ndarray] | None) -> None:
    """Install a real decode kernel, or None for strict mode (raises
    NotImplementedError so missing codecs fail loudly, not silently)."""
    global _DECODER
    _DECODER = fn


def synth_media(spark, n: int = 1000, seed: int = 42,
                partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table in MEDIA_SCHEMA shape
    (payload = seeded pseudo-random bytes; sizes vary by modality)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for cid in pdf["id"]:
                rng = np.random.default_rng((seed, int(cid)))
                per = max(1, n // partitions)
                rows = []
                for i in range(per):
                    mid = int(cid) * per + i
                    modality = ["image", "audio", "video"][mid % 3]
                    size = {"image": 4096, "audio": 16384,
                            "video": 65536}[modality]
                    payload = rng.integers(
                        0, 256, size=size, dtype=np.uint8).tobytes()
                    rows.append((
                        mid, modality, payload,
                        {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[modality],
                        256 if modality != "audio" else None,
                        256 if modality != "audio" else None,
                        None if modality == "image" else 1000 + mid % 9000,
                    ))
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  MEDIA_SCHEMA.fields])

    return spark.range(0, partitions, 1, partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def indexed_fake_decoder(payload: bytes, modality: str,
                         dim: int) -> np.ndarray:
    """SQL-reproducible deterministic fake decode kernel.

    Features derive from three payload probes (length, first byte, last
    byte) through pure integer arithmetic, so an external SQL engine
    can recompute any feature slot exactly — which is what makes the
    driver's multimodal pipeline query oracle-checkable end-to-end
    (payload bytes really flow through Arrow into this kernel; the
    default ``_fake_decode`` hashes the full payload and is therefore
    not SQL-expressible)::

        seed  = (len*131 + first*31 + last) % 100003
        code  = (seed * 2654435761 + i * 40503) % 1000    # slot i
        f[i]  = code / 1000.0
    """
    nb = len(payload)
    first = payload[0] if nb else 0
    last = payload[-1] if nb else 0
    seed = (nb * 131 + first * 31 + last) % 100003
    i = np.arange(dim, dtype=np.int64)
    code = (seed * 2654435761 + i * 40503) % 1000
    return (code / 1000.0).astype(np.float32)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic MEDIA_SCHEMA table derived from a documents table
    (payload = UTF-8 bytes of the text; modality/duration from the id).

    Pure Catalyst expressions, so a SQL oracle can rebuild the exact
    same table — the driver's multimodal queries run over this instead
    of ``synth_media`` for that reason.
    """
    mod3 = F.col(id_col) % 3
    is_img = mod3 == 0
    is_aud = mod3 == 1
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(is_img, "image").when(is_aud, "audio")
        .otherwise("video").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(is_img, "image/png").when(is_aud, "audio/wav")
        .otherwise("video/mp4").alias("mime"),
        F.when(~is_aud, F.lit(256)).cast("int").alias("width"),
        F.when(~is_aud, F.lit(256)).cast("int").alias("height"),
        F.when(~is_img, F.lit(1000) + (F.col(id_col) * 37) % 9000)
        .cast("int").alias("duration_ms"),
    )


def decode_features(media: DataFrame, dim: int = 64,
                    decoder: Callable[[bytes, str, int], np.ndarray]
                    | None = None) -> DataFrame:
    """payload → feature vector via mapInPandas.

    Real plumbing: Arrow-batched binary columns, per-batch NumPy, output
    drops the payload so downstream stages never shuffle raw media.
    The decode kernel itself is the stub (see module docstring).
    ``decoder`` overrides the module default for this call; it is
    captured by value in the closure, so it reaches executors even when
    they import the module fresh.
    """
    cols = ["media_id", "modality", "payload"]
    explicit = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = explicit if explicit is not None else _DECODER
        for pdf in batches:
            if kernel is None:
                raise NotImplementedError(
                    "no media decoder installed in this environment; "
                    "install one with set_decoder()")
            feats = [
                kernel(bytes(p), m, dim).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
            })

    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resize kernel (no pillow in
    this container): returns a payload whose length scales with the
    target pixel count, derived from the source bytes.  Swap via the
    ``resizer`` parameter of ``resize_images`` for a real codec."""
    target = max(16, (w * h) // 128)
    reps = target // max(len(payload), 1) + 1
    return (payload * reps)[:target]


def resize_images(media: DataFrame, width: int, height: int,
                  resizer: Callable[[bytes, int, int], bytes]
                  | None = None) -> DataFrame:
    """Image resize over the media table: payload → resized payload via
    mapInPandas (Arrow-batched binary in/out), width/height metadata
    updated JVM-side semantics preserved in the output schema.  Only
    image-modality rows are transformed; others pass through untouched
    (payload equality — the multimodal analogue of the per-turn text
    equality invariant).  The kernel is the stub (module docstring);
    ``resizer`` is captured by value so an installed codec reaches
    executors."""
    kernel = resizer if resizer is not None else _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["modality"] == "image"
            out = pdf.copy()
            out.loc[is_img, "payload"] = [
                kernel(bytes(p), width, height)
                for p in pdf.loc[is_img, "payload"]
            ]
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            yield out

    return media.mapInPandas(run, schema=media.schema)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 max_frames: int = 32) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp.

    The timestamp arithmetic is JVM-side (sequence + explode); actual
    frame extraction would happen in a decode UDF downstream (stubbed
    here, like decode_features)."""
    vids = media.where(F.col("modality") == "video")
    ts = F.sequence(
        F.lit(0),
        F.least(F.col("duration_ms") - 1,
                F.lit(every_ms * (max_frames - 1))),
        F.lit(every_ms))
    return (vids.withColumn("frame_ts_ms", F.explode(ts))
            .select("media_id", "frame_ts_ms", "width", "height"))
