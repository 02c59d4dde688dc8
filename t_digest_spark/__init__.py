"""t_digest_spark — a PySpark-native mergeable quantile-sketch library.

Core: a vectorized NumPy MergingDigest (t-digest) exposed as mergeable
aggregates over Spark DataFrames via Arrow-batched pandas UDFs.
"""

from .core import TDigest, merge_digests
from .scale import K_0, K_1, K_1_FAST, K_2, K_3, get_scale

__all__ = [
    "TDigest", "merge_digests",
    "K_0", "K_1", "K_1_FAST", "K_2", "K_3", "get_scale",
]
__version__ = "0.1.0"
