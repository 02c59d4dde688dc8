"""Preloading PySpark worker daemon.

Each Spark task forks a fresh Python worker from the daemon process.
The stock daemon (pyspark/daemon.py) imports almost nothing, so every
forked worker re-imports numpy/pandas/pyarrow at task start (~0.7 s wall
each in this sandbox — syscall-heavy imports are expensive in microVMs,
and at 100-1000 tasks/stage this serializes the whole Python exchange).

This drop-in daemon imports the heavy modules *before* forking, so
workers inherit them copy-on-write for free.

Enable with:
    spark.python.daemon.module = t_digest_spark.daemon

(The library itself is imported too, so the cloudpickled closures in
operators/ deserialize instantly.)
"""

import importlib

for _m in (
        "numpy",
        "pandas",
        "pyarrow",
        "pyarrow.pandas_compat",
        "pyspark.serializers",
        "pyspark.sql.pandas.serializers",
        "pyspark.sql.pandas.types",
        "pyspark.worker",
        "t_digest_spark.core",
):
    try:
        importlib.import_module(_m)
    except Exception:  # noqa: BLE001 — preloading is best-effort
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
