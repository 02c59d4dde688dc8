"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle SQL on DuckDB at sf0.01,
compare row count, schema width, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from t_digest_spark.sources.tables import TABLES  # noqa: E402


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_set(rows):
    def key(row):
        return tuple((v is None, str(v)) for v in row)

    return sorted((tuple(_norm(v) for v in row) for row in rows), key=key)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, "
                  f"{len(sdf.columns)} cols {sdf.columns}")
            continue
        orows = con.execute(oracles[name]).fetchall()
        ocols = [d[0] for d in con.description]
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in sdf.columns) != \
                sorted(c.lower() for c in ocols):
            status.append(f"schema {sdf.columns} vs {ocols}")
        # order columns by name on both sides (driver behavior)
        sidx = [sdf.columns.index(c) for c in sorted(sdf.columns)]
        oidx = [ocols.index(c) for c in sorted(ocols, key=str.lower)]
        sset = _rows_to_set([[r[i] for i in sidx] for r in srows])
        oset = _rows_to_set([[r[i] for i in oidx] for r in orows])
        if sset != oset:
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            status.append(f"values differ, first diffs: {diff}")
        if status:
            print(f"[FAIL] {name}: {'; '.join(status)}")
            failed.append(name)
        else:
            print(f"[OK]   {name}: {len(srows)} rows match oracle")
    # smoke entry()
    try:
        edf = entrymod.entry(spark)
        erows = edf.collect()
        print(f"[entry] {len(erows)} rows, schema: {edf.schema.simpleString()}")
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] entry: {type(e).__name__}: {e}")
        failed.append("entry")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
