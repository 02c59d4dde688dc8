"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle SQL on DuckDB, compare
row count, schema, and order-insensitive values.

Faithful to the driver's canonicalizer (learned from round-1
CORRECTNESS errors): results go through pandas ``sort_values`` over
all columns — which CRASHES on array columns (so this script must,
too) — and values are hashed dtype-sensitively (so ``3549.0`` vs
``3549`` is a mismatch; we compare ``str()`` of every cell).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
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


def _canon(pdf):
    """Driver-equivalent canonicalization: columns sorted by name,
    rows sorted by every column (raises TypeError on list columns,
    exactly like the driver's pandas sort_values)."""
    cols = sorted(pdf.columns)
    out = pdf[cols].sort_values(by=cols).reset_index(drop=True)
    return out


def _cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return f"{type(v).__name__}:{v!s}"


def _values(pdf) -> list[tuple]:
    return [tuple(_cell(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))
    # a gating tool must fail loudly on a filter that matches nothing:
    # a typo (or --help) would otherwise run zero queries and print
    # ALL OK with exit 0
    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(entrymod.queries())}")
        sys.exit(2)
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
    n_ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_ran += 1
        try:
            sdf = fn(spark, sf_dir)
            spdf = _canon(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark/canon error "
                  f"{type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spdf)} rows, "
                  f"{len(spdf.columns)} cols {list(spdf.columns)}")
            continue
        try:
            opdf = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        status = []
        if len(spdf) != len(opdf):
            status.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        if [c.lower() for c in spdf.columns] != \
                [c.lower() for c in opdf.columns]:
            status.append(
                f"schema {list(spdf.columns)} vs {list(opdf.columns)}")
        if not status:
            sv, ov = _values(spdf), _values(opdf)
            if sv != ov:
                diff = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
                status.append(f"values differ, first diffs: {diff}")
        if status:
            print(f"[FAIL] {name}: {'; '.join(status)}")
            failed.append(name)
        else:
            print(f"[OK]   {name}: {len(spdf)} rows match oracle")
    if not only:
        # smoke entry()
        try:
            edf = entrymod.entry(spark)
            erows = edf.collect()
            print(f"[entry] {len(erows)} rows, "
                  f"schema: {edf.schema.simpleString()}")
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] entry: {type(e).__name__}: {e}")
            failed.append("entry")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    if n_ran == 0:
        print("no queries ran")
        sys.exit(2)
    print("ALL OK")


if __name__ == "__main__":
    main()
