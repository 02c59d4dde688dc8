"""The 10^12-turn flagship job, scale path — run via spark-submit:

    cd /path/to/repo
    zip -r /tmp/t_digest_spark.zip t_digest_spark
    spark-submit --py-files /tmp/t_digest_spark.zip \\
        examples/latency_job_clustered.py \\
        --input  <parquet path or catalog:db.table> \\
        --output <parquet path> \\
        [--group-cols role,ts_hour] [--compression 100] \\
        [--quantiles 0.5,0.99,0.999]

For transcripts tables stored clustered by conv_id and sorted by
(conv_id, turn_idx) within files — the natural Iceberg sort order —
this runs the FUSED kernel (sources/tables.latency_digests_clustered):
inter-turn latency derivation and per-partition partial digests in one
mapInArrow pass, zero raw-row shuffle, a single Exchange of ~1 KB
digest rows.  If the input is NOT conv-clustered the kernel fails
loudly (mid-conversation partition guard) and this job falls back to
the window-lag path automatically — same results (tested bit-equal in
tests/test_spark_agg.py), one extra raw-row shuffle.

Cluster sizing at 10^12 turns: raw rows never shuffle, so the job is
scan-shaped — size executors to the scan and keep
spark.sql.files.maxPartitionBytes at or above the table's file size so
no file is ever split mid-conversation (whole-file packing is safe).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F

from t_digest_spark.operators.aggregate import tdigest_aggregate
from t_digest_spark.operators.extract import quantiles_of
from t_digest_spark.session import recommended_confs
from t_digest_spark.sources.tables import (
    latency_digests_clustered, load_table, turn_metrics,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--group-cols", default="role,ts_hour")
    ap.add_argument("--compression", type=float, default=100.0)
    ap.add_argument("--quantiles", default="0.5,0.99,0.999")
    args = ap.parse_args()

    builder = SparkSession.builder.appName("tdigest-latency-clustered")
    for k, v in recommended_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    group_cols = args.group_cols.split(",")
    qs = [float(q) for q in args.quantiles.split(",")]
    if args.input.startswith("catalog:"):
        t = load_table(spark, *args.input.rsplit(".", 1))
    else:
        t = spark.read.parquet(args.input)

    try:
        agg = latency_digests_clustered(
            t, group_cols, compression=args.compression)
        out = agg.select(*group_cols, "rows",
                         quantiles_of("digest", qs).alias("quantiles"))
        out.write.mode("overwrite").parquet(args.output)
        print("fused clustered path: raw rows never shuffled")
    except Exception as e:  # mis-clustered input → window fallback
        if "mid-conversation" not in str(e) and "not sorted" not in str(e):
            raise
        print(f"clustered contract violated ({e}); window fallback")
        m = turn_metrics(t).where(F.col("latency_s").isNotNull())
        agg = tdigest_aggregate(m, "latency_s", group_cols,
                                compression=args.compression)
        agg.select(*group_cols, "rows",
                   quantiles_of("digest", qs).alias("quantiles")) \
            .write.mode("overwrite").parquet(args.output)

    spark.stop()


if __name__ == "__main__":
    main()
