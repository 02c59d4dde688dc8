"""Production-shaped job entry point, run via spark-submit:

    cd /path/to/repo
    zip -r /tmp/t_digest_spark.zip t_digest_spark
    spark-submit --py-files /tmp/t_digest_spark.zip \\
        examples/quantile_job.py \\
        --input  <parquet path or catalog:db.table> \\
        --output <parquet path> \\
        --checkpoint <checkpoint dir> \\
        [--value-col latency_s] [--group-cols role,ts_hour] \\
        [--compression 100] [--tree]

Reads an Iceberg/parquet transcripts table, derives text_len +
inter-turn latency, builds grouped digests through the resumable
checkpoint pipeline (plans/pipeline.py), and writes one result row per
group with p50/p90/p99/p999, trimmed mean, and digest metadata.
Re-running after an interruption resumes from the file-granular
checkpoint; the input is never rescanned for completed files.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F

from t_digest_spark.operators.extract import (
    digest_stats, quantiles_of, trimmed_mean_of,
)
from t_digest_spark.plans.pipeline import DigestCheckpointPipeline
from t_digest_spark.session import recommended_confs
from t_digest_spark.sources.tables import turn_metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--value-col", default="latency_s")
    ap.add_argument("--group-cols", default="role,ts_hour")
    ap.add_argument("--compression", type=float, default=100.0)
    ap.add_argument("--tree", action="store_true",
                    help="salted tree merge for extreme partition counts")
    args = ap.parse_args()

    builder = SparkSession.builder.appName("tdigest-quantile-job")
    for k, v in recommended_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    group_cols = [c for c in args.group_cols.split(",") if c]

    # derive metrics view; if the metric is derived (latency/text_len),
    # materialize the narrow projection next to the checkpoint so the
    # pipeline's file-granular resume applies to it
    if args.value_col in ("latency_s", "text_len"):
        src = spark.read.table(args.input[len("catalog:"):]) \
            if args.input.startswith("catalog:") \
            else spark.read.parquet(args.input)
        metrics_path = f"{args.checkpoint.rstrip('/')}/metrics"
        try:
            spark.read.parquet(metrics_path).limit(1).collect()
        except Exception:  # noqa: BLE001 — first run
            (turn_metrics(src)
             .where(F.col(args.value_col).isNotNull())
             .select(*group_cols, args.value_col)
             .write.mode("overwrite").parquet(metrics_path))
        input_path = metrics_path
    else:
        input_path = args.input

    pipe = DigestCheckpointPipeline(
        spark, input_path, args.value_col, group_cols,
        f"{args.checkpoint.rstrip('/')}/digests",
        compression=args.compression)
    progress = pipe.run_partials()
    print(f"partials: {progress}")

    result = pipe.finalize(tree=args.tree).select(
        *group_cols,
        F.col("rows").alias("n_values"),
        quantiles_of("digest", [0.5, 0.9, 0.99, 0.999]).alias("quantiles"),
        trimmed_mean_of("digest", 0.05, 0.95).alias("trimmed_mean_5_95"),
        digest_stats("digest").alias("digest_meta"),
    )
    result.write.mode("overwrite").parquet(args.output)
    print(f"wrote {result.count()} groups to {args.output}")
    print("per-file metrics sample:")
    pipe.metrics().show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
