"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``        — flagship query on sf0.001 (smoke check).
- ``queries()``           — one callable per implemented operator
  (SURVEY.md §2); each takes (spark, sf_dir) → DataFrame.
- ``oracle_sql()``        — DuckDB-equivalent SQL for the exactly-
  determined queries (SURVEY.md §7.5).  Approximate sketch outputs are
  registered without oracle SQL (rows-only check); their accuracy is
  asserted against exact NumPy oracles in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from t_digest_spark.operators.aggregate import (
    tdigest_aggregate,
)
from t_digest_spark.operators.extract import (
    cdf_of, digest_stats, quantile_of, quantiles_of, trimmed_mean_of,
)
from t_digest_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: p50/p99/p999 + interquartile mean of events.value per
    event_type via the two-stage mergeable t-digest aggregate."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    agg = tdigest_aggregate(events, "value", ["event_type"])
    return agg.select(
        "event_type",
        F.col("rows").alias("n_rows"),
        quantile_of("digest", 0.5).alias("p50"),
        quantile_of("digest", 0.99).alias("p99"),
        quantile_of("digest", 0.999).alias("p999"),
        trimmed_mean_of("digest", 0.25, 0.75).alias("iqm"),
        digest_stats("digest").alias("stats"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------
# queries — t-digest sketch family
# ---------------------------------------------------------------------

def _q_digest_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest metadata is exact: n == COUNT, min == MIN, max == MAX
    (SURVEY §2.A9)."""
    events = load_table(spark, sf_dir, "events")
    agg = tdigest_aggregate(events, "value", ["event_type"])
    s = digest_stats("digest")
    return agg.select(
        "event_type",
        s.getField("n").alias("n_values"),
        s.getField("min").alias("min_value"),
        s.getField("max").alias("max_value"),
    )


def _q_digest_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per group (A5) — rows-only driver check;
    accuracy bound asserted in tests/test_spark_agg.py."""
    events = load_table(spark, sf_dir, "events")
    agg = tdigest_aggregate(events, "value", ["event_type"])
    return agg.select(
        "event_type",
        quantiles_of("digest", [0.01, 0.5, 0.99, 0.999]).alias("quantiles"),
        trimmed_mean_of("digest", 0.1, 0.9).alias("trimmed_mean"),
    )


def _q_digest_global_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) digest over a fact column — treeAggregate path."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = tdigest_aggregate(li, "l_extendedprice", tree=True)
    return agg.select(
        F.col("rows").alias("n_rows"),
        quantiles_of("digest", [0.5, 0.95, 0.999]).alias("quantiles"),
    )


def _q_median_smalln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n<=delta ⇒ all singletons ⇒ quantiles are exact order statistics
    (TDigestTest.java:377-403); median of 5 nations per region is exact."""
    nation = load_table(spark, sf_dir, "nation")
    agg = tdigest_aggregate(
        nation.withColumn("nk", F.col("n_nationkey").cast("double")),
        "nk", ["n_regionkey"])
    return agg.select(
        "n_regionkey",
        quantile_of("digest", 0.5).alias("median_nationkey"),
    )


def _q_cdf_smalln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Midpoint-rule CDF on singleton digests is exactly
    (n_less + 0.5*n_eq)/n (TDigest.java:120-127)."""
    nation = load_table(spark, sf_dir, "nation")
    agg = tdigest_aggregate(
        nation.withColumn("nk", F.col("n_nationkey").cast("double")),
        "nk", ["n_regionkey"])
    return agg.select(
        "n_regionkey",
        cdf_of("digest", 12.0).alias("cdf_at_12"),
    )


def _q_trimmed_mean_smalln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed mean over singleton digests with rank window on exact
    centroid boundaries (q0*n, q1*n integers) is exact (SURVEY §2.A8)."""
    nation = load_table(spark, sf_dir, "nation")
    agg = tdigest_aggregate(
        nation.withColumn("nk", F.col("n_nationkey").cast("double")),
        "nk", ["n_regionkey"])
    return agg.select(
        "n_regionkey",
        trimmed_mean_of("digest", 0.2, 0.8).alias("inner_mean"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "digest_stats_by_type": _q_digest_stats_by_type,
    "digest_quantiles_by_type": _q_digest_quantiles_by_type,
    "digest_global_lineitem": _q_digest_global_lineitem,
    "digest_median_smalln": _q_median_smalln,
    "digest_cdf_smalln": _q_cdf_smalln,
    "digest_trimmed_mean_smalln": _q_trimmed_mean_smalln,
}

ORACLES: dict[str, str] = {
    "digest_stats_by_type": """
        SELECT event_type,
               CAST(COUNT(value) AS DOUBLE) AS n_values,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type
    """,
    "digest_median_smalln": """
        WITH ranked AS (
            SELECT n_regionkey, CAST(n_nationkey AS DOUBLE) AS nk,
                   ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_regionkey) AS cnt
            FROM nation)
        SELECT n_regionkey, nk AS median_nationkey
        FROM ranked WHERE rn = CAST(FLOOR(0.5 * cnt) AS BIGINT) + 1
    """,
    "digest_cdf_smalln": """
        SELECT n_regionkey,
               (SUM(CASE WHEN n_nationkey < 12.0 THEN 1.0 ELSE 0.0 END)
                + 0.5 * SUM(CASE WHEN n_nationkey = 12.0 THEN 1.0 ELSE 0.0 END))
               / COUNT(*) AS cdf_at_12
        FROM nation GROUP BY n_regionkey
    """,
    "digest_trimmed_mean_smalln": """
        WITH ranked AS (
            SELECT n_regionkey, CAST(n_nationkey AS DOUBLE) AS nk,
                   ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_regionkey) AS cnt
            FROM nation)
        SELECT n_regionkey, AVG(nk) AS inner_mean
        FROM ranked
        WHERE rn > CAST(0.2 * cnt AS BIGINT) AND rn <= CAST(0.8 * cnt AS BIGINT)
        GROUP BY n_regionkey
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
