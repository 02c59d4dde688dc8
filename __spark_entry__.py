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

import pandas as pd
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


# ---------------------------------------------------------------------
# queries — sibling sketches (count-min / bloom / HLL), histograms
# ---------------------------------------------------------------------

def _q_countmin_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates; width >> cardinality ⇒ exact counts
    with overwhelming probability (functions/sketches.py)."""
    from t_digest_spark.operators.sketch_agg import (
        cm_estimates, hashed, sketch_aggregate,
    )
    events = load_table(spark, sf_dir, "events")
    types = [r[0] for r in
             events.select("event_type").distinct().orderBy("event_type")
             .collect()]
    agg = sketch_aggregate(events, "event_type", "cm", width=65536, depth=5)
    est = agg.select(cm_estimates(
        "sketch", F.array(*[hashed(F.lit(t)) for t in types])).alias("est"))
    return est.select(
        F.posexplode("est").alias("type_idx", "est_count")
    ).withColumn(
        "event_type",
        F.element_at(F.array(*[F.lit(t) for t in types]),
                     F.col("type_idx") + 1),
    ).select("event_type", "est_count")


def _q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-HLL distinct users per event type (approximate → rows-only;
    tolerance asserted in tests/test_sketches.py)."""
    from t_digest_spark.operators.sketch_agg import distinct_count_approx
    events = load_table(spark, sf_dir, "events")
    return distinct_count_approx(events, "user_id", ["event_type"])


def _q_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FloatHistogram per event_type: exact bucket-count totals
    (oracle checks total counts per group — bucket arithmetic is
    float-bit-level and checked in tests/test_histogram_compare.py)."""
    from t_digest_spark.functions.histogram import histogram_aggregate
    events = load_table(spark, sf_dir, "events")
    pos = events.where(F.col("value") > 0.001)
    agg = histogram_aggregate(pos, "value", ["event_type"], kind="float",
                              min_=1e-3, max_=1e6)
    return agg.select("event_type", F.col("rows").alias("n_values"))


# ---------------------------------------------------------------------
# queries — training-pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------

def _q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting per source (operators/dedup.py)."""
    from t_digest_spark.operators.dedup import exact_dedup
    docs = load_table(spark, sf_dir, "documents")
    kept = exact_dedup(docs, "text", "doc_id")
    return (docs.groupBy("source").agg(F.count("*").alias("n_docs"))
            .join(kept.groupBy("source").agg(
                F.count("*").alias("n_unique")), "source"))


def _q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char totals per lang
    (operators/text.py; oracle reproduces the token count with
    length/replace arithmetic on single-space-normalized text)."""
    from t_digest_spark.operators.text import token_count
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "lang",
        F.regexp_replace(F.trim("text"), r"\s+", " ").alias("t"))
    return norm.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("t")).alias("total_tokens"),
        F.sum(F.length("t")).alias("total_chars"),
    )


def _q_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID vs the labeled lang column: agreement
    counts per label (deterministic → rows-only with pytest cover)."""
    from t_digest_spark.operators.text import lang_id
    docs = load_table(spark, sf_dir, "documents")
    return (docs.withColumn("pred", lang_id("text"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("pred") == F.col("lang"), 1)
                       .otherwise(0)).alias("n_agree")))


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pair count per jaccard band (rows-only —
    exactness of the verified jaccard is covered in tests)."""
    from t_digest_spark.operators.dedup import minhash_lsh_pairs
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", num_perm=32,
                              bands=8, threshold=0.5)
    return pairs.groupBy(
        F.floor(F.col("jaccard") * 10).alias("jaccard_decile")
    ).agg(F.count("*").alias("n_pairs"))


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the vec_id=0 embedding
    (operators/similarity.py); oracle = DuckDB list_cosine_similarity.
    Values rounded to 5 decimals on both sides."""
    from t_digest_spark.operators.similarity import cosine_to_query
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    scored = emb.select(
        "vec_id",
        F.round(cosine_to_query(
            F.col("embedding").cast("array<double>"), q), 5).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


def _q_kll_median_smalln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL with n << capacity retains every sample ⇒ quantile(0.5) is
    the exact order statistic at rank ceil(0.5 n) (functions/kll.py)."""
    from t_digest_spark.functions.kll import kll_aggregate, kll_quantiles_of
    nation = load_table(spark, sf_dir, "nation")
    agg = kll_aggregate(
        nation.withColumn("nk", F.col("n_nationkey").cast("double")),
        "nk", ["n_regionkey"], k=200)
    return agg.select(
        "n_regionkey",
        F.element_at(kll_quantiles_of("kll", [0.5]), 1)
        .alias("median_nationkey"))


def _q_kll_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantiles per event type (approximate → rows-only; bounds
    asserted in tests/test_kll.py)."""
    from t_digest_spark.functions.kll import kll_aggregate, kll_quantiles_of
    events = load_table(spark, sf_dir, "events")
    agg = kll_aggregate(events, "value", ["event_type"], k=200)
    return agg.select("event_type",
                      kll_quantiles_of("kll", [0.1, 0.5, 0.9])
                      .alias("quantiles"))


def _q_drift_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between odd and even event_id halves of each
    event type: chi2 (G-test over quantile bins) + normalized KS
    (functions/compare.py, the monitoring scenario).  Deterministic →
    rows-only; behavior pinned in tests/test_histogram_compare.py."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, StructField, StructType

    from t_digest_spark.functions.compare import drift_scores
    events = load_table(spark, sf_dir, "events")
    half = events.withColumn("half", (F.col("event_id") % 2).cast("int"))
    agg = tdigest_aggregate(half, "value", ["event_type", "half"])
    wide = (agg.where(F.col("half") == 0)
            .select("event_type", F.col("digest").alias("d0"))
            .join(agg.where(F.col("half") == 1)
                  .select("event_type", F.col("digest").alias("d1")),
                  "event_type"))

    @pandas_udf(StructType([StructField("chi2", DoubleType()),
                            StructField("ks", DoubleType())]))
    def score(d0: pd.Series, d1: pd.Series) -> pd.DataFrame:
        out = [drift_scores(a, b) for a, b in zip(d0, d1)]
        return pd.DataFrame(out)

    return wide.select(
        "event_type", score("d0", "d1").alias("s")
    ).select("event_type",
             F.round(F.col("s.chi2"), 3).alias("chi2"),
             F.round(F.col("s.ks"), 3).alias("ks"))


def _q_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) derived purely by digest
    merging (operators/rollup.py) — exact stats at every grouping level
    match SQL GROUP BY ROLLUP."""
    from t_digest_spark.operators.rollup import tdigest_rollup
    li = load_table(spark, sf_dir, "lineitem")
    rolled = tdigest_rollup(li, "l_quantity",
                            ["l_returnflag", "l_linestatus"])
    s = digest_stats("digest")
    return rolled.select(
        "l_returnflag", "l_linestatus",
        s.getField("n").alias("n_values"),
        s.getField("min").alias("min_qty"),
        s.getField("max").alias("max_qty"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rollup_stats": _q_rollup_stats,
    "kll_median_smalln": _q_kll_median_smalln,
    "kll_quantiles_events": _q_kll_quantiles_events,
    "drift_scores": _q_drift_scores,
    "countmin_event_types": _q_countmin_event_types,
    "hll_distinct_users": _q_hll_distinct_users,
    "histogram_events": _q_histogram_events,
    "exact_dedup_documents": _q_exact_dedup_documents,
    "text_token_stats": _q_text_token_stats,
    "lang_id_agreement": _q_lang_id_agreement,
    "minhash_pairs": _q_minhash_pairs,
    "ann_topk": _q_ann_topk,
    "digest_stats_by_type": _q_digest_stats_by_type,
    "digest_quantiles_by_type": _q_digest_quantiles_by_type,
    "digest_global_lineitem": _q_digest_global_lineitem,
    "digest_median_smalln": _q_median_smalln,
    "digest_cdf_smalln": _q_cdf_smalln,
    "digest_trimmed_mean_smalln": _q_trimmed_mean_smalln,
}

ORACLES: dict[str, str] = {
    "rollup_stats": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(l_quantity) AS DOUBLE) AS n_values,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "kll_median_smalln": """
        WITH ranked AS (
            SELECT n_regionkey, CAST(n_nationkey AS DOUBLE) AS nk,
                   ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_regionkey) AS cnt
            FROM nation)
        SELECT n_regionkey, nk AS median_nationkey
        FROM ranked
        WHERE rn = GREATEST(CAST(CEIL(0.5 * cnt) AS BIGINT), 1)
    """,
    "countmin_event_types": """
        SELECT event_type, COUNT(*) AS est_count
        FROM events GROUP BY event_type
    """,
    "histogram_events": """
        SELECT event_type, COUNT(*) AS n_values
        FROM events WHERE value > 0.001 GROUP BY event_type
    """,
    "exact_dedup_documents": """
        WITH norm AS (
            SELECT source, doc_id,
                   LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g')) AS t
            FROM documents),
        keep AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY t),
        kept AS (SELECT n.source FROM norm n
                 JOIN keep k ON n.doc_id = k.doc_id)
        SELECT d.source, d.n_docs, u.n_unique
        FROM (SELECT source, COUNT(*) AS n_docs FROM documents
              GROUP BY source) d
        JOIN (SELECT source, COUNT(*) AS n_unique FROM kept
              GROUP BY source) u USING (source)
    """,
    "text_token_stats": """
        WITH norm AS (
            SELECT lang, REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g') AS t
            FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               SUM(CASE WHEN LENGTH(t) = 0 THEN 0
                   ELSE LENGTH(t) - LENGTH(REPLACE(t, ' ', '')) + 1
                   END) AS total_tokens,
               SUM(LENGTH(t)) AS total_chars
        FROM norm GROUP BY lang
    """,
    "ann_topk": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)),
                     5) AS cosine
        FROM embeddings
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """,
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
