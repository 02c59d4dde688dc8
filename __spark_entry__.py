"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``        — flagship query on sf0.001 (smoke check).
- ``queries()``           — one callable per implemented operator
  (SURVEY.md §2); each takes (spark, sf_dir) → DataFrame.
- ``oracle_sql()``        — DuckDB-equivalent SQL for every query.

Harness rules honored here (learned in round 1):
- no array-typed output columns (the driver canonicalizes with pandas
  ``sort_values``, which cannot factorize lists) — quantile arrays are
  exploded to scalar (q, value/ok) rows;
- integer aggregates are cast to BIGINT on BOTH sides (DuckDB SUM
  returns HUGEINT; the value hash is dtype-sensitive);
- approximate sketches are checked the way the reference checks itself
  (Dist.java:27-83, AccuracyTest.java:131-151): against an *exact*
  construction.  Here that is a boolean column computed on the Spark
  side — e.g. the exact mid-point rank of the estimated quantile is
  within the published rank-error bound — whose oracle is literally
  ``true``.  The booleans carry real evidence because Spark computes
  the exact rank from the raw data, not from the sketch.
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
# exact-rank verification scaffold for approximate quantile sketches
# ---------------------------------------------------------------------

def _rank_check(df: DataFrame, value_col: str, key_cols: list[str],
                est: DataFrame, bound: float) -> DataFrame:
    """For each (key, q, est) row of ``est``, compute the exact mid-point
    rank of ``est`` in df[value_col] within the key group and test
    |rank - q| <= bound — the AccuracyTest.java:131-151 criterion
    computed from the raw data, not the sketch.  ``est`` is tiny
    (groups x probes) and broadcast; the verify pass is one extra scan
    with a small aggregation, no extra wide shuffle."""
    j = df.select(*key_cols, F.col(value_col).alias("__v")) \
        .join(F.broadcast(est), key_cols)
    grouped = j.groupBy(*key_cols, "q", "est").agg(
        ((F.sum(F.when(F.col("__v") < F.col("est"), 1.0).otherwise(0.0))
          + 0.5 * F.sum(F.when(F.col("__v") == F.col("est"), 1.0)
                        .otherwise(0.0)))
         / F.count("*")).alias("__rank"))
    return grouped.select(
        *key_cols, "q",
        (F.abs(F.col("__rank") - F.col("q")) <= F.lit(bound))
        .alias("rank_ok"))


def _explode_quantiles(agg: DataFrame, key_cols: list[str],
                       quant_col, qs: list[float]) -> DataFrame:
    """(keys, array<double>) → (keys, q, est) scalar rows."""
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return agg.select(
        *key_cols, F.posexplode(quant_col).alias("__qi", "est")
    ).withColumn("q", F.element_at(qarr, F.col("__qi") + 1)) \
        .select(*key_cols, "q", "est")


def _qs_oracle(qs: list[float]) -> str:
    return "SELECT UNNEST([" + ", ".join(
        f"{q!r}::DOUBLE" for q in qs) + "]) AS q"


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


_DIGEST_QS = [0.01, 0.5, 0.99, 0.999]


def _q_digest_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per group (A5), verified by exact mid-point
    rank error <= 0.015 (the AccuracyTest.java:131-151 abs bound) —
    scalar (event_type, q, rank_ok) rows, oracle = all-true."""
    events = load_table(spark, sf_dir, "events")
    agg = tdigest_aggregate(events, "value", ["event_type"])
    est = _explode_quantiles(
        agg, ["event_type"], quantiles_of("digest", _DIGEST_QS), _DIGEST_QS)
    return _rank_check(events, "value", ["event_type"], est, 0.015)


_GLOBAL_QS = [0.5, 0.95, 0.999]


def _q_digest_global_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) digest over a fact column — treeAggregate
    path; n_rows exact vs COUNT, quantiles verified by exact rank."""
    li = load_table(spark, sf_dir, "lineitem").withColumn("__g", F.lit(1))
    agg = tdigest_aggregate(li, "l_extendedprice", tree=True) \
        .withColumn("__g", F.lit(1))
    est = _explode_quantiles(
        agg, ["__g"], quantiles_of("digest", _GLOBAL_QS), _GLOBAL_QS)
    checked = _rank_check(li, "l_extendedprice", ["__g"], est, 0.015)
    return checked.join(
        agg.select("__g", F.col("rows").alias("n_rows")), "__g") \
        .select("q", "rank_ok", "n_rows")


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
    with overwhelming probability (functions/sketches.py).

    The probe array is built from a driver-side collect of the DISTINCT
    event types — bounded by the enum cardinality of the column (5
    here; this shape is for dimension-like probe sets of <= ~10^4
    values, not arbitrary keys — use a broadcast join of a probe table
    for anything larger)."""
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
    """Own-HLL distinct users per event type, checked against the exact
    COUNT(DISTINCT): n_exact matches the oracle exactly and hll_ok
    asserts |est - exact|/exact <= 0.05 (p=14 ⇒ ~0.8% typical error)."""
    from t_digest_spark.operators.sketch_agg import distinct_count_approx
    events = load_table(spark, sf_dir, "events")
    approx = distinct_count_approx(events, "user_id", ["event_type"])
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return approx.join(exact, "event_type").select(
        "event_type", "n_exact",
        (F.abs(F.col("approx_distinct") - F.col("n_exact"))
         / F.col("n_exact") <= 0.05).alias("hll_ok"))


def _q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter over every user_id: inserted keys are ALL found (no
    false negatives — exactly determined), and the false-positive rate
    on the same number of never-inserted probe keys stays within 5x the
    configured 1% fpp (deterministic given the fixed JVM hash)."""
    from t_digest_spark.operators.sketch_agg import (
        bloom_contains, hashed, sketch_aggregate,
    )
    events = load_table(spark, sf_dir, "events")
    agg = sketch_aggregate(events, "user_id", "bloom",
                           expected_items=200_000, fpp=0.01)
    present = events.select(hashed(F.col("user_id")).alias("h")).distinct() \
        .agg(F.collect_list("h").alias("hs"))
    absent = events.select(
        hashed(F.concat(F.col("user_id"), F.lit("#never-inserted")))
        .alias("h")).distinct().agg(F.collect_list("h").alias("hs"))
    n_in = agg.crossJoin(present).select(
        F.explode(bloom_contains("sketch", "hs")).alias("hit")
    ).agg(F.count("*").alias("n_probes"),
          F.sum(F.col("hit").cast("long")).alias("n_hits"))
    n_fp = agg.crossJoin(absent).select(
        F.explode(bloom_contains("sketch", "hs")).alias("hit")
    ).agg((F.sum(F.col("hit").cast("long")) / F.count("*") <= 0.05)
          .alias("fp_ok"))
    return n_in.crossJoin(n_fp).select("n_probes", "n_hits", "fp_ok")


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
    length/replace arithmetic on single-space-normalized text).
    Sums cast to long on both sides (DuckDB SUM → HUGEINT otherwise)."""
    from t_digest_spark.operators.text import token_count
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "lang",
        F.regexp_replace(F.trim("text"), r"\s+", " ").alias("t"))
    return norm.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("t")).cast("long").alias("total_tokens"),
        F.sum(F.length("t")).cast("long").alias("total_chars"),
    )


def _q_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID vs the labeled lang column: agreement
    counts per label.  Fully deterministic Catalyst expression, so the
    oracle reproduces the stopword-argmax in DuckDB SQL."""
    from t_digest_spark.operators.text import lang_id
    docs = load_table(spark, sf_dir, "documents")
    return (docs.withColumn("pred", lang_id("text"))
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("pred") == F.col("lang"), 1)
                       .otherwise(0)).cast("long").alias("n_agree")))


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs at jaccard >= 0.8, emitted with
    exact distinct-shingle intersection/union counts.  With 128
    permutations in 32 bands the per-pair miss probability at j >= 0.8
    is (1-j^4)^32 < 6e-8 — and the fixed seed makes the run
    deterministic — so the pair set equals the exact all-pairs answer,
    which the oracle computes via a shingle inverted-index self-join."""
    from t_digest_spark.operators.dedup import minhash_lsh_pairs
    from t_digest_spark.operators.text import shingle_fingerprints
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", k_shingle=5,
                              num_perm=128, bands=32, threshold=0.8)
    sh = docs.select(F.col("doc_id"),
                     shingle_fingerprints("text", 5).alias("__sh"))
    return (pairs
            .join(F.broadcast(sh.select(F.col("doc_id").alias("id_a"),
                                        F.col("__sh").alias("__sa"))), "id_a")
            .join(F.broadcast(sh.select(F.col("doc_id").alias("id_b"),
                                        F.col("__sh").alias("__sb"))), "id_b")
            .select(
                "id_a", "id_b",
                F.size(F.array_intersect("__sa", "__sb")).alias("n_common"),
                F.size(F.array_union("__sa", "__sb")).alias("n_union")))


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


_KLL_QS = [0.1, 0.5, 0.9]


def _q_kll_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantiles per event type, verified by exact mid-point rank
    error <= 0.025 (k=200 ⇒ ~1% uniform rank error w.h.p.) — scalar
    (event_type, q, rank_ok) rows, oracle = all-true."""
    from t_digest_spark.functions.kll import kll_aggregate, kll_quantiles_of
    events = load_table(spark, sf_dir, "events")
    agg = kll_aggregate(events, "value", ["event_type"], k=200)
    est = _explode_quantiles(
        agg, ["event_type"], kll_quantiles_of("kll", _KLL_QS), _KLL_QS)
    return _rank_check(events, "value", ["event_type"], est, 0.025)


def _q_drift_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between odd and even event_id halves of each
    event type (functions/compare.py, the reference monitoring
    scenario, ComparisonTest.java:38-127).  Oracle-checkable form:
    - self_ks: KS(d0, d0) == 0.0 exactly (identical cdfs);
    - self_chi2_ok: G-test of a digest against itself stays below 1.0
      (only quantile/cdf interpolation noise);
    - cross_ks_ok / cross_chi2_ok: the two same-distribution halves
      score below the standard alerting thresholds (normalized KS
      critical value ~1.63 at alpha=0.01; chi2_0.999 at 6 df ~22.5)."""
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

    @pandas_udf(StructType([StructField("self_chi2", DoubleType()),
                            StructField("self_ks", DoubleType()),
                            StructField("chi2", DoubleType()),
                            StructField("ks", DoubleType())]))
    def score(d0: pd.Series, d1: pd.Series) -> pd.DataFrame:
        out = []
        for a, b in zip(d0, d1):
            s_self = drift_scores(a, a)
            s_cross = drift_scores(a, b)
            out.append({"self_chi2": s_self["chi2"],
                        "self_ks": s_self["ks"],
                        "chi2": s_cross["chi2"],
                        "ks": s_cross["ks"]})
        return pd.DataFrame(out)

    return wide.select(
        "event_type", score("d0", "d1").alias("s")
    ).select("event_type",
             F.col("s.self_ks").alias("self_ks"),
             (F.abs(F.col("s.self_chi2")) < 1.0).alias("self_chi2_ok"),
             (F.col("s.ks") < 1.63).alias("cross_ks_ok"),
             (F.col("s.chi2") < 22.5).alias("cross_chi2_ok"))


def _q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup with planted duplicates (operators/dedup.py
    simhash_pairs): every doc_id % 10 == 0 document gets an exact copy
    at doc_id + 1,000,000; identical text ⇒ identical token hashes ⇒
    identical signature ⇒ guaranteed chunk-bucket candidacy and
    Hamming 0 — so the (base, twin) pair set is found with probability
    1 and equals the oracle exactly.

    Why planted: this corpus's tiny vocabulary collapses the natural
    simhash space — docs with different token bags share signatures and
    docs at shingle-jaccard 0.97 sit at Hamming 53 — so NO SQL-
    expressible relation matches natural simhash pairs; near-dup
    sensitivity on realistic text is covered by
    tests/test_pipeline_ops.py instead."""
    from t_digest_spark.operators.dedup import simhash_pairs
    docs = load_table(spark, sf_dir, "documents") \
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    twins = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    both = docs.unionByName(twins)
    pairs = simhash_pairs(both, "text", "doc_id", max_hamming=3)
    return (pairs
            .where(F.col("id_b") == F.col("id_a") + 1_000_000)
            .select(F.col("id_a").cast("long").alias("id_a"),
                    F.col("id_b").cast("long").alias("id_b"),
                    F.col("hamming").cast("int").alias("hamming")))


def _q_minhash_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scale keep/drop dedup (operators/dedup.py minhash_dedup):
    a planted cluster of 1,000 identical documents (distinctive
    synthetic text absent from the corpus, ids 1,000,000..1,000,999) is
    appended to the sf documents table and the full verified dedup —
    signatures, banding, O(k) candidate edges, exact-Jaccard edge
    verification, min-label component propagation — runs over
    corpus+cluster together.  Every planted doc must map to
    rep_id 1,000,000 with exactly one keeper.  n_cand_edges reports the
    operator's candidate volume inside the cluster: 2k-3 = 1,997
    chain+min edges (bucket_candidate_edges), evidence the decision
    path is O(k) and never materializes the 499,500 pairs.

    Why the oracle is the planted construction: component membership of
    the NATURAL corpus is connected components over near-dup edges —
    not expressible in single-pass SQL — while the planted cluster's
    correct answer is exact and data-independent (identical text ⇒
    jaccard-1 verified edges ⇒ one component with min id 1,000,000,
    found with probability 1 under the fixed seed).  Natural docs are
    still in the run: they can steal bucket minima and band buckets,
    and the chain+min edge set plus jaccard verification must shrug
    that off for the cluster rows to come out right."""
    from t_digest_spark.operators.dedup import (
        bucket_candidate_edges, minhash_buckets, minhash_dedup)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    k = 1000
    planted = spark.range(k).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.lit("synthetic boilerplate paragraph planted for the dedup "
              "cluster oracle with deliberately distinctive vocabulary "
              "kumquat zeppelin quasar marzipan obelisk").alias("text"))
    both = docs.unionByName(planted)
    dec = minhash_dedup(both, "text", "doc_id", k_shingle=5,
                        num_perm=64, bands=16, threshold=0.8)
    cluster = dec.where(F.col("doc_id") >= 1_000_000)
    cand = bucket_candidate_edges(
        minhash_buckets(both, "text", "doc_id", 5, 64, 16)
        .where(F.col("doc_id") >= 1_000_000), "doc_id")
    n_cand = cand.agg(F.count("*").cast("long").alias("n_cand_edges"))
    return (cluster.crossJoin(n_cand)
            .select("doc_id", "rep_id", "is_keeper", "n_cand_edges"))


def _q_minhash_dedup_unverified(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cluster-scale keep/drop dedup on the UNVERIFIED path
    (operators/dedup.py minhash_dedup with threshold=None — the
    standard crawl-pipeline setting and the exact configuration the
    scaling bench measures): band-bucket co-occurrence IS the
    duplicate edge, so the decision flows signatures → banding →
    singleton pruning + bucket-min star contraction (one window pass,
    dedup.py lsh_components) → min-label components.  A planted
    cluster of 800 identical documents (distinctive synthetic text,
    ids 3,000,000..3,000,799) must map to rep_id 3,000,000 with
    exactly one keeper.  ``assume_unique_ids=True`` is exercised too:
    doc_id is a primary key for corpus+cluster by construction.

    The oracle is exact and data-independent: identical text ⇒
    identical signatures ⇒ the cluster shares every band bucket ⇒ one
    component whose min id is 3,000,000.  Natural corpus docs share a
    planted bucket only on a 64-bit xxhash64 band-key collision of
    distinctive-vocabulary minhashes (probability ~0); they still
    co-run and must be singleton-pruned/contracted around."""
    from t_digest_spark.operators.dedup import minhash_dedup
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    k = 800
    planted = spark.range(k).select(
        (F.col("id") + 3_000_000).alias("doc_id"),
        F.lit("unverified dedup oracle cluster with deliberately "
              "distinctive vocabulary glockenspiel periwinkle "
              "archipelago thermocline xylophone").alias("text"))
    both = docs.unionByName(planted)
    dec = minhash_dedup(both, "text", "doc_id", k_shingle=5,
                        num_perm=64, bands=16, threshold=None,
                        assume_unique_ids=True)
    return (dec.where(F.col("doc_id") >= 3_000_000)
            .select("doc_id", "rep_id", "is_keeper"))


def _q_simhash_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scale keep/drop SimHash dedup (operators/dedup.py
    simhash_dedup): a planted cluster of 600 identical documents
    (distinctive synthetic text, ids 2,000,000..2,000,599) is appended
    to the sf documents table and the verified dedup — simhash,
    pigeonhole chunk buckets, O(k) chain+min candidate edges, exact
    Hamming verification, min-label component propagation — runs over
    corpus+cluster together.  Every planted doc must map to rep_id
    2,000,000 with exactly one keeper.  Same construction (and same
    reasoning for why the planted answer is the oracle) as
    minhash_dedup_cluster: identical text ⇒ identical 64-bit simhash ⇒
    Hamming-0 verified edges ⇒ one component with min id 2,000,000;
    natural docs participate as bucket-minima distractors and a
    natural doc landing within Hamming 3 of the planted hash has
    probability ~n·4.4e4/2^64 ≈ 0."""
    from t_digest_spark.operators.dedup import simhash_dedup
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    k = 600
    planted = spark.range(k).select(
        (F.col("id") + 2_000_000).alias("doc_id"),
        F.lit("another distinctive planted boilerplate paragraph for "
              "the simhash dedup oracle full of rare tokens gazebo "
              "fjord sphinx quartz vortex banjo").alias("text"))
    both = docs.unionByName(planted)
    dec = simhash_dedup(both, "text", "doc_id", max_hamming=3,
                        verify=True)
    return (dec.where(F.col("doc_id") >= 2_000_000)
            .select("doc_id", "rep_id", "is_keeper"))


def _q_embedding_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scale keep/drop embedding dedup (operators/dedup.py
    embedding_dedup): 300 deterministic perturbations of embedding 0
    (element i of twin j scaled by 1 + ((j + 31·i) % 7)/1000, cosine
    ~0.999998 to the base and ~0.999996 twin-to-twin) are planted as
    ids 2,000,000..2,000,299 next to the full embeddings table.  The
    base vector 0 itself joins the duplicate component (it IS a
    near-dup of every twin), so every planted row must resolve to
    rep_id 0 with is_keeper false — the keeper is the natural base
    row, exactly what a crawl dedup should decide when a cluster's
    minimum id is an original already in the corpus.  Per-band miss
    probability at this cosine is ~1e-8 (16 planes x 4 bands), so the
    planted answer is deterministic under the fixed seed; cosine
    verification against bucket minima (threshold 0.95) rules out any
    natural vector (max natural pair cosine ~0.55) sneaking in."""
    from t_digest_spark.operators.dedup import embedding_dedup
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"))
    k = 300
    base0 = emb.where(F.col("vec_id") == 0).select("embedding")
    planted = (spark.range(k).crossJoin(base0)
               .select((F.col("id") + 2_000_000).alias("vec_id"),
                       F.transform(
                           "embedding",
                           lambda x, i: x * (1 + ((F.col("id") + 31 * i)
                                                  % 7) / 1000.0)
                       ).alias("embedding")))
    both = emb.unionByName(planted)
    dec = embedding_dedup(both, "embedding", "vec_id",
                          n_planes=16, n_bands=4, threshold=0.95)
    return (dec.where(F.col("vec_id") >= 2_000_000)
            .select("vec_id", "rep_id", "is_keeper"))


def _q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH near-dup over embeddings
    (operators/dedup.py embedding_cosine_pairs, 4 bands x 16 planes).

    The testdata embeddings have no natural near-dups (max base-pair
    cosine ~0.55), so every vec_id % 10 == 0 row gets a deterministic
    perturbed twin (id + 1,000,000, element i scaled by
    1 + ((vec_id + 31*i) % 7)/1000 → cosine ~0.999998 to its base).
    At that cosine the per-pair LSH miss probability is ~1e-8, so the
    emitted pair set equals the exact all-pairs cosine >= 0.95 answer,
    which the oracle computes brute-force over the same augmented
    table.  Only ids are emitted — classification margins (0.9999 vs
    <0.6) dwarf any cross-engine float noise."""
    from t_digest_spark.operators.dedup import embedding_cosine_pairs
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id",
                      F.col("embedding").cast("array<double>")
                      .alias("embedding"))
    twins = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (1 + ((F.col("vec_id") + 31 * i) % 7) / 1000.0)
        ).alias("embedding"))
    both = base.unionByName(twins)
    pairs = embedding_cosine_pairs(both, "embedding", "vec_id",
                                   n_planes=16, n_bands=4, threshold=0.95)
    return pairs.select(F.col("id_a").cast("long").alias("id_a"),
                        F.col("id_b").cast("long").alias("id_b"))


def _q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN planted-neighbor recall through the FULL index
    lifecycle (operators/similarity.py): train centroids with the
    distributed bottom-m sample (ivf_fit — bounded driver traffic, no
    limit().collect()), persist the centroid table (ivf_save), reload
    it (ivf_load), re-assign the corpus (ivf_assign), then query.  The
    first 16 embeddings, deterministically perturbed (cosine ~0.999998
    to their base), are the queries; the reloaded index (16 lists,
    seeded k-means, nprobe=4) must return the planted base vector as
    top-1 — the standard planted-NN ANN check, computed in ONE Spark
    job via ivf_topk_batch.  (The raw embeddings have no cluster
    structure — max base-pair cosine ~0.55 — so generic recall@10
    would measure noise, not index quality.)  All-true oracle."""
    import tempfile

    from t_digest_spark.operators.similarity import (
        ivf_assign, ivf_fit, ivf_load, ivf_save, ivf_topk_batch)
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x * (1 + ((F.col("vec_id") + 31 * i) % 7) / 1000.0)
        ).alias("query_vec"))
    with tempfile.TemporaryDirectory() as tmp:
        cents_trained = ivf_fit(emb, n_lists=16)
        ivf_save(spark, cents_trained, f"{tmp}/centroids")
        cents = ivf_load(spark, f"{tmp}/centroids")
    indexed = ivf_assign(emb, cents)
    top1 = ivf_topk_batch(indexed, cents, queries_df, k=1, nprobe=4)
    return (queries_df.select("query_id")
            .join(top1.select("query_id",
                              F.col("vec_id").cast("long").alias("hit")),
                  "query_id", "left")
            .select("query_id",
                    (F.col("hit") == F.col("query_id"))
                    .alias("found_neighbor")))


_GAP_QS = [0.5, 0.95]


def _q_event_gaps_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star job shape on the driver's events table: window
    lag per user_id → inter-event gap seconds → t-digest by event_type
    → p50/p95 verified by exact mid-point rank error <= 0.015, plus the
    exact gap count per type (window-function coverage with a full SQL
    oracle)."""
    from pyspark.sql import Window
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gaps = (events
            .withColumn("gap_s", ts_s - F.lag(ts_s).over(w))
            .where(F.col("gap_s").isNotNull()))
    agg = tdigest_aggregate(gaps, "gap_s", ["event_type"])
    est = _explode_quantiles(
        agg, ["event_type"], quantiles_of("digest", _GAP_QS), _GAP_QS)
    checked = _rank_check(gaps, "gap_s", ["event_type"], est, 0.015)
    n = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"))
    return checked.join(n, "event_type") \
        .select("event_type", "q", "rank_ok", "n_gaps")


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


def _q_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) derived purely by digest
    merging (operators/rollup.py tdigest_cube — 2^k grouping sets, no
    input rescans) — exact stats at every grouping set match SQL
    GROUP BY CUBE."""
    from t_digest_spark.operators.rollup import tdigest_cube
    li = load_table(spark, sf_dir, "lineitem")
    cubed = tdigest_cube(li, "l_quantity",
                         ["l_returnflag", "l_linestatus"])
    s = digest_stats("digest")
    return cubed.select(
        "l_returnflag", "l_linestatus",
        s.getField("n").alias("n_values"),
        s.getField("min").alias("min_qty"),
        s.getField("max").alias("max_qty"),
    )


def _quality_variant_text():
    """Constructed text variant that makes every quality component vary
    (the raw corpus is punctuation/digit-free ASCII, which would pin
    quality at 1.0 for all docs): truncate by doc_id, pad with '!' runs
    (punct ratio) and '3' runs (digit ratio).  Pure Catalyst, so the
    oracle rebuilds the identical string."""
    return F.concat(
        F.col("text").substr(
            F.lit(1), (F.lit(8) + F.col("doc_id") % 25).cast("int")),
        F.expr("repeat('!', CAST(doc_id % 5 AS INT))"),
        F.expr("repeat('3', CAST(doc_id % 4 AS INT))"))


def _q_digest_orders_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational path showcase (SURVEY §2.B joins): orders ⋈ customer
    ⋈ broadcast(nation) ⋈ broadcast(region), digest of o_totalprice
    per region.  Exact columns (n/min/max) check the whole join+agg
    pipeline; the p50 estimate is verified by the exact mid-point rank
    bound (AccuracyTest.java:131-151) computed from the raw joined
    rows, oracle literal true."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (orders
              .join(customer, orders.o_custkey == customer.c_custkey)
              .join(F.broadcast(nation),
                    customer.c_nationkey == nation.n_nationkey)
              .join(F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey)
              .select("r_name", "o_totalprice"))
    agg = tdigest_aggregate(joined, "o_totalprice", ["r_name"])
    s = digest_stats("digest")
    est = agg.select(
        "r_name",
        quantile_of("digest", 0.5).alias("est"),
        F.lit(0.5).alias("q"))
    checked = _rank_check(joined, "o_totalprice", ["r_name"], est,
                          bound=0.015)
    return (agg.select(
        "r_name",
        s.getField("n").cast("long").alias("n_orders"),
        s.getField("min").alias("min_price"),
        s.getField("max").alias("max_price"))
        .join(checked.select("r_name", "rank_ok"), "r_name"))


def _q_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring + char-class stats (operators/text.py
    quality_score / char_stats / token_count) over a constructed text
    variant; every component (length, mean word length, punct ratio,
    digit ratio) discriminates.  The oracle reproduces the regex counts
    and the exact IEEE arithmetic of the score."""
    from t_digest_spark.operators.text import (
        char_stats, quality_score, token_count,
    )
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("doc_id") < 25)
    t = _quality_variant_text()
    cs = char_stats(t)
    return docs.select(
        "doc_id",
        cs.getField("n_chars").cast("long").alias("n_chars"),
        token_count(t).cast("long").alias("n_words"),
        cs.getField("n_punct").cast("long").alias("n_punct"),
        cs.getField("n_digit").cast("long").alias("n_digit"),
        quality_score(t).alias("quality"),
    )


def _q_media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (operators/multimodal.py frame_sample)
    over the deterministic documents-derived media table: one row per
    sampled frame timestamp, all JVM-side sequence/explode arithmetic
    the oracle reproduces with generate_series."""
    from t_digest_spark.operators.multimodal import (
        frame_sample, media_from_documents,
    )
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("doc_id") < 60)
    frames = frame_sample(media_from_documents(docs),
                          every_ms=500, max_frames=8)
    return frames.select(
        "media_id",
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


def _q_media_feature_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline end-to-end: documents → binary payload
    → mapInPandas decode (operators/multimodal.py decode_features with
    the SQL-reproducible ``indexed_fake_decoder``) → feature slots.
    The payload bytes genuinely flow through Arrow into the kernel; the
    oracle recomputes slot codes from the same payload probes (length,
    first byte, last byte) with integer arithmetic — integers only, so
    the value hash is float-free."""
    from t_digest_spark.operators.multimodal import (
        decode_features, indexed_fake_decoder, media_from_documents,
    )
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("doc_id") < 20)
    feats = decode_features(media_from_documents(docs), dim=64,
                            decoder=indexed_fake_decoder)
    f = F.col("feature")
    return feats.select(
        "media_id", "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round(F.element_at(f, 1).cast("double") * 1000, 0)
        .cast("long").alias("code0"),
        F.round(F.element_at(f, 64).cast("double") * 1000, 0)
        .cast("long").alias("code63"),
    )


def _q_media_resize_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize pipeline (operators/multimodal.py resize_images):
    image payloads transform through the mapInPandas kernel (stub with
    SQL-predictable output size), non-image rows pass through
    byte-identical — n_bytes equality on those rows IS the
    payload-equality invariant, oracle-checked."""
    from t_digest_spark.operators.multimodal import (
        media_from_documents, resize_images,
    )
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("doc_id") < 30)
    resized = resize_images(media_from_documents(docs), 64, 64)
    return resized.select(
        "media_id", "modality",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


def _q_streaming_digest_smalln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming digest fold (streaming/digest_stream.py
    stream_digests): readStream over the nation parquet, foreachBatch
    partial→merge into versioned state, then query the final state.
    n<=delta ⇒ singleton centroids ⇒ the streamed digest's median is
    the exact order statistic, same construction as
    digest_median_smalln (TDigestTest.java:377-403)."""
    import os
    import tempfile

    from t_digest_spark.streaming.digest_stream import (
        read_digest_state, stream_digests,
    )
    src = os.path.join(sf_dir, "nation.parquet")
    schema = spark.read.parquet(src).schema
    base = tempfile.mkdtemp(prefix="tdigest_stream_q_")
    # FileStreamSource only accepts directories; expose the single
    # parquet file through a symlinked staging dir
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    os.symlink(os.path.abspath(src),
               os.path.join(src_dir, "nation.parquet"))
    stream = (spark.readStream.schema(schema).parquet(src_dir)
              .withColumn("nk", F.col("n_nationkey").cast("double")))
    q = stream_digests(stream, "nk", ["n_regionkey"],
                       os.path.join(base, "state"),
                       os.path.join(base, "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    st = read_digest_state(spark, os.path.join(base, "state"))
    return st.select(
        "n_regionkey",
        quantile_of("digest", 0.5).alias("median_nationkey"),
        F.col("rows").cast("long").alias("n_rows"),
    )


def _q_streaming_stateful_smalln(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Structured Streaming-NATIVE stateful digest
    (streaming/digest_stream.py stateful_digest_stream,
    applyInPandasWithState): readStream over the nation parquet, the
    per-key state IS the serialized digest, updated rows land in a
    memory sink; the final per-key row is the answer.  n<=delta ⇒
    singleton centroids ⇒ the state digest's p50 is the exact order
    statistic (TDigestTest.java:377-403), so this has an exact SQL
    oracle like the foreachBatch fold (streaming_digest_smalln) —
    covering the state-store variant end-to-end, not just in pytest."""
    import os
    import tempfile

    from t_digest_spark.streaming.digest_stream import (
        stateful_digest_stream,
    )
    src = os.path.join(sf_dir, "nation.parquet")
    schema = spark.read.parquet(src).schema
    base = tempfile.mkdtemp(prefix="tdigest_stateful_q_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    os.symlink(os.path.abspath(src),
               os.path.join(src_dir, "nation.parquet"))
    stream = (spark.readStream.schema(schema).parquet(src_dir)
              .withColumn("nk", F.col("n_nationkey").cast("double")))
    out = stateful_digest_stream(stream, "nk", ["n_regionkey"])
    sink = f"stateful_smalln_{os.path.basename(base).rsplit('_', 1)[-1]}"
    q = (out.writeStream.format("memory").queryName(sink)
         .outputMode("update")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # "update" mode emits one row per key per micro-batch that touched
    # it; the final state row for a key is the one with the max rows
    # (the digest only grows) — dedupe batch-side.
    from pyspark.sql import Window
    w = Window.partitionBy("n_regionkey").orderBy(F.desc("rows"))
    return (spark.table(sink)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("n_regionkey",
                    F.col("p50").alias("median_nationkey"),
                    F.col("rows").cast("long").alias("n_rows")))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rollup_stats": _q_rollup_stats,
    "cube_stats": _q_cube_stats,
    "kll_median_smalln": _q_kll_median_smalln,
    "kll_quantiles_events": _q_kll_quantiles_events,
    "drift_scores": _q_drift_scores,
    "countmin_event_types": _q_countmin_event_types,
    "hll_distinct_users": _q_hll_distinct_users,
    "bloom_membership": _q_bloom_membership,
    "histogram_events": _q_histogram_events,
    "exact_dedup_documents": _q_exact_dedup_documents,
    "text_token_stats": _q_text_token_stats,
    "lang_id_agreement": _q_lang_id_agreement,
    "minhash_pairs": _q_minhash_pairs,
    "simhash_neardup_pairs": _q_simhash_neardup_pairs,
    "minhash_dedup_cluster": _q_minhash_dedup_cluster,
    "minhash_dedup_unverified": _q_minhash_dedup_unverified,
    "simhash_dedup_cluster": _q_simhash_dedup_cluster,
    "embedding_dedup_cluster": _q_embedding_dedup_cluster,
    "embedding_neardup_pairs": _q_embedding_neardup_pairs,
    "ann_topk": _q_ann_topk,
    "ivf_recall": _q_ivf_recall,
    "event_gaps_window": _q_event_gaps_window,
    "digest_stats_by_type": _q_digest_stats_by_type,
    "digest_quantiles_by_type": _q_digest_quantiles_by_type,
    "digest_global_lineitem": _q_digest_global_lineitem,
    "digest_median_smalln": _q_median_smalln,
    "digest_cdf_smalln": _q_cdf_smalln,
    "digest_trimmed_mean_smalln": _q_trimmed_mean_smalln,
    "digest_orders_by_region": _q_digest_orders_by_region,
    "doc_quality_scores": _q_doc_quality_scores,
    "media_frame_plan": _q_media_frame_plan,
    "media_feature_probe": _q_media_feature_probe,
    "media_resize_probe": _q_media_resize_probe,
    "streaming_digest_smalln": _q_streaming_digest_smalln,
    "streaming_stateful_smalln": _q_streaming_stateful_smalln,
}


def _lang_id_oracle() -> str:
    """DuckDB SQL reproducing operators/text.py lang_id exactly:
    distinct-token stopword hits per language, argmax with ties broken
    by the lexicographically greatest language code (Spark array_max on
    struct(hits, lang)), 'und' when nothing hits."""
    from t_digest_spark.operators.text import _STOPWORDS
    values = ", ".join(
        "('%s', [%s])" % (code, ", ".join(f"'{w}'" for w in sw))
        for code, sw in _STOPWORDS.items())
    return f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                        ELSE list_transform(
                            regexp_split_to_array(TRIM(text), '\\s+'),
                            x -> LOWER(x)) END AS w
            FROM documents),
        scored AS (
            SELECT t.doc_id, t.lang, s.code,
                   len(list_intersect(t.w, s.sw)) AS hits
            FROM toks t CROSS JOIN (VALUES {values}) s(code, sw)),
        best AS (
            SELECT doc_id, lang, code, hits,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY hits DESC, code DESC) AS rn
            FROM scored),
        pred AS (
            SELECT doc_id, lang,
                   CASE WHEN hits > 0 THEN code ELSE 'und' END AS pred
            FROM best WHERE rn = 1)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree
        FROM pred GROUP BY lang
    """


_MINHASH_ORACLE = r"""
    WITH words AS (
        SELECT doc_id,
               CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(TRIM(LOWER(text)), '\s+')
               END AS w
        FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                        ELSE [array_to_string(w[i:i+4], ' ')
                              for i in range(1, len(w) - 3)]
                   END) AS shingles
        FROM words),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    inv AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS INTEGER) AS n_common
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT p.id_a, p.id_b, p.n_common,
           CAST(sa.n_sh + sb.n_sh - p.n_common AS INTEGER) AS n_union
    FROM pairs p
    JOIN sizes sa ON p.id_a = sa.doc_id
    JOIN sizes sb ON p.id_b = sb.doc_id
    WHERE p.n_common * 1.0 / (sa.n_sh + sb.n_sh - p.n_common) >= 0.8
"""


ORACLES: dict[str, str] = {
    "rollup_stats": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(l_quantity) AS DOUBLE) AS n_values,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_stats": """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(l_quantity) AS DOUBLE) AS n_values,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
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
    "kll_quantiles_events": """
        SELECT t.event_type, q.q, true AS rank_ok
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT UNNEST([0.1::DOUBLE, 0.5::DOUBLE,
                                   0.9::DOUBLE]) AS q) q
    """,
    "drift_scores": """
        SELECT event_type, 0.0::DOUBLE AS self_ks, true AS self_chi2_ok,
               true AS cross_ks_ok, true AS cross_chi2_ok
        FROM (SELECT DISTINCT event_type FROM events)
    """,
    "countmin_event_types": """
        SELECT event_type, COUNT(*) AS est_count
        FROM events GROUP BY event_type
    """,
    "hll_distinct_users": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               true AS hll_ok
        FROM events GROUP BY event_type
    """,
    "bloom_membership": """
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_probes,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_hits,
               true AS fp_ok
        FROM events
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
               CAST(SUM(CASE WHEN LENGTH(t) = 0 THEN 0
                   ELSE LENGTH(t) - LENGTH(REPLACE(t, ' ', '')) + 1
                   END) AS BIGINT) AS total_tokens,
               CAST(SUM(LENGTH(t)) AS BIGINT) AS total_chars
        FROM norm GROUP BY lang
    """,
    "lang_id_agreement": _lang_id_oracle(),
    "minhash_pairs": _MINHASH_ORACLE,
    "simhash_neardup_pairs": """
        SELECT CAST(doc_id AS BIGINT) AS id_a,
               CAST(doc_id + 1000000 AS BIGINT) AS id_b,
               0 AS hamming
        FROM documents WHERE doc_id % 10 = 0
    """,
    "minhash_dedup_cluster": """
        SELECT CAST(1000000 + i AS BIGINT) AS doc_id,
               CAST(1000000 AS BIGINT) AS rep_id,
               (i = 0) AS is_keeper,
               CAST(1997 AS BIGINT) AS n_cand_edges
        FROM range(1000) t(i)
    """,
    "minhash_dedup_unverified": """
        SELECT CAST(3000000 + i AS BIGINT) AS doc_id,
               CAST(3000000 AS BIGINT) AS rep_id,
               (i = 0) AS is_keeper
        FROM range(800) t(i)
    """,
    "simhash_dedup_cluster": """
        SELECT CAST(2000000 + i AS BIGINT) AS doc_id,
               CAST(2000000 AS BIGINT) AS rep_id,
               (i = 0) AS is_keeper
        FROM range(600) t(i)
    """,
    "embedding_dedup_cluster": """
        SELECT CAST(2000000 + i AS BIGINT) AS vec_id,
               CAST(0 AS BIGINT) AS rep_id,
               false AS is_keeper
        FROM range(300) t(i)
    """,
    "embedding_neardup_pairs": """
        WITH base AS (
            SELECT vec_id,
                   [CAST(embedding[i] AS DOUBLE)
                    FOR i IN range(1, len(embedding) + 1)] AS v
            FROM embeddings),
        twins AS (
            SELECT vec_id + 1000000 AS tid,
                   [v[i] * (1 + ((vec_id + 31 * (i - 1)) % 7) / 1000.0)
                    FOR i IN range(1, len(v) + 1)] AS tv
            FROM base WHERE vec_id % 10 = 0),
        allv AS (
            SELECT vec_id, v FROM base
            UNION ALL SELECT tid AS vec_id, tv AS v FROM twins)
        SELECT CAST(a.vec_id AS BIGINT) AS id_a,
               CAST(b.vec_id AS BIGINT) AS id_b
        FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.95
    """,
    "ivf_recall": """
        SELECT CAST(vec_id AS BIGINT) AS query_id, true AS found_neighbor
        FROM embeddings WHERE vec_id < 16
    """,
    "event_gaps_window": """
        WITH g AS (
            SELECT event_type,
                   epoch(ts) - lag(epoch(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap
            FROM events),
        n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps
              FROM g WHERE gap IS NOT NULL GROUP BY event_type)
        SELECT event_type, q.q, true AS rank_ok, n_gaps
        FROM n CROSS JOIN
             (SELECT UNNEST([0.5::DOUBLE, 0.95::DOUBLE]) AS q) q
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
    "digest_quantiles_by_type": """
        SELECT t.event_type, q.q, true AS rank_ok
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT UNNEST([0.01::DOUBLE, 0.5::DOUBLE, 0.99::DOUBLE,
                                   0.999::DOUBLE]) AS q) q
    """,
    "digest_global_lineitem": """
        SELECT q.q, true AS rank_ok,
               (SELECT CAST(COUNT(l_extendedprice) AS BIGINT)
                FROM lineitem) AS n_rows
        FROM (SELECT UNNEST([0.5::DOUBLE, 0.95::DOUBLE,
                             0.999::DOUBLE]) AS q) q
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
    "digest_orders_by_region": """
        SELECT r_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               true AS rank_ok
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    # reproduces operators/text.py quality_score/char_stats/token_count
    # over the same constructed variant text, with identical IEEE op
    # order for the score arithmetic
    "doc_quality_scores": r"""
        WITH v AS (
            SELECT doc_id,
                   substr(text, 1, 8 + CAST(doc_id % 25 AS INT))
                   || repeat('!', CAST(doc_id % 5 AS INT))
                   || repeat('3', CAST(doc_id % 4 AS INT)) AS t
            FROM documents WHERE doc_id < 25),
        c AS (
            SELECT doc_id, t,
                   LENGTH(t) AS n_chars,
                   CASE WHEN LENGTH(TRIM(t)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(TRIM(t), '\s+'))
                   END AS n_words,
                   LENGTH(regexp_replace(t, '[^[:punct:]]', '', 'g'))
                       AS n_punct,
                   LENGTH(regexp_replace(t, '[^0-9]', '', 'g')) AS n_digit
            FROM v),
        s AS (
            SELECT doc_id, n_chars, n_words, n_punct, n_digit,
                   CAST(GREATEST(n_chars, 1) AS DOUBLE) AS n,
                   CAST(GREATEST(n_words, 1) AS DOUBLE) AS nw
            FROM c),
        comp AS (
            SELECT doc_id, n_chars, n_words, n_punct, n_digit,
                   CASE WHEN n_chars < 16 THEN 0.2
                        WHEN n_chars > 100000 THEN 0.3
                        ELSE 1.0 END AS len_score,
                   CASE WHEN n / nw >= 3 AND n / nw <= 12
                        THEN 1.0 ELSE 0.5 END AS word_score,
                   1.0 - LEAST(n_punct / n * 4, 1.0) AS punct_score,
                   1.0 - LEAST(n_digit / n * 2, 1.0) AS digit_score
            FROM s)
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_punct AS BIGINT) AS n_punct,
               CAST(n_digit AS BIGINT) AS n_digit,
               0.3 * len_score + 0.2 * word_score
                   + 0.3 * punct_score + 0.2 * digit_score AS quality
        FROM comp
    """,
    # reproduces multimodal.py media_from_documents + frame_sample:
    # videos are doc_id % 3 == 2, duration 1000 + (doc_id*37) % 9000,
    # frames every 500 ms capped at 8 (inclusive sequence = inclusive
    # generate_series)
    "media_frame_plan": """
        WITH f AS (
            SELECT doc_id AS media_id,
                   UNNEST(generate_series(
                       0,
                       LEAST(1000 + (doc_id * 37) % 9000 - 1, 3500),
                       500)) AS ts
            FROM documents WHERE doc_id < 60 AND doc_id % 3 = 2)
        SELECT media_id, CAST(ts AS BIGINT) AS frame_ts_ms,
               CAST(256 AS BIGINT) AS width, CAST(256 AS BIGINT) AS height
        FROM f
    """,
    # reproduces multimodal.py indexed_fake_decoder from the same
    # payload probes (UTF-8 byte length, first byte, last byte) with
    # pure integer arithmetic — the corpus is ASCII so ascii() equals
    # the byte value
    "media_feature_probe": """
        WITH m AS (
            SELECT doc_id AS media_id,
                   CASE CAST(doc_id % 3 AS INT)
                        WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   octet_length(encode(text)) AS nb,
                   ascii(substr(text, 1, 1)) AS fb,
                   ascii(substr(text, LENGTH(text), 1)) AS lb
            FROM documents WHERE doc_id < 20),
        s AS (SELECT media_id, modality, nb,
                     (nb * 131 + fb * 31 + lb) % 100003 AS sv
              FROM m)
        SELECT media_id, modality, CAST(nb AS BIGINT) AS n_bytes,
               CAST((sv * 2654435761 + 0 * 40503) % 1000 AS BIGINT)
                   AS code0,
               CAST((sv * 2654435761 + 63 * 40503) % 1000 AS BIGINT)
                   AS code63
        FROM s
    """,
    # images: fake-resize payload size is max(16, (64*64)//128) = 32
    # bytes, width/height overwritten; non-images pass through
    # byte-identical (n_bytes = original octet length)
    "media_resize_probe": """
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 32
                         ELSE octet_length(encode(text)) END AS BIGINT)
                   AS n_bytes,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 64
                         WHEN doc_id % 3 = 1 THEN NULL
                         ELSE 256 END AS BIGINT) AS width,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 64
                         WHEN doc_id % 3 = 1 THEN NULL
                         ELSE 256 END AS BIGINT) AS height
        FROM documents WHERE doc_id < 30
    """,
    # the streamed fold ends at the same digest a batch aggregate
    # builds (merge associativity); n<=delta makes the median exact
    "streaming_digest_smalln": """
        WITH ranked AS (
            SELECT n_regionkey, CAST(n_nationkey AS DOUBLE) AS nk,
                   ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_regionkey) AS cnt
            FROM nation)
        SELECT n_regionkey, nk AS median_nationkey,
               CAST(cnt AS BIGINT) AS n_rows
        FROM ranked WHERE rn = CAST(FLOOR(0.5 * cnt) AS BIGINT) + 1
    """,    "streaming_stateful_smalln": """
        WITH ranked AS (
            SELECT n_regionkey, CAST(n_nationkey AS DOUBLE) AS nk,
                   ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_regionkey) AS cnt
            FROM nation)
        SELECT n_regionkey, nk AS median_nationkey,
               CAST(cnt AS BIGINT) AS n_rows
        FROM ranked WHERE rn = CAST(FLOOR(0.5 * cnt) AS BIGINT) + 1
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
