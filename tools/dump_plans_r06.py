"""Dump .explain('formatted') for the queries round 6 touched, for the
plans/r06/ before/after evidence.  Run from any checkout:

    python tools/dump_plans_r06.py <outdir> <suffix>

Uses sf0.001 + tiny synthetic transcripts so building the dedup query
(whose construction runs the component jobs) stays cheap.  explain()
shows the AQE initial plan; exchange origins (REPARTITION_BY_COL vs
REPARTITION_BY_NUM) and node order are what the round-6 claims rest on.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

outdir, suffix = sys.argv[1], sys.argv[2]
os.makedirs(outdir, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from t_digest_spark.operators.aggregate import tdigest_aggregate  # noqa: E402
from t_digest_spark.operators.extract import (  # noqa: E402
    quantiles_of, trimmed_mean_of,
)
from t_digest_spark.session import build_session  # noqa: E402
from t_digest_spark.sources.tables import (  # noqa: E402
    latency_digests_clustered, load_table, synth_transcripts,
)

SF = "/root/testdata/sf0.001"

spark = build_session("local[4]", 4, app_name="plans-r06",
                      **{"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("wrote", name, flush=True)


events = load_table(spark, SF, "events")
q1 = tdigest_aggregate(events, "value", ["event_type"]).select(
    "event_type", quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"))
dump("q1_events_digest", q1)

li = load_table(spark, SF, "lineitem")
q2 = tdigest_aggregate(li, "l_extendedprice", tree=True).select(
    quantiles_of("digest", [0.01, 0.5, 0.99]).alias("qs"))
dump("q2_lineitem_global", q2)

tpath = "/tmp/tdigest_bench/plans_transcripts.parquet"
if not os.path.exists(os.path.join(tpath, "_SUCCESS")):
    synth_transcripts(spark, n_convs=2000, seed=42, partitions=4,
                      with_text=False).write.mode("overwrite").parquet(tpath)
t = spark.read.parquet(tpath)
q3 = latency_digests_clustered(t, ["role", "ts_hour"]).select(
    "role", "ts_hour", "rows",
    quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"))
dump("q3_transcripts", q3)

q4 = tdigest_aggregate(li, "l_extendedprice",
                       ["l_returnflag", "l_linestatus"]).select(
    "l_returnflag", "l_linestatus",
    quantiles_of("digest", [0.5, 0.95]).alias("qs"),
    trimmed_mean_of("digest", 0.05, 0.95).alias("tmean"))
dump("q4_lineitem_grouped", q4)

# dedup: the decision DataFrame of the unverified path (the scaling
# gate's exact configuration); building it runs the component jobs at
# sf0.001 scale (cheap) and the final plan shows the window stage
import __spark_entry__ as entrymod  # noqa: E402

dedup = entrymod.queries()["minhash_dedup_unverified"](spark, SF)
dump("minhash_dedup_unverified", dedup)

# the window stage itself runs inside lsh_components before its
# materializing count, so the decision DataFrame's plan above does not
# contain it; rebuild the same star-contraction pipeline the operator
# runs (dedup.py lsh_components window pass) to capture its plan
from pyspark.sql import Window  # noqa: E402

from t_digest_spark.operators.dedup import minhash_buckets  # noqa: E402

docs = load_table(spark, SF, "documents").select(
    F.col("doc_id").cast("long").alias("doc_id"), "text")
e_all = minhash_buckets(docs, "text", "doc_id", 5, 64, 16).select(
    F.col("doc_id").alias("__id"), F.col("__bucket").alias("__b"))
w = Window.partitionBy("__b")
import inspect  # noqa: E402

import t_digest_spark.operators.dedup as dmod  # noqa: E402

if "repartition(_shuffle_partitions" in inspect.getsource(
        dmod.lsh_components):  # current tree: pinned window exchange
    from t_digest_spark.operators.aggregate import _shuffle_partitions
    e_in = (e_all.where(F.col("__b").isNotNull())
            .repartition(_shuffle_partitions(e_all), "__b"))
else:  # round-start tree: implicit (AQE-coalescible) window exchange
    e_in = e_all
stars = (e_in
         .withColumn("__c", F.count(F.lit(1)).over(w))
         .withColumn("__bm", F.min("__id").over(w))
         .where(F.col("__c") > 1)
         .select("__id", F.col("__bm").alias("__b"))
         .dropDuplicates(["__id", "__b"]))
dump("minhash_dedup_window_stage", stars)

spark.stop()
