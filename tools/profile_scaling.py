"""Per-stage attribution of the scaling job (north-rule evidence).

Runs the EXACT bench_scaling job once at a given core count with the
Spark event log enabled, then parses the log into a per-stage table:

  stage wall (submission -> completion), summed task executorRunTime,
  JVM GC time, scheduler delay, task launch fan-in, plus the DRIVER
  GAPS between stages (planning / collect / quantile extraction — the
  serial Amdahl term that caps scaling efficiency).

Usage:
  python tools/profile_scaling.py --cpus 2  [--convs 3000000] [--reps 1]
  python tools/profile_scaling.py --cpus 8 ...

Compare the two outputs: components whose absolute seconds DON'T
shrink ~4x from 2 -> 8 cores are the non-scaling fraction.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import SHUFFLE_PARTITIONS, materialize  # noqa: E402


def run_profiled(cpus: int, path: str, reps: int) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from t_digest_spark.operators.extract import quantiles_of
    from t_digest_spark.session import build_session
    from t_digest_spark.sources.tables import latency_digests_clustered

    evdir = f"/tmp/tdigest_eventlog_{cpus}_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    spark = build_session(
        f"local[{cpus}]", cpus, app_name=f"profile-{cpus}",
        **{"spark.driver.memory": "40g", "spark.ui.enabled": "false",
           "spark.sql.shuffle.partitions": str(SHUFFLE_PARTITIONS),
           "spark.sql.files.openCostInBytes": str(128 << 20),
           "spark.local.dir": "/dev/shm/spark-local",
           "spark.eventLog.enabled": "true",
           "spark.eventLog.compress": "false",
           "spark.eventLog.rolling.enabled": "false",
           "spark.eventLog.dir": f"file://{evdir}"})
    spark.sparkContext.setLogLevel("ERROR")

    def job():
        t = spark.read.parquet(path)
        agg = latency_digests_clustered(t, ["role", "ts_hour"])
        rows = agg.select(
            "role", "ts_hour", "rows",
            quantiles_of("digest", [0.5, 0.99, 0.999]).alias("qs"),
        ).collect()
        return sum(r["rows"] for r in rows)

    job()  # warmup
    marks = []
    for _ in range(reps):
        t0 = time.time()
        job()
        marks.append((t0, time.time()))
    spark.stop()
    time.sleep(1.0)
    logs = sorted(glob.glob(os.path.join(evdir, "*")),
                  key=os.path.getmtime)
    return parse_eventlog(logs[-1], marks, cpus)


def _event_lines(log_path: str):
    """Spark 4 writes rolling event-log DIRECTORIES
    (eventlog_v2_<app>/events_*); older layouts write one file."""
    if os.path.isdir(log_path):
        parts = sorted(p for p in glob.glob(os.path.join(log_path, "*"))
                       if os.path.basename(p).startswith("events"))
    else:
        parts = [log_path]
    for p in parts:
        with open(p) as f:
            yield from f


def parse_eventlog(log_path: str, marks: list, cpus: int) -> dict:
    stages = {}          # sid -> dict
    for line in _event_lines(log_path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split(" at ")[0],
                "tasks": si["Number of Tasks"],
                "submit": si.get("Submission Time"),
            }
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            s = stages.setdefault(si["Stage ID"], {})
            s["name"] = si["Stage Name"].split(" at ")[0]
            s["tasks"] = si["Number of Tasks"]
            s["submit"] = si.get("Submission Time")
            s["complete"] = si.get("Completion Time")
            # accumulated internal metrics (ms unless noted)
            acc = {a["Name"]: a.get("Value")
                   for a in si.get("Accumulables", [])}
            s["run_ms"] = acc.get("internal.metrics.executorRunTime", 0)
            s["gc_ms"] = acc.get("internal.metrics.jvmGCTime", 0)
            s["cpu_ms"] = (acc.get("internal.metrics.executorCpuTime", 0)
                           or 0) / 1e6
            s["deser_ms"] = acc.get(
                "internal.metrics.executorDeserializeTime", 0)
            s["result_ser_ms"] = acc.get(
                "internal.metrics.resultSerializationTime", 0)
            s["shuffle_write_ms"] = (acc.get(
                "internal.metrics.shuffle.write.writeTime", 0) or 0) / 1e6
            s["shuffle_fetch_ms"] = acc.get(
                "internal.metrics.shuffle.read.fetchWaitTime", 0)

    # keep only stages inside the measured (non-warmup) windows
    out_stages = []
    for sid in sorted(stages):
        s = stages[sid]
        if "complete" not in s or s.get("submit") is None:
            continue
        mid = (s["submit"] + s["complete"]) / 2 / 1000.0
        if not any(a <= mid <= b for a, b in marks):
            continue
        wall = (s["complete"] - s["submit"]) / 1000.0
        out_stages.append({
            "stage": sid, "name": s["name"], "tasks": s["tasks"],
            "wall_s": round(wall, 3),
            "task_run_s": round(s["run_ms"] / 1000.0, 3),
            "task_cpu_s": round(s["cpu_ms"] / 1000.0, 3),
            "gc_s": round(s["gc_ms"] / 1000.0, 3),
            "deser_s": round(s["deser_ms"] / 1000.0, 3),
            "shuffle_write_s": round(s["shuffle_write_ms"] / 1000.0, 3),
            "shuffle_fetch_s": round(s["shuffle_fetch_ms"] / 1000.0, 3),
            # occupancy: how busy the cores were during the stage
            "occupancy": round(s["run_ms"] / 1000.0 / (wall * cpus), 3)
            if wall > 0 else None,
        })
    job_wall = sum(b - a for a, b in marks)
    stage_wall = sum(s["wall_s"] for s in out_stages)
    return {
        "cpus": cpus,
        "reps": len(marks),
        "job_wall_s": round(job_wall, 3),
        "stage_wall_s": round(stage_wall, 3),
        "driver_gap_s": round(job_wall - stage_wall, 3),
        "stages": out_stages,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--convs", type=int, default=3_000_000)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    path = materialize(args.convs)
    print(json.dumps(run_profiled(args.cpus, path, args.reps), indent=2))


if __name__ == "__main__":
    main()
