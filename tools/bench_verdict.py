"""THE scaling gate: one command, one combined PASS/FAIL record.

Runs N fresh measurement windows of the flagship job
(tools/bench_scaling.py: transcripts fused clustered-lag + t-digest)
and M of the dedup job (tools/bench_dedup.py: minhash keep/drop to
fixpoint) at the same level pair, interleaved round-robin so host
drift spreads across both jobs, then reads each harness's pooled
multi-window verdict (median pair efficiency over every window whose
compute-path fingerprint matches the CURRENT tree — windows from an
older kernel never vote) and writes BENCH/verdict.json with both
verdicts, their calibration context, and a single combined ``pass``.

This replaces hand-pooled history reading as the single source of
truth for the north rule (>=0.8 efficiency from N to 4N cores, the
sandbox stand-in for N vs 4N executors).  Each window is a fresh
invocation of the underlying harness (fresh JVMs per level, adjacent
alternating-order pairs, pure-CPU calibration adjacent to every
pair), so re-running this command after ANY kernel change rebuilds
the evidence from scratch.

Usage:
    python tools/bench_verdict.py [--levels 2,8]
        [--flagship-windows 4] [--dedup-windows 8] [--pairs 2]

Notes: do not edit repo .py files while this runs (child processes
re-import from disk); run it alone (no concurrent Spark/pytest).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

TOOLS = os.path.join(REPO, "tools")


def _run_window(script: str, levels: str, pairs: int,
                extra: list[str]) -> bool:
    """One fresh harness invocation (= one measurement window).
    Returns False on failure instead of raising — one bad window
    (e.g. a transient OOM) must not void the others' evidence."""
    cmd = [sys.executable, os.path.join(TOOLS, script),
           "--levels", levels, "--pairs", str(pairs)] + extra
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    ok = r.returncode == 0
    tail = (r.stdout if ok else r.stderr).strip().splitlines()[-1:]
    print(f"[{script} window {'ok' if ok else 'FAIL'} "
          f"{dt:.0f}s] {tail[0][:200] if tail else ''}", flush=True)
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=str, default="2,8")
    ap.add_argument("--flagship-windows", type=int, default=4)
    ap.add_argument("--dedup-windows", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=2,
                    help="level pairs per window")
    ap.add_argument("--flagship-convs", type=int, default=3_000_000)
    ap.add_argument("--dedup-docs", type=int, default=1_200_000)
    args = ap.parse_args()

    # interleave the two jobs round-robin so a throttled half-hour
    # hits both pools instead of concentrating in one
    queue: list[tuple[str, list[str]]] = []
    f, d = args.flagship_windows, args.dedup_windows
    while f > 0 or d > 0:
        if f > 0:
            queue.append(("bench_scaling.py",
                          ["--convs", str(args.flagship_convs)]))
            f -= 1
        if d > 0:
            queue.append(("bench_dedup.py",
                          ["--docs", str(args.dedup_docs)]))
            d -= 1
    windows_ok = {"bench_scaling.py": 0, "bench_dedup.py": 0}
    windows_fail = {"bench_scaling.py": 0, "bench_dedup.py": 0}
    for script, extra in queue:
        if _run_window(script, args.levels, args.pairs, extra):
            windows_ok[script] += 1
        else:
            windows_fail[script] += 1

    # each harness maintains its own fingerprint-pooled multi_run
    # verdict; this gate just reads and combines them
    with open(os.path.join(REPO, "BENCH", "scaling.json")) as fh:
        flagship = json.load(fh)
    with open(os.path.join(REPO, "BENCH", "dedup_scaling.json")) as fh:
        dedup = json.load(fh)

    def _part(v: dict, job: str) -> dict:
        mr = v["multi_run"]
        return {
            "job": v.get("job", job),
            "job_fp": mr["job_fp"],
            "levels": v.get("levels"),
            "windows": mr["windows"],
            "pairs": mr["pairs"],
            "pair_efficiencies": mr["pair_efficiencies"],
            "median_efficiency": mr["median_efficiency"],
            "median_cpu_ceiling": mr["median_cpu_ceiling"],
            "run_medians": mr["run_medians"],
            "target": v.get("target", 0.8),
            "pass": mr["median_efficiency"] >= v.get("target", 0.8),
        }

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        rev = "unknown"
    out = {
        "gate": "north-rule scaling verdict (flagship + dedup), "
                "fresh-window pooled by compute-path fingerprint",
        "code_rev": rev,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "levels": [int(x) for x in args.levels.split(",")],
        "windows_run_ok": windows_ok,
        "windows_run_failed": windows_fail,
        "flagship": _part(flagship, "flagship"),
        "dedup": _part(dedup, "dedup"),
    }
    out["pass"] = out["flagship"]["pass"] and out["dedup"]["pass"]
    with open(os.path.join(REPO, "BENCH", "verdict.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
