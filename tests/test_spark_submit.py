"""End-to-end spark-submit --py-files evidence (north_star: "Jobs run
via spark-submit --py-files").

Zips the t_digest_spark package, launches examples/quantile_job.py
through a REAL spark-submit in local mode with --py-files (the package
is shipped as the zip, NOT importable from cwd), and checks the result
quantiles against the exact oracle on the synthesized input.  This is
the deployment path a cluster uses, minus only the cluster manager.
"""

import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")


def test_daemon_probe_archive_vs_directory(tmp_path, monkeypatch):
    """_daemon_importable must treat a PYTHONPATH zip that ships the
    package as invisible (the --py-files shape: the worker daemon never
    sees it) while directory entries keep the preloading daemon."""
    from t_digest_spark import session as sess

    # build a shipping zip like the deployment does
    zip_path = str(tmp_path / "pkg.zip")
    pkg = os.path.join(REPO, "t_digest_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    sess._daemon_importable.cache_clear()
    try:
        # only the archive on PYTHONPATH, neutral cwd -> daemon CANNOT
        monkeypatch.setenv("PYTHONPATH", zip_path)
        monkeypatch.chdir(tmp_path)
        assert sess._daemon_importable() is False
        assert "spark.python.daemon.module" not in sess.recommended_confs()

        sess._daemon_importable.cache_clear()
        # repo DIRECTORY on PYTHONPATH -> daemon available
        monkeypatch.setenv("PYTHONPATH", REPO)
        assert sess._daemon_importable() is True
        assert sess.recommended_confs()[
            "spark.python.daemon.module"] == "t_digest_spark.daemon"
    finally:
        sess._daemon_importable.cache_clear()


def test_spark_submit_py_files(spark, workdir):
    # --- synthesize a tiny transcripts table with the session fixture
    from t_digest_spark.sources.tables import synth_transcripts

    inp = os.path.join(workdir, "in.parquet")
    synth_transcripts(spark, n_convs=300, seed=5, partitions=4,
                      with_text=True).write.parquet(inp)

    # --- zip the package exactly as the documented deployment does
    zip_path = os.path.join(workdir, "t_digest_spark.zip")
    pkg = os.path.join(REPO, "t_digest_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    out = os.path.join(workdir, "out.parquet")
    ckpt = os.path.join(workdir, "ckpt")
    env = dict(os.environ)
    # run from a NEUTRAL cwd so the package can only come from the zip
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "examples", "quantile_job.py"),
         "--input", inp, "--output", out, "--checkpoint", ckpt,
         "--value-col", "latency_s", "--group-cols", "role"],
        capture_output=True, text=True, env=env, cwd=workdir,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    # --- verify against the exact oracle computed with the session
    from t_digest_spark.sources.tables import turn_metrics
    from pyspark.sql import functions as F

    res = {r["role"]: r for r in spark.read.parquet(out).collect()}
    raw = (turn_metrics(spark.read.parquet(inp))
           .where(F.col("latency_s").isNotNull())
           .select("role", "latency_s").collect())
    by_role: dict = {}
    for r in raw:
        by_role.setdefault(r.role, []).append(r.latency_s)
    assert set(res) == set(by_role)
    for role, vals in by_role.items():
        vals = np.sort(np.asarray(vals))
        row = res[role]
        assert row.n_values == vals.size
        for q, est in zip([0.5, 0.9, 0.99, 0.999], row.quantiles):
            rank = np.searchsorted(vals, est, side="right") / vals.size
            assert abs(rank - q) <= 0.02 + 2.0 / vals.size, (role, q)
        assert row.digest_meta.n == float(vals.size)
        assert row.digest_meta["min"] == pytest.approx(vals[0])
        assert row.digest_meta["max"] == pytest.approx(vals[-1])
