"""Gating-tool behavior: check_oracles must fail loudly on filters
that match nothing (VERDICT r5 #3 — a typo'd query name used to run
zero queries and print ALL OK with exit 0)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_check_oracles_unknown_name_exits_nonzero():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"),
         "bogus_query_name"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r.returncode != 0
    assert "unknown query name" in r.stdout
    assert "ALL OK" not in r.stdout
