"""Smoke test for the ``ray job submit`` driver (jobs/crawl_job.py).

The driver owns its own Ray session, so it runs as a subprocess (it must
not attach to the test session's Ray). It crawls the tiny sf0.001 world
and must print a one-line JSON summary with a positive fetched count.
"""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crawl_job_local_smoke(tmp_path):
    out = str(tmp_path / "job_out")
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "crawl_job.py"),
         "--local", "--no-resume", "--out", out,
         "--sf-dir", "/root/testdata/sf0.001"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["fetched"] > 0
    assert summary["rounds"] > 0
    assert os.path.isdir(out)
    shutil.rmtree(out, ignore_errors=True)
