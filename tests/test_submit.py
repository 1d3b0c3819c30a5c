"""The north_rule launch path: spark-submit --py-files must run the
checkpointed extraction and resume cleanly (SURVEY.md §7 step 8).

Runs the REAL spark-submit binary in a subprocess against the packaged
zip, from a cwd outside the repo so the package can only be imported
from --py-files.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit binary not on PATH")
def test_spark_submit_pyfiles_run_and_resume():
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "package_pyfiles.py")],
        capture_output=True, text=True, check=True).stdout.strip()
    assert os.path.exists(zip_path)

    with tempfile.TemporaryDirectory() as tmp:
        job = os.path.join(tmp, "job.py")
        shutil.copy(os.path.join(REPO, "submit_job.py"), job)
        out_dir = os.path.join(tmp, "out")
        cmd = ["spark-submit", "--master", "local[4]",
               "--py-files", zip_path, job,
               "--generate", "300", "--output", out_dir,
               "--run-id", "t", "--partitions", "8"]

        first = subprocess.run(cmd, capture_output=True, text=True,
                               cwd=tmp, timeout=300)
        assert first.returncode == 0, first.stderr[-2000:]
        s1 = json.loads([ln for ln in first.stdout.splitlines()
                         if ln.startswith("{")][-1])
        assert s1["docs_processed"] == 300
        assert sorted(s1["bins_processed"]) == list(range(8))

        second = subprocess.run(cmd, capture_output=True, text=True,
                                cwd=tmp, timeout=300)
        assert second.returncode == 0, second.stderr[-2000:]
        s2 = json.loads([ln for ln in second.stdout.splitlines()
                         if ln.startswith("{")][-1])
        assert s2["bins_processed"] == []          # full resume skip
        assert sorted(s2["bins_done_prior"]) == list(range(8))
