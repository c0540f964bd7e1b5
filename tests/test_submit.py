"""spark-submit --py-files deployment smoke test (north-rule launch path).

Packages the library with scripts/package.py, copies the entrypoint to a
directory that does NOT contain the package (so imports can only resolve
from the --py-files zip), and runs the checkpointed ER pipeline end-to-end
under a real ``spark-submit`` — the exact launch shape a multi-executor
cluster uses, with only the master string differing.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package.py")],
        capture_output=True, text=True, check=True, cwd=ROOT,
    ).stdout.strip()
    assert zip_path.endswith("polyfuzz_spark.zip") and os.path.exists(zip_path)

    # the entrypoint prepends its parent's parent to sys.path; from
    # tmp_path that contributes nothing, so the zip is the only source
    script = tmp_path / "run_er_pipeline.py"
    shutil.copy(os.path.join(ROOT, "scripts", "run_er_pipeline.py"), script)
    run_dir = tmp_path / "run"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing from the repo leaks in
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", zip_path,
            str(script),
            "--synth-entities", "120",
            "--run-dir", str(run_dir),
            "--min-similarity", "0.6",
            "--link-min-similarity", "0.6",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary_lines = [
        line for line in proc.stdout.splitlines() if line.startswith("{")
    ]
    assert summary_lines, proc.stdout[-2000:]
    rows = json.loads(summary_lines[-1])
    assert set(rows) == {
        "ingest", "candidates", "scores", "matches", "clusters", "survivors"
    }
    assert all(n > 0 for n in rows.values()), rows
    for stage in rows:
        mf = json.loads((run_dir / f"{stage}.manifest.json").read_text())
        assert mf["complete"] and mf["rows"] == rows[stage]
