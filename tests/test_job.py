"""`ray job submit` entrypoint smoke: the exact command line an operator
submits to a cluster must run standalone (fresh process, no inherited
PYTHONPATH — the job server ships a clean working dir), write the result
artifact, and append a metrics record per run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(args, timeout=300):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["RAY_ADDRESS"] = "local"
    proc = subprocess.run(
        [sys.executable, "-m", "citygml2objv2_ray.job", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


class TestJobEntrypoint:
    def test_query_job_writes_result_and_metrics(self, tmp_path):
        out = str(tmp_path / "job")
        rec = _submit(
            ["--pipeline", "q_bottomk_sample", "--sf-dir", "/root/testdata/sf0.001", "--out", out]
        )
        assert rec["pipeline"] == "q_bottomk_sample" and rec["rows"] == 100
        df = pd.read_parquet(rec["out"])
        assert len(df) == 100 and list(df.columns) == ["doc_id", "n_chars"]
        lines = open(os.path.join(out, "job_metrics.jsonl")).read().splitlines()
        assert len(lines) == 1 and json.loads(lines[0])["run_id"] == rec["run_id"]

    def test_unknown_pipeline_fails_with_listing(self, tmp_path):
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["RAY_ADDRESS"] = "local"
        proc = subprocess.run(
            [sys.executable, "-m", "citygml2objv2_ray.job",
             "--pipeline", "nope", "--out", str(tmp_path)],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode != 0
        assert "unknown pipeline" in proc.stderr
