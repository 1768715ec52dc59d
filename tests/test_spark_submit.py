"""Ship-path smoke: package --py-files zip, run jobs/run_pipeline.py via
spark-submit, kill-free resume semantics via a second invocation."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _run(out_dir: Path):
    cmd = [
        str(SPARK_SUBMIT),
        "--master",
        "local[4]",
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        str(REPO / "dist" / "georaster_spark.zip"),
        str(REPO / "jobs" / "run_pipeline.py"),
        "--sf-dir",
        "/root/testdata/sf0.001",
        "--out",
        str(out_dir),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_pyfiles_and_resume(tmp_path):
    sys.path.insert(0, str(REPO))
    from jobs.package_pyfiles import build

    z = build()
    assert z.exists() and z.stat().st_size > 10_000

    out = tmp_path / "job_out"
    r1 = _run(out)
    assert r1["rows_written"] > 0 and r1["processed_units"] > 0
    assert (out / "zone_pairs" / "_manifest").exists()
    assert (out / "input_snapshot" / "snapshots" / "CURRENT").exists()

    # rerun: everything already manifested -> nothing reprocessed
    r2 = _run(out)
    assert r2["processed_units"] == 0
    assert r2["skipped_units"] == r1["processed_units"]
    assert r2["snapshot"] == r1["snapshot"]
