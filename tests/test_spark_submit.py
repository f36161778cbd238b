"""North-rule packaging gate: the pipeline runs under a REAL
`spark-submit --py-files resolve_spark.zip` from a clean working
directory (the zip — not the repo checkout — supplies the package),
and the submitted job passes the F1 + sha256 gates.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_pipeline(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "resolve_spark.zip"))
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
    assert "resolve_spark/plans/pipeline.py" in names
    assert not any("__pycache__" in n for n in names)

    # run from an empty cwd with a clean PYTHONPATH so the only way the
    # job can import resolve_spark is through --py-files
    job = tmp_path / "submit_pipeline.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_pipeline.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         str(job), "--records", "1500", "--evaluate",
         "--out", str(tmp_path / "clusters")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["records"] >= 1500
    assert out["f1"] >= 0.99, out
    assert out["blocking_recall"] >= 0.99, out
    assert out["sha256_rows_checked"] == out["records"]
    assert out["master"] == "local[4]"
    assert os.path.isdir(tmp_path / "clusters")
