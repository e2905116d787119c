"""The north_rule's deployment path, executed for real: package the module
as a zip, launch via ``spark-submit --py-files`` in a SUBPROCESS (imports
resolve from the zip, not the repo checkout), run the full demo pipeline,
and check the emitted counters."""

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


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    zpath = str(tmp_path / "navgraph_osm_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "navgraph_osm_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    out_csv = str(tmp_path / "graph_csv")
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }  # imports must come from --py-files, not the checkout
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zpath,
            os.path.join(REPO, "submit.py"),
            "--demo-grid", "8x8",
            out_csv,
            "--warehouse", str(tmp_path / "wh"),
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    counts = json.loads(proc.stdout.strip().splitlines()[-1])
    assert counts["expanded_edges"] > 0
    assert counts["edges_emitted"] > 0 and counts["nodes_kept"] > 0
    csv_files = [f for f in os.listdir(out_csv) if f.endswith(".csv")]
    assert csv_files, "export CSV missing"
    header = open(os.path.join(out_csv, csv_files[0])).readline()
    assert header.startswith("weight,geom,was_one_way")
