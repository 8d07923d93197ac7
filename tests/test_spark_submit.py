"""The north rule's launch path: ``spark-submit --py-files pkg.zip
spark_submit_main.py <verb>`` must run the CLI against a cluster-manager-
chosen master. One real spark-submit subprocess (own JVM, ~40 s): the
package ships as a zip, the launcher imports it absolutely, and
session.get_spark detects the submit gateway instead of forcing
local[N] over the submitted --master."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "yadamu___yet_another_data_migration_utility_spark"


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_runs_cli_verbs(spark, tmp_path):
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(f"u{i}", f"v{i}") for i in range(8)], "url string, val string"
    ).write.parquet(src)

    zip_path = str(tmp_path / "pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for name in files:
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))

    lake = str(tmp_path / "lake")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PYSPARK", "SPARK_GRAFT"))}
    env["PYSPARK_PYTHON"] = sys.executable

    def submit(*verb_args) -> str:
        r = subprocess.run(
            [_spark_submit(), "--master", "local[2]",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_path,
             os.path.join(REPO, "spark_submit_main.py"), *verb_args],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout.strip().splitlines()[-1]

    out = json.loads(submit("copy", "--source", src, "--table-root", lake,
                            "--key", "url", "--buckets", "2"))
    assert out["copied_rows"] == 8
    desc = json.loads(submit("describe", "--table-root", lake))
    assert desc["version"] == 2 and desc["key"] == "url"
