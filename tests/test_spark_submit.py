"""The north rule's delivery mechanism, literally: the engine ships as a
``spark-submit --py-files`` zip and runs in a process whose sys.path never
sees the repo — driver AND executors import bliss_rs_spark from the shipped
artifact only (the cluster deployment path)."""

import json
import os
import shutil
import subprocess
import sys


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


JOB = """
import json
from pyspark.sql import SparkSession

spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
# imports resolve from the --py-files zip, not any local checkout
from bliss_rs_spark.corpus import documents_from_testdata
from bliss_rs_spark.operators.build_index import build_index_frames
from bliss_rs_spark.operators.bm25 import bm25_topk

docs = documents_from_testdata(spark, "/root/testdata/sf0.001")
idx = build_index_frames(docs)
rows = bm25_topk(spark, idx.postings, idx.term_stats, idx.avgdl,
                 "spark hash join", 5).collect()
print("SUBMIT_RESULT " + json.dumps(
    {"n_docs": idx.n_docs, "top": [int(r["doc_id"]) for r in rows]}))
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    from bliss_rs_spark.session import package_zip

    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", package_zip(),
            str(job),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = next(
        (ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_RESULT ")),
        None,
    )
    assert line, out.stdout[-2000:]
    res = json.loads(line.split(" ", 1)[1])
    assert res["n_docs"] == 500
    assert len(res["top"]) == 5
