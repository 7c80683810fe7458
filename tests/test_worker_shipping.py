"""Worker-shipping regression gate.

The round driver loads ``__spark_entry__.py`` by FILE PATH from outside
the repo, so executor Python workers cannot import
``aws_etl_project2_fiap_spark`` (only the driver process gets the
``sys.path`` insert). Any worker-side closure that cloudpickle resolves
BY REFERENCE back into this package (i.e. it captures a module-level
function/class of the package) dies on the executor with
ModuleNotFoundError — invisible to the rest of the test suite, which
always runs with the repo importable.

This test reproduces the driver's exact loading mode in a subprocess:
cwd outside the repo, repo stripped from PYTHONPATH, module loaded by
path — and smokes every catalog query that runs a Python/Arrow worker
stage. It fails on the bug class that hit ``dedup_bloom_incremental``
and ``stream_price_alerts`` when first written (both captured
module-level helpers; both now use factory-built by-value closures).
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every catalog query whose plan contains a Python-worker stage
# (pandas_udf / applyInPandas / mapInPandas / mapInArrow / UDTF)
PYTHON_STAGE_QUERIES = [
    "stream_price_alerts",
    "similarity_pairs_lsh",
    "similarity_ivf_knn",
    "similarity_knn_quantized",
    "dedup_embedding_cosine",
    "dedup_semantic",  # k-means assign pandas_udf + per-cluster applyInPandas
    "text_rolling_chunks",
    "suite_corpus_ops",  # bloom build/probe + batch kNN scorer
    "suite_text",  # multimodal features decode + sentence UDTF
    "suite_window_frames",  # EWMA applyInPandas recurrence
    "similarity_ivfpq_knn",  # PQ encode + ADC mapInPandas stages
    "text_bpe_tokens",  # BPE encode mapInPandas
    "text_quality_model",  # classifier scoring mapInPandas
    "k_table_source_readback",  # custom DataSource read on executors
]

_DRIVER_SCRIPT = r"""
import importlib.util, sys
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry_path!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs = mod.queries()
failures = []
for name in {names!r}:
    try:
        qs[name](spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # noqa: BLE001 - report and continue
        failures.append((name, str(exc)[:400]))
for name, msg in failures:
    print(f"WORKER-SHIP FAIL {{name}}: {{msg}}")
print("WORKER-SHIP OK" if not failures else f"{{len(failures)}} failed")
sys.exit(1 if failures else 0)
"""


@pytest.mark.slow  # widest replay of the shipping gate; the narrow table_source variant stays default (r13)
def test_catalog_python_stages_run_without_repo_on_worker_path(tmp_path):
    env = dict(os.environ)
    # strip the repo from every import channel the workers could inherit
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    )
    script = _DRIVER_SCRIPT.format(
        entry_path=os.path.join(REPO, "__spark_entry__.py"),
        names=PYTHON_STAGE_QUERIES,
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # NOT the repo — the driver's loading mode
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        "catalog queries failed when the repo is not importable on "
        f"workers (the driver's invocation mode):\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert "WORKER-SHIP OK" in proc.stdout


_DATASOURCE_SCRIPT = r"""
import importlib.util, sys, shutil
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry_path!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, {repo!r})
from aws_etl_project2_fiap_spark.io import versioned as V
from aws_etl_project2_fiap_spark.streaming.table_source import (
    VersionedTableDataSource,
)
import pyspark.sql.functions as F
sys.path.remove({repo!r})
base = {base!r}
V.create_table(spark.range(0, 100).select(F.col("id")), base + "/t")
V.delete_from(spark, base + "/t", F.col("id") < 5, mode="dv")
spark.dataSource.register(VersionedTableDataSource)
n = spark.read.format("versioned_table").option("path", base + "/t").load().count()
assert n == 95, n
q = (spark.readStream.format("versioned_table").option("path", base + "/t")
     .load().writeStream.format("parquet").option("path", base + "/out")
     .option("checkpointLocation", base + "/ckpt")
     .trigger(availableNow=True).start())
q.awaitTermination(120)
m = spark.read.parquet(base + "/out").count()
assert m == 95, m
print("DATASOURCE-SHIP OK")
"""


def test_table_source_runs_without_repo_on_worker_path(tmp_path):
    """The registered DataSource class must ship BY VALUE: Spark
    unpickles it in python workers that cannot import this package
    (the factory-scoped class + stdlib-only methods contract in
    streaming/table_source.py). A module-level class here fails with
    ModuleNotFoundError — the regression this pins."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    )
    script = _DATASOURCE_SCRIPT.format(
        entry_path=os.path.join(REPO, "__spark_entry__.py"),
        repo=REPO,
        base=str(tmp_path / "ds"),
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"versioned_table DataSource failed in the driver's loading "
        f"mode:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    assert "DATASOURCE-SHIP OK" in proc.stdout
