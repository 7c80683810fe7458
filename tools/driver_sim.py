#!/usr/bin/env python
"""Out-of-repo driver simulation: the end-of-round correctness gate.

Reproduces the round driver's protocol over the ENTIRE catalog (the
driver itself hash-compares only the first 50 ``queries()`` entries):

- loads ``__spark_entry__.py`` by FILE PATH with the repo absent from
  ``sys.path``/cwd — the loading mode under which executor workers
  cannot import the package (the worker-shipping failure class);
- runs every ``queries()`` entry at the gate SF (default sf0.01);
- oracle-backed entries: DuckDB runs ``oracle_sql()`` and BOTH results
  go through the driver's pandas path (``toPandas()`` / ``rel.df()``)
  and a string canonicalization that deliberately distinguishes int64
  from float64 renderings (the HUGEINT red class) and crashes on
  non-atomic columns (the sort_values red class);
- rows-only entries: executed, row count recorded.

Usage: python tools/driver_sim.py [sf_dir]   (run from ANY directory;
the script re-execs itself from /tmp if started inside the repo).
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_args = [
    a for a in sys.argv[1:]
    if not a.startswith(("--skip=", "--only="))
]
# --skip=name,name: exclude entries from THIS replay (printed loudly).
# Exists for scale replays where a query's RESULT is huge — e.g.
# join_range_binned emits 60M match rows at sf0.1, and this tool's
# per-cell canonicalization (deliberately mirroring the driver's quirky
# pandas path) is O(rows) single-threaded Python. Skipping here never
# affects the real gate: the driver compares at sf0.01, where the same
# entry is hash-green.
# --only=name,name: run ONLY these entries — the in-round iteration
# loop for a single oracle conversion; never a gate (the gate is the
# full catalog).
SKIP = set()
ONLY = set()
for a in sys.argv[1:]:
    if a.startswith("--skip="):
        SKIP.update(x for x in a[len("--skip="):].split(",") if x)
    if a.startswith("--only="):
        ONLY.update(x for x in a[len("--only="):].split(",") if x)
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _cell(v):
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (np.floating, float)):
        return f"{round(float(v), 6):.6f}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    return repr(str(v))


def canon(pdf):
    pdf = pdf.rename(columns=str.lower)
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        tuple(_cell(v) for v in tup)
        for tup in pdf.itertuples(index=False, name=None)
    )


def main() -> int:
    if os.path.abspath(os.getcwd()).startswith(REPO):
        os.chdir("/tmp")
    sys.path[:] = [p for p in sys.path if os.path.abspath(p or ".") != REPO]

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # the JVM's 1g default survives sf0.01 (the driver's gate SF)
        # but OOM-kills mid-catalog at sf0.1 — size the heap so this
        # tool can also validate at bench scale
        .config("spark.driver.memory", os.environ.get(
            "DRIVER_SIM_MEM", "12g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    n_green = n_rows_only = n_bad = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name in SKIP:
            print(f"{name:32s} SKIPPED (--skip; verify at the gate SF)")
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            if name not in osql:
                n_rows_only += 1
                print(f"{name:32s} rows-only  {len(spdf)} rows")
                continue
            dpdf = con.sql(osql[name]).df()
            rows_ok = len(spdf) == len(dpdf)
            schema_ok = sorted(c.lower() for c in spdf.columns) == sorted(
                c.lower() for c in dpdf.columns
            )
            hash_ok = schema_ok and canon(spdf) == canon(dpdf)
            ok = rows_ok and schema_ok and hash_ok
            n_green += ok
            n_bad += not ok
            print(
                f"{name:32s} {'GREEN' if ok else 'RED':5s}  "
                f"rows={len(spdf)}/{len(dpdf)} schema={schema_ok} "
                f"hash={hash_ok}"
            )
        except Exception as exc:  # noqa: BLE001 — the driver records err rows
            n_bad += 1
            print(f"{name:32s} ERR    {type(exc).__name__}: {str(exc)[:160]}")
    print(
        f"\nTOTAL: {n_green} green, {n_rows_only} rows-only, {n_bad} bad "
        f"of {len(qs)} at {SF_DIR}"
    )
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
