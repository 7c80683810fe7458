#!/usr/bin/env python
"""Benchmark harness: runs the headline workload queries and prints the
result as a JSON line — {"metric", "value", "unit", "queries", "sf"}
plus "queries_steady"/"steady_total" (second-run timings). The core
line prints immediately after the headline loop AND again (with the
optional sf1 column merged in) as the final line, so a truncated
head/tail capture of the output still holds one parseable line; take
the LAST line for the fullest payload.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
parallelism from $SPARK_GRAFT_CPUS (default 32). Each query is executed
to completion (count() forces every exchange and the final projection)
TWICE: the first (cold) pass includes plan compilation and JIT, the
second (steady) pass is the per-query number a long-running cluster
would see. Totals for both are reported; "value" stays the cold total
for continuity with round-1 records.

The driver-generated sf dirs store each table as ONE parquet row group,
so a scan plans as a single task and the bench measures the scheduler
floor instead of compute. Unless $SPARK_GRAFT_RECHUNK=0, tables are
rewritten once into a /tmp cache at ≥32 row groups (same rows, same
schema — pyarrow preserves the TIMESTAMP(NANOS) events column) and the
bench reads that layout — the layout a real ingest (io/compact.py
write path) would produce anyway.

The headline set is chosen to cover every execution shape: scan+filter,
hash-agg, star join, window, as-of, sort/top-k, dedup (hash + LSH),
similarity, text analysis, sessionization — so a regression anywhere in
the engine shows up here.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_etl_project2_fiap_spark.session import build_session
from aws_etl_project2_fiap_spark.workload import CATALOG, COMPONENTS

DEFS = {**CATALOG, **COMPONENTS}

HEADLINE = [
    "a1_top5_7day_sum",
    "agg_pricing_summary",
    "agg_count_distinct",
    "join_star_revenue",
    "join_semi",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue",
    # round-6 additions: group-then-having-then-join (Q18) and
    # returned-items customer ranking (Q10) — shapes the set lacked
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    # round-6 additions: two-path snowflake (Q7) and the join-free
    # double-correlation rewrite (Q21) — the two heaviest of the seven
    # new TPC-H shapes
    "tpch_q7_nation_volume",
    "tpch_q21_waiting_supplier",
    "window_top3_per_cust",
    "window_lag_delta",
    "sessionize_30m",
    "session_window_native",
    "stream_stats_by_key",
    "asof_join_ticks",
    "event_time_tumbling_1h",
    "o1_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_langid",
    "text_quality",
    "corpus_select",
    "similarity_knn",
    "similarity_pairs_lsh",
    "similarity_ivf_knn",
    "multimodal_meta",
    # round-2 additions: batch retrieval + sub-document dedup shapes
    "similarity_batch_knn",
    "text_paragraph_dedup",
    # round-3 addition: arbitrary-stateful anchor ratchet (batch path)
    "stream_price_alerts",
    # round-4 additions: quality gate, semantic dedup, index probe
    "text_gopher_rules",
    "dedup_semantic",
    # round-5 split: the one-time index BUILD vs the per-delivery PROBE
    # (build runs first so the probe's timing measures only the probe —
    # the steady-state cost the operator exists to deliver)
    "dedup_index_build",
    "dedup_index_probe",
    # round-5 addition: corpus-wide exact duplicate-span removal
    "dedup_span_exact",
    # round-11 addition: bigram-LM perplexity scoring + bucketing
    "text_lm_perplexity",
]


# the queries timed against the tiled 10x dataset (module-level so the
# contract test can referentially check every name resolves — a rename
# must fail CI, not the driver's bench run at its last column)
SF1_SET = [
    "a1_top5_7day_sum", "join_star_revenue",
    "tpch_q5_regional_revenue", "dedup_exact", "window_top3_per_cust",
    "event_time_tumbling_1h",
    # LLM-pipeline representatives at 10x
    "dedup_minhash_lsh", "text_paragraph_dedup", "text_langid",
    # round-4 additions at 10x
    "text_gopher_rules", "text_chunk_overlap", "window_hopping_2h",
    "dedup_semantic",
    # round-5 addition at 10x (baseline records on first appearance)
    "dedup_span_exact",
    # round-6 additions at 10x (baseline records on first appearance)
    "tpch_q10_returned_items", "tpch_q18_large_orders",
    "tpch_q7_nation_volume", "tpch_q21_waiting_supplier",
    # round-9 additions at 10x: the 100 TB ingest loop's two halves —
    # one-time corpus summarization vs per-delivery probe (build runs
    # first so the probe measures only the probe, same split as the
    # sf0.1 headline)
    "dedup_index_build", "dedup_index_probe",
    # round-11 addition at 10x: LM perplexity scoring (baseline records
    # on first appearance)
    "text_lm_perplexity",
]


# sf1 (tiled, 10x data) steady-state baseline, recorded round 4 — the
# per-query 2x gate applies to these exactly as the round-1 recording
# gates sf0.1 (BASELINE.md "sf1 baseline"). Queries added to the sf1
# set later record their baseline on first appearance.
SF1_BASELINE = {
    "a1_top5_7day_sum": 0.688,
    "join_star_revenue": 1.551,
    "tpch_q5_regional_revenue": 1.089,
    "dedup_exact": 0.284,
    "window_top3_per_cust": 0.498,
    # re-recorded round 9 (BASELINE.md "sf1 event-time re-recording"):
    # query shapes changed (format-after-agg / explode-ts hop) AND the
    # tiled artifact was rebuilt from regenerated testdata (source
    # fingerprint efdc6ed1a7912f80, now carried in every payload) —
    # the round-4 numbers (0.365 / 0.375) are not comparable to either
    "event_time_tumbling_1h": 0.467,
    "dedup_minhash_lsh": 3.191,
    "text_paragraph_dedup": 0.566,
    "text_langid": 0.291,
    "text_gopher_rules": 0.275,
    "text_chunk_overlap": 0.927,
    "window_hopping_2h": 0.440,
    "dedup_semantic": 2.051,
    # first-appearance recordings, round 6 (idle machine, warm tiled
    # cache, sentinel 0.091 — BASELINE.md "load adjudication"):
    "dedup_span_exact": 0.374,
    "tpch_q10_returned_items": 0.955,
    "tpch_q18_large_orders": 1.600,
    "tpch_q7_nation_volume": 1.845,
    "tpch_q21_waiting_supplier": 2.142,
    # first-appearance recordings, round 9 (idle machine, sentinels
    # 0.089-0.165, fingerprint efdc6ed1a7912f80): the ingest loop's
    # two halves at 10x corpus, pinned from the IN-BENCH context (the
    # sf1 column runs after 37 headline queries + lakehouse verbs —
    # session heap state costs the fresh-build ~35% vs a light
    # session's 5.11 s; the gate compares in-bench runs, so the
    # baseline must too). Scaling story (light-session pair): build
    # 1.38 s sf0.1 -> 5.11 s sf1 (~linear, one-time by design); probe
    # 0.65 -> 0.81 (1.24x at 10x corpus — delivery-bound, the
    # broadcast-probe design's whole claim)
    "dedup_index_build": 7.015,
    "dedup_index_probe": 0.901,
    # first-appearance recording, round 11 (idle machine, sentinels
    # 0.061-0.147, fingerprint efdc6ed1a7912f80, in-bench context):
    # LM perplexity train+calibrate+score — 1.63 s sf0.1 -> 3.09 s
    # sf1, 1.9x at 10x docs (training/calibration are fixed-size;
    # only the corpus scoring pass scales)
    "text_lm_perplexity": 3.086,
}


# Lakehouse write-path baselines at sf0.1 (recorded round 7, idle
# machine — BASELINE.md "lakehouse verbs"). Mutations are timed ONCE
# (they change state; a warm re-run would measure different work), so
# the gate is 3x rather than the query columns' 2x to absorb one-shot
# scheduler noise. A verb over 3x its baseline is named in
# payload["lakehouse_gate_violations"].
LAKEHOUSE_BASELINE = {
    "merge_fragmented": 4.258,
    "update_cow": 1.473,
    "delete_dv": 2.614,
    "read_with_dvs": 0.761,
    "read_pre_dv": 0.294,
    "overwrite_month": 0.881,
    "matview_create": 2.332,
    "matview_refresh_incremental": 2.667,
    "matview_full_recompute": 1.649,
    # recorded round 8 (first measurement of the verb): one pruned fact
    # pass folding a ~1/37-key dim mutation into the star view, fact
    # carrying DVs from delete_dv above
    "matview_evolve_dims": 4.793,
    "wap_publish": 0.008,
}


def _lakehouse_verbs(spark, sf_dir: str) -> dict[str, float]:
    """Time the WRITE path (VERDICT r6 #4): merge on a fragmented
    table, CoW update, DV delete + the DV read tax, dynamic partition
    overwrite, matview incremental refresh vs full recompute, WAP
    publish. Queries-only benches leave a mutation-path regression
    invisible until a correctness replay times out; this column gates
    it like any query. All state lives in a /tmp scratch dir built from
    the bench's orders table and removed afterward."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import matview as MV
    from aws_etl_project2_fiap_spark.io import versioned as V
    from aws_etl_project2_fiap_spark.io import wap as WAP

    work = tempfile.mkdtemp(prefix="spark_graft_lakeverbs_")
    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        return out

    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ).withColumn(
            "om", F.date_format("o_orderdate", "yyyy-MM")
        ).localCheckpoint(eager=True)

        # --- fragmented table: 16 base files + 3 appended batches ----
        tbl = f"{work}/orders"
        V.create_table(
            o.filter(F.col("o_orderkey") % 4 != 0).repartition(16), tbl
        )
        for i in range(3):
            V.append_table(
                o.filter(
                    (F.col("o_orderkey") % 4 == 0)
                    & (F.col("o_orderkey") % 3 == i)
                ).repartition(4),
                tbl,
            )
        delivery = o.filter(F.col("o_orderkey") % 199 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        timed("merge_fragmented", lambda: V.merge_table(
            spark, tbl, delivery, ["o_orderkey"],
            when_matched="replace", insert_unmatched=False,
        ))
        timed("update_cow", lambda: V.update_table(
            spark, tbl, {"o_totalprice": F.col("o_totalprice") + 1.0},
            F.col("o_orderkey") % 23 == 0,
        ))
        pre_dv = V.current_version(tbl)
        timed("delete_dv", lambda: V.delete_from(
            spark, tbl, F.col("o_orderkey") % 17 == 0, mode="dv"
        ))
        timed("read_with_dvs", lambda: V.read_table(spark, tbl).count())
        timed("read_pre_dv", lambda: V.read_table(
            spark, tbl, version=pre_dv
        ).count())

        # --- dynamic partition overwrite (month-clustered layout) ----
        ptbl = f"{work}/orders_bymonth"
        V.create_table(o, ptbl, cluster_by=["om"], num_files=24)
        months = [r["om"] for r in o.select("om").distinct().collect()]
        month = sorted(months)[len(months) // 2]
        reload_df = o.filter(F.col("om") == month).withColumn(
            "o_totalprice", F.col("o_totalprice") + 0.5
        )
        timed("overwrite_month", lambda: V.overwrite_partitions(
            spark, reload_df, ptbl, "om"
        ))

        # --- matview: incremental refresh vs full recompute ----------
        view = f"{work}/view"
        timed("matview_create", lambda: MV.create_aggregate_view(
            spark, tbl, view, ["o_orderpriority"],
            {"n": ("count", None), "total": ("sum", "o_totalprice")},
        ))
        V.append_table(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority", "om",
            ),
            tbl,
        )
        timed(
            "matview_refresh_incremental",
            lambda: MV.refresh_aggregate_view(spark, view),
        )
        timed(
            "matview_full_recompute",
            lambda: MV.full_refresh_aggregate_view(spark, view),
        )

        # --- matview dim evolution (VERDICT r7 #4): one pruned fact
        # pass folds a dimension mutation into a star-schema view -----
        dimt = f"{work}/dim_cust"
        V.create_table(
            o.select("o_custkey").distinct().withColumn(
                "cohort", (F.col("o_custkey") % 50).cast("string")
            ),
            dimt,
        )
        sview = f"{work}/view_star"
        MV.create_aggregate_view(
            spark, tbl, sview, ["cohort"],
            {"n": ("count", None), "total": ("sum", "o_totalprice")},
            dims=[{"path": dimt, "keys": ["o_custkey"]}],
        )
        V.update_table(
            spark, dimt, {"cohort": F.lit("moved")},
            F.col("o_custkey") % 37 == 0,
        )
        timed(
            "matview_evolve_dims",
            lambda: MV.evolve_dimensions(spark, sview),
        )

        # --- WAP publish ---------------------------------------------
        stg = f"{work}/stage"
        WAP.begin_stage(spark, tbl, stg)
        V.append_table(
            o.filter(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 200_000_000).alias("o_orderkey"),
                "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority", "om",
            ),
            stg,
        )
        V.delete_from(
            spark, stg, F.col("o_orderkey") % 29 == 0, mode="dv"
        )
        timed("wap_publish", lambda: WAP.publish_stage(spark, tbl, stg))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return times


def _rechunked(sf_dir: str, min_groups: int = 32) -> str:
    """One-time /tmp copy of the sf dir with ≥min_groups row groups per
    table so scans parallelize across the local[N] slots.

    The cache is validated against each source file's (size, mtime): if
    the driver regenerates the testdata between rounds (it has — events
    switched from TIMESTAMP(NANOS) to MICROS), stale copies are rebuilt
    instead of silently benchmarking old data."""
    import json as _json

    import pyarrow.parquet as pq

    out = f"/tmp/spark_graft_rechunk_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(out, exist_ok=True)
    manifest_path = os.path.join(out, "_manifest.json")
    try:
        with open(manifest_path) as fh:
            manifest = _json.load(fh)
    except (OSError, ValueError):
        manifest = {}
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, fname)
        st_ = os.stat(src)
        stamp = [st_.st_size, st_.st_mtime]
        dst = os.path.join(out, fname)
        if os.path.exists(dst) and manifest.get(fname) == stamp:
            continue
        tbl = pq.read_table(src)
        pq.write_table(
            tbl,
            dst,
            row_group_size=max(1, math.ceil(len(tbl) / min_groups)),
        )
        manifest[fname] = stamp
        with open(manifest_path, "w") as fh:
            _json.dump(manifest, fh)
    return out


def _sf1_source_fingerprint(src: str = "/root/testdata/sf0.1") -> str:
    """Fingerprint of the tiling SOURCE (name, size, mtime of every
    parquet): recorded in the payload so cross-round sf1 deltas are
    adjudicable — a moved number with a moved fingerprint is a data
    regeneration (the round-5 comparability caveat), with a stable
    fingerprint it's a real regression. Also the staleness key for the
    tiled cache: a regenerated source rebuilds the tiles instead of
    silently benchmarking stale data (same policy as _rechunked)."""
    import hashlib

    h = hashlib.sha256()
    for fname in sorted(os.listdir(src)):
        if fname.endswith(".parquet"):
            st = os.stat(os.path.join(src, fname))
            h.update(f"{fname}:{st.st_size}:{st.st_mtime}".encode())
    return h.hexdigest()[:16]


# every table the sf1 queries read must exist in the tiled dir — the
# cache is valid only when ALL of them are present (a partial dir, e.g.
# after a /tmp cleaner or an interrupted build, must rebuild, not crash
# the sf1 column mid-loop)
_SF1_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _tiled_complete(tiled: str) -> bool:
    return all(
        os.path.exists(os.path.join(tiled, f"{t}.parquet"))
        for t in _SF1_TABLES
    )


def _run_tiler() -> None:
    """The real sf1 tile build: tools/tile_sf.py as a subprocess
    (deterministic, ~2 min, writes /tmp/spark_graft_tiled_sf1).
    Isolated so tests can inject a stub builder instead of mutating
    /tmp from a unit test (ADVICE r9)."""
    import subprocess

    subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tools", "tile_sf.py",
            ),
        ],
        check=True, capture_output=True, text=True,
    )


def _ensure_tiled_sf1(tiled: str, payload: dict, build=None) -> bool:
    """Make the sf1 gate un-skippable (VERDICT r8 #1): when the tiled
    10x dir is absent or was built from a DIFFERENT source (fingerprint
    sidecar mismatch), BUILD it with tools/tile_sf.py (deterministic,
    ~2 min) instead of silently dropping the only 2x-gated scale.
    Every outcome is loud in the payload: ``sf1_built`` when a build
    ran, ``sf1_source_fingerprint`` always on success, ``sf1_skipped``
    with the reason on failure. Returns True when the sf1 column can
    run. ``build`` is injectable for tests (default: the real tiler
    subprocess)."""
    import subprocess

    try:
        fp = _sf1_source_fingerprint()
    except OSError as exc:
        payload["sf1_skipped"] = f"sf1 source dir unreadable: {exc}"
        return False
    fp_path = os.path.join(tiled, "_source_fingerprint.json")
    have = None
    try:
        with open(fp_path) as fh:
            have = json.load(fh).get("fingerprint")
    except (OSError, ValueError):
        pass
    if have != fp or not _tiled_complete(tiled):
        try:
            (build or _run_tiler)()
            # the fingerprint stamps only a VERIFIED-complete build —
            # a tiler that exits 0 without producing every table must
            # not mint a valid-looking cache
            if not _tiled_complete(tiled):
                missing = [
                    t for t in _SF1_TABLES
                    if not os.path.exists(
                        os.path.join(tiled, f"{t}.parquet")
                    )
                ]
                payload["sf1_skipped"] = (
                    f"tiled sf1 build incomplete: missing {missing}"
                )
                return False
            with open(fp_path, "w") as fh:
                json.dump(
                    {"fingerprint": fp, "src": "/root/testdata/sf0.1"},
                    fh,
                )
            payload["sf1_built"] = True
        except (subprocess.CalledProcessError, OSError) as exc:
            detail = getattr(exc, "stderr", "") or str(exc)
            payload["sf1_skipped"] = (
                f"tiled sf1 build failed: {detail}"[:300]
            )
            return False
    payload["sf1_source_fingerprint"] = fp
    return True


def _sentinel(spark) -> float:
    """Fixed CPU-bound probe (spark.range aggregate — no IO, no Python
    workers): timed alongside each bench column so co-tenant machine
    load is SELF-IDENTIFYING in the artifact. The probe's work never
    changes, so across rounds its time moves only with machine load; a
    run whose queries AND sentinel inflate by the same factor is a
    loaded capture, not a regression (BASELINE.md "load adjudication").
    Best of two, same policy as the steady column."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).select(
            F.sum(F.col("id") * 2 + 1)
        ).collect()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def _emit(payload: dict) -> None:
    """Print the payload line AND persist it to /tmp/bench_out.json:
    the driver's fixed-size output capture truncated the final line in
    two past rounds — the file survives any capture window. Compact
    separators (r13, VERDICT r12 #6): every byte of the line competes
    for the capture's tail window, and the separators alone were ~12%
    of it. The full payload (r13 final line ≈3.1 KB) stays well under
    the 8 KB bound."""
    line = json.dumps(payload, separators=(",", ":"))
    print(line, flush=True)
    try:
        with open("/tmp/bench_out.json", "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    rechunk = os.environ.get("SPARK_GRAFT_RECHUNK", "1") != "0"
    if rechunk:
        sf_dir = _rechunked(sf_dir)
    spark = build_session(app_name="bench")

    # warm the JVM, parquet footers, and Python/Arrow UDF workers once so
    # per-query numbers measure the queries, not session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    warm_udf = pandas_udf(lambda s: s, "long")
    # 32 partitions → every Python worker process forks + Arrow-inits now,
    # not inside the first UDF query's timing
    spark.range(0, 32_000, 1, 32).select(warm_udf(F.col("id"))).count()
    # applyInPandas uses a separate grouped-runner init path — warm it too
    spark.range(0, 3200, 1, 32).withColumn("g", F.col("id") % 32).groupBy(
        "g"
    ).applyInPandas(lambda pdf: pdf, "id long, g long").count()

    sentinel = {"before_cold": _sentinel(spark)}
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in HEADLINE:
        fn = DEFS[name].spark
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        # steady = best of two warm runs: a single warm run still eats
        # occasional multi-second GC/scheduler blips on local mode
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        steady[name] = round(min(runs), 3)
    sentinel["after_steady"] = _sentinel(spark)

    payload = {
        "metric": "headline_workload_total",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "queries_steady": steady,
        "steady_total": round(sum(steady.values()), 3),
        "rechunked": rechunk,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "sentinel": sentinel,
        "payload_file": "/tmp/bench_out.json",
    }
    # emit the core line EARLY (before the optional sf1 column doubles
    # the output): a fixed-size head/tail capture of this process's
    # output then always contains at least one complete, parseable
    # JSON line — the round-4 artifact stored a mid-JSON truncation
    _emit(payload)

    # lakehouse write-path column (VERDICT r6 #4): timed mutations over
    # a scratch versioned table; SPARK_GRAFT_LAKEHOUSE=0 skips
    if os.environ.get("SPARK_GRAFT_LAKEHOUSE", "1") != "0":
        lake = _lakehouse_verbs(spark, sf_dir)
        sentinel["after_lakehouse"] = _sentinel(spark)
        payload["lakehouse_verbs"] = lake
        payload["lakehouse_total"] = round(sum(lake.values()), 3)
        # 0.5 s floor: metadata-only verbs (wap_publish 8 ms) would
        # otherwise flag on a single GC blip
        payload["lakehouse_gate_violations"] = {
            name: {"sec": lake[name], "baseline": LAKEHOUSE_BASELINE[name]}
            for name in lake
            if name in LAKEHOUSE_BASELINE
            and lake[name] > max(3.0 * LAKEHOUSE_BASELINE[name], 0.5)
        }
        # no emit here (r13): the early emit above already guarantees
        # one parseable line in any truncated capture, and every extra
        # line pushes the FINAL line's head out of a tail-limited
        # window — the exact failure mode that voided the r11→r12
        # comparison. A crash between here and the final emit loses
        # only the lakehouse column, which /tmp/bench_out.json retains.

    # sf1 scale column (VERDICT r2 #5, made un-skippable r9): the
    # per-query 2x gate is pinned at THIS scale, so a default run must
    # carry it — the tiled dir is BUILT when absent or stale
    # (fingerprint-validated against the source), and any skip is an
    # explicit payload marker, never a silent omission.
    # SPARK_GRAFT_SF1_BENCH=0 opts out (recorded as skipped).
    tiled = "/tmp/spark_graft_tiled_sf1"
    if os.environ.get("SPARK_GRAFT_SF1_BENCH", "1") == "0":
        payload["sf1_skipped"] = "disabled by SPARK_GRAFT_SF1_BENCH=0"
        run_sf1 = False
    else:
        run_sf1 = _ensure_tiled_sf1(tiled, payload)
    if run_sf1:
        try:
            sf1_steady: dict[str, float] = {}
            for name in SF1_SET:
                fn = DEFS[name].spark
                fn(spark, tiled).count()  # warm
                # best of two, same as the sf0.1 steady column: a
                # single sample at sub-second scale flags scheduler/GC
                # blips (and any co-tenant load) as gate violations
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, tiled).count()
                    runs.append(time.perf_counter() - t0)
                sf1_steady[name] = round(min(runs), 3)
            sentinel["after_sf1"] = _sentinel(spark)
            payload["sf1_queries_steady"] = sf1_steady
            payload["sf1_steady_total"] = round(
                sum(sf1_steady.values()), 3
            )
            # per-query 2x regression gate at sf1 (BASELINE.md "sf1
            # baseline"); any query over 2x its baseline is named in
            # the payload so regressions at 10x data are as visible as
            # the sf0.1 gate
            payload["sf1_gate_violations"] = {
                name: {
                    "sec": sf1_steady[name],
                    "baseline": SF1_BASELINE[name],
                }
                for name in sf1_steady
                if name in SF1_BASELINE
                and sf1_steady[name] > 2.0 * SF1_BASELINE[name]
            }
        except Exception as exc:  # the payload is NEVER silent on sf1
            payload.pop("sf1_queries_steady", None)
            payload.pop("sf1_steady_total", None)
            payload.pop("sf1_gate_violations", None)
            payload["sf1_skipped"] = (
                f"sf1 column crashed mid-run: {exc}"[:300]
            )

    _emit(payload)
    spark.stop()


if __name__ == "__main__":
    main()
