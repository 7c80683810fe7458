"""SparkSession factory tuned for the engine.

The reference delegates tuning to Glue (``etlAutoTuning: true``,
``flexExecution: true`` — ETL_glue_pregao_B3.json:31,36 in the reference);
the Spark-native equivalent is AQE plus sensible shuffle/Arrow defaults,
set once here so every entry point (batch pipelines, streaming, tests,
bench) shares the same posture.

Scale posture (100 TB target, tested on local[*]):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic join-strategy switching replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces down on small data and the advisory partition size governs
  the real fan-out on big data.
- Arrow on: any pandas-interop (createDataFrame from driver extracts,
  pandas UDFs for similarity/multimodal operators) is batch-columnar.
- Dynamic partition overwrite: the reference's overwrite-by-day parquet
  layout (K1) must replace only the partitions being written, never the
  whole table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
# SPARK_GRAFT_CPUS doubles as the local[...] thread spec, which accepts
# "*" — fall back to 32 shuffle partitions for non-numeric values
DEFAULT_SHUFFLE_PARTITIONS = int(_cpus_env) if _cpus_env.isdigit() else 32


def build_session(
    app_name: str = "aws-etl-project2-fiap-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's default tuning."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Local-mode heap: the 1g JVM default starves shuffles past ~sf0.5
    # (observed: window-over-8M-array-rows OOMs at tiled sf1). The
    # driver process hosts every executor thread in local mode, so size
    # it like an executor fleet. Only effective at first JVM launch —
    # a getOrCreate() against a live session keeps its existing heap.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.driver.memory", mem)
        # --- adaptive execution: the 100 TB safety net ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # --- joins: allow shuffled-hash when it fits (guide §9/§3.1,
        # r12) --- SMJ pays two sorts that a per-partition hash build
        # skips; the planner still requires the build side to be 3×
        # smaller AND under threshold×partitions (so a -1 broadcast
        # threshold re-disables it, which the bucketed-join CI gate
        # relies on), and AQE's skew split applies to SHJ like SMJ.
        # Measured at sf0.1: −15–35% on the fact⋈fact TPC-H set (q10
        # 0.76→0.49 s, q5 0.93→0.69 s, q18 0.87→0.68 s); results are
        # join-strategy-independent (full oracle replay re-proved).
        # The residual risk — a misestimated build partition OOMing at
        # cluster scale — is bounded by the size gate and AQE skew
        # handling; flip back per-job via extra_conf if a workload's
        # stats are known-bad.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # AQE's runtime SMJ→SHJ rewrite is OFF until this is set (guide
        # §3.1: "default 0, i.e. off until you set it"). The static SHJ
        # gate above needs trustworthy plan-time stats, which joins and
        # aggregates rarely have (q18's semi join over a HAVING
        # aggregate stays SMJ at every SF without this); the AQE
        # rewrite instead uses OBSERVED post-shuffle sizes and fires
        # only when EVERY build partition is under this cap — 64m
        # matches the advisory partition size, so a healthily-coalesced
        # partition qualifies while a skewed one (>64m) keeps
        # spill-safe SMJ. Worst-case residency: cores × 64 MB of
        # concurrent build maps, bounded and sized to the heap.
        # Measured r13 at tiled sf1 (same-session conf A/B, best-of-3):
        # q18 1.852→1.734 s (+6.4%), q5 1.206→1.083 s (+10.2%); queries
        # whose final plan carries no SMJ are byte-identical plans
        # under 0 vs 64m (verified on q7), so their draw deltas are
        # noise. plans/r13/tpch_q18_large_orders_aqe_final_sf1_
        # {before,after}.txt show the lineitem⋈orders SMJ → SHJ
        # conversion, isFinalPlan=true.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        # --- columnar interop ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- deterministic event-time semantics ---
        # date_trunc/date_format floor and render in the SESSION
        # timezone while F.window buckets are epoch-aligned; pinning
        # UTC makes the two coincide (window_hopping_2h's explode
        # rewrite relies on it) and keeps oracle comparisons
        # machine-independent. Only effective for confs read at query
        # time — getOrCreate() against a live session keeps its value,
        # so we also set it post-hoc below.
        .config("spark.sql.session.timeZone", "UTC")
        # --- partitioned-write semantics (K1: overwrite-by-day) ---
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # --- keep parquet scans tight ---
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (the legacy default) writes NO min/max statistics, which
        # silently disables every timestamp-column pruning tier — footer
        # stats, manifest skipping (io/versioned), partition overwrite's
        # whole-file drops. MICROS is the modern interchange type and
        # restores per-column stats; round-trip precision is unchanged
        # (Spark timestamps are micros internally).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- runtime bloom-filter join pruning: pin on, independent of
        # the Spark default. A selective join side injects a bloom
        # filter into the big side's scan (orders filtered by date ->
        # lineitem scan drops non-matching orderkeys before the
        # shuffle). At 100 TB this is the difference between shuffling
        # the whole fact table and shuffling the matching slice; worst
        # case is a wasted ~MB-sized filter. (The sibling
        # runtimeFilter.semiJoinReduction flag is deliberately NOT set:
        # on Spark 4.1 it sends even trivial plans into a pathological
        # optimizer loop — verified locally, range(10).count() hangs.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # quiet progress bars in test logs
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # session.timeZone is a runtime SQL conf — enforce it even when
    # getOrCreate() returned a pre-existing session built elsewhere
    # (the driver harness builds its own session, then calls us);
    # an explicit extra_conf override wins
    spark.conf.set(
        "spark.sql.session.timeZone",
        (extra_conf or {}).get("spark.sql.session.timeZone", "UTC"),
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def parallelize_small(df, min_partitions: int | None = None):
    """Repartition an under-partitioned input up to the session's
    parallelism. Single-row-group parquet files (common for small/test
    datasets) scan as ONE task, serializing every downstream projection;
    a cheap narrow-data shuffle unlocks the other cores. No-op when the
    input already has enough partitions (the 100 TB case)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
