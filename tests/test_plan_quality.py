"""Physical-plan quality gates (the 100 TB posture, checked in CI).

Correctness tests prove the queries return the right rows; these prove
the PLANS are the ones we'd want on a 1000-executor cluster: filters
reach the parquet scan, column pruning trims the read schema, small
dimensions broadcast, top-k avoids global sorts, and the hot paths stay
inside whole-stage codegen instead of falling into Python.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.workload import CATALOG, COMPONENTS

DEFS = {**CATALOG, **COMPONENTS}

SF = "/root/testdata/sf0.01"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    """P3's date filter must appear as PushedFilters on the scan — at
    100 TB this is row-group min/max skipping vs a full-table read."""
    df = DEFS["p3_date_between"].spark(spark, SF)
    s = formatted(df)
    assert "PushedFilters" in s
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln or "GreaterThan" in ln for ln in pushed), pushed


def test_column_pruning_trims_read_schema(spark):
    """A 3-column projection over the 16-column lineitem must scan only
    what it needs."""
    df = DEFS["p3_date_between"].spark(spark, SF)
    s = formatted(df)
    read = [ln for ln in s.splitlines() if "ReadSchema" in ln]
    assert read, s
    assert "l_comment" not in read[0]
    assert read[0].count("l_") <= 5  # projected + filter columns only


def test_star_join_broadcasts_dimensions(spark):
    """join_star_revenue: every dimension side must be a broadcast, the
    single shuffle belongs to the aggregation — never a sort-merge join
    against nation/region-sized tables."""
    df = DEFS["join_star_revenue"].spark(spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_plans_as_take_ordered(spark):
    """O1 (ORDER BY ... LIMIT k) must plan as TakeOrderedAndProject —
    a per-partition heap + driver merge, not a global sort."""
    df = DEFS["o1_topk"].spark(spark, SF)
    assert "TakeOrderedAndProject" in plan(df)


def test_a1_plans_partial_then_final_agg(spark):
    """The flagship aggregation must be a two-phase hash aggregate
    (map-side partial combine before the shuffle)."""
    p = plan(DEFS["a1_top5_7day_sum"].spark(spark, SF))
    assert p.count("HashAggregate") >= 2
    assert "partial_sum" in p


def test_jvm_only_queries_have_no_python_stage(spark):
    """The relational surface must stay JVM-side: no BatchEvalPython
    (row-at-a-time UDF) and no ArrowEvalPython anywhere."""
    for name in [
        "a1_top5_7day_sum", "agg_pricing_summary", "join_star_revenue",
        "window_top3_per_cust", "sessionize_30m", "asof_join_ticks",
        "dedup_exact", "dedup_minhash_lsh", "text_langid", "text_quality",
        "similarity_knn", "dedup_span_exact",
    ]:
        p = plan(DEFS[name].spark(spark, SF))
        assert "BatchEvalPython" not in p, f"{name} fell into row-Python"
        assert "ArrowEvalPython" not in p, f"{name} uses a pandas UDF"


def test_whole_stage_codegen_covers_hot_path(spark):
    """Pricing summary (scan→filter→agg) should be fused into
    WholeStageCodegen spans, not interpreted operators. (Execute first:
    under AQE the final plan exists only after the run.)"""
    df = DEFS["agg_pricing_summary"].spark(spark, SF)
    df.collect()  # AQE: codegen subtrees exist only in the final plan
    cg = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "Found" in cg and "WholeStageCodegen subtrees" in cg
    assert "Found 0" not in cg


def test_asof_join_is_single_shuffle_union_window(spark):
    """The as-of join must use the union-sort-window pattern: exactly
    one Exchange over the key, and no CartesianProduct/range explosion."""
    p = plan(DEFS["asof_join_ticks"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_semi_join_stays_semi(spark):
    """join_semi must plan as a semi join (no duplicate-producing inner
    join + distinct)."""
    p = plan(DEFS["join_semi"].spark(spark, SF))
    assert "Semi" in p, p


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-layout round-trip: a partition-key predicate must prune
    directories at planning time (PartitionFilters), not scan-and-drop."""
    path = str(tmp_path / "pt")
    spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    ).write.partitionBy("bucket").parquet(path)
    df = spark.read.parquet(path).filter(F.col("bucket") == 3)
    s = formatted(df)
    pf = [ln for ln in s.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0], s
    assert df.count() == 100


def test_bucketed_join_has_no_exchange(spark):
    """Co-located fact⋈fact: lineitem and orders bucketed on the join
    key must sort-merge-join with NO Exchange in the plan — the shuffle
    was paid at write time (this is the 100 TB answer to the star
    join's one remaining shuffle)."""
    from aws_etl_project2_fiap_spark.io.catalog import write_bucketed

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])

    conf = spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        assert joined.count() == spark.read.parquet(f"{SF}/lineitem.parquet").count()
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_exists_subquery_decorrelates_to_semi_join(spark):
    """Correlated EXISTS must decorrelate into a semi join — per-row
    subquery re-execution would be quadratic at scale."""
    p = plan(DEFS["subquery_exists"].spark(spark, SF))
    assert "Semi" in p, p
    assert "CartesianProduct" not in p


def test_q3_filters_push_and_topk(spark):
    """TPC-H Q3: the per-table date/segment filters must reach the
    parquet scans (PushedFilters) and the ORDER BY ... LIMIT 10 must
    plan as TakeOrderedAndProject, not a global sort."""
    df = DEFS["tpch_q3_shipping_priority"].spark(spark, SF)
    s = formatted(df)
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed
    assert any("o_orderdate" in ln for ln in pushed), pushed
    assert any("c_mktsegment" in ln for ln in pushed), pushed
    assert "TakeOrderedAndProject" in plan(df)


def test_q5_dimension_chain_broadcasts(spark):
    """TPC-H Q5: the region→nation→supplier chain must broadcast — the
    only sort-merge-eligible joins are the fact⋈fact ones. No cartesian
    products from the cyclic c_nationkey = s_nationkey closure."""
    p = plan(DEFS["tpch_q5_regional_revenue"].spark(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q19_disjunction_pushes_to_both_scans(spark):
    """TPC-H Q19: the OR-of-ANDs predicate mixes columns from both join
    sides; Catalyst must still derive and push the per-side OR (brand/
    size disjunction to the part scan, quantity-range disjunction to
    the lineitem scan) — at 100 TB an unpushed disjunct means scanning
    every lineitem row group."""
    df = DEFS["tpch_q19_discounted_revenue"].spark(spark, SF)
    s = formatted(df)
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert any("p_brand" in ln and "Or(" in ln for ln in pushed), pushed
    assert any("l_quantity" in ln and "Or(" in ln for ln in pushed), pushed
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q4_exists_plans_as_semi_with_residual(spark):
    """TPC-H Q4: the correlated EXISTS with a non-equi condition must
    plan as ONE LeftSemi join (equi on orderkey, the date inequality as
    residual) — never a per-row subquery re-execution or a nested-loop
    join; and the quarter filter must reach the orders scan."""
    df = DEFS["tpch_q4_order_priority"].spark(spark, SF)
    p = plan(df)
    assert "LeftSemi" in p
    assert "BroadcastNestedLoopJoin" not in p
    s = formatted(df)
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed), pushed


def test_q21_rewrite_is_join_free_single_scan(spark):
    """TPC-H Q21's double-correlation rewrite: ONE lineitem scan, no
    Expand (the two-countDistinct plan 2x-explodes raw lineitem), no
    self-join — the order-level counts come from a window over the
    pair-reduced rows. The only join left is the broadcast against
    supplier."""
    df = DEFS["tpch_q21_waiting_supplier"].spark(spark, SF)
    p = plan(df)
    assert "Expand" not in p
    assert p.count("lineitem.parquet") == 1, p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_q22_scalar_subquery_broadcasts_once(spark):
    """TPC-H Q22: the scalar AVG must join as a one-row broadcast (an
    IdentityBroadcastMode nested-loop against a single row is fine;
    a re-executed subquery or a shuffled join is not), the NOT EXISTS
    must plan as LeftAnti, and the date filter must push below the
    anti-join into the orders scan."""
    df = DEFS["tpch_q22_global_sales"].spark(spark, SF)
    p = plan(df)
    assert "LeftAnti" in p
    assert "SortMergeJoin" not in p
    s = formatted(df)
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed), pushed


def test_embedding_dedup_default_plan_is_bucketed(spark):
    """dedup_embedding_cosine's default path must be the LSH-bucketed
    generator: no CartesianProduct / broadcast-nested-loop all-pairs
    anywhere in the plan (the quadratic exact generator is ground-truth
    tooling only)."""
    p = plan(DEFS["dedup_embedding_cosine"].spark(spark, SF))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_grouped_rank_never_sorts_whole_priority_groups(spark):
    """window_percent_rank / window_ntile partition by a 5-value key —
    the plan must never hash-partition the big table on o_orderpriority
    ALONE (5 sort tasks at any scale): every exchange on the priority
    key must carry the range-bin refinement, except the tiny
    offset-aggregate branch (its input is groups×bins rows)."""
    for name in ("window_percent_rank", "window_ntile"):
        p = plan(DEFS[name].spark(spark, SF))
        assert "__bin" in p, f"{name}: range-bin refinement missing\n{p}"
        solo = [
            ln
            for ln in p.splitlines()
            if "hashpartitioning(o_orderpriority" in ln and "__bin" not in ln
        ]
        # the only priority-keyed exchange without __bin is the window
        # over the counts aggregate (rows = groups × bins, driver-tiny)
        assert len(solo) <= 1, f"{name}: whole-group exchange\n{p}"


def test_explode_stays_in_codegen(spark):
    """The generator + agg pipeline must stay JVM-side (Generate inside
    the codegen'd stage; no Python eval anywhere)."""
    df = DEFS["explode_token_topk"].spark(spark, SF)
    p = plan(df)
    assert "Generate" in p
    assert "EvalPython" not in p
    assert "TakeOrderedAndProject" in p


def test_batch_knn_broadcasts_query_set(spark):
    """similarity_batch_knn: the query set must ride as a broadcast —
    one corpus scan, no shuffle of the embedding table for the join,
    and no Cartesian fallback."""
    p = plan(DEFS["similarity_batch_knn"].spark(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_length_filter_bounds_push_into_scan(spark):
    """corpus_length_filter inlines the percentile bounds as literals,
    so the BETWEEN must reach the parquet scan as pushed filters
    (row-group min/max skipping at scale)."""
    s = formatted(DEFS["corpus_length_filter"].spark(spark, SF))
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert pushed and any("n_chars" in ln for ln in pushed), pushed


def test_incremental_dedup_is_single_hash_join(spark):
    """dedup_incremental joins on the content hash: a hash join (either
    side), never a nested-loop, and only hash-partitioned exchanges."""
    p = plan(DEFS["dedup_incremental"].spark(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_cc_round_is_two_shuffles(spark):
    """One large-star+small-star round over an edge set must cost
    exactly the aggregations' exchanges — no joins degenerating into
    nested loops."""
    from aws_etl_project2_fiap_spark.operators.cc import _large_star, _small_star

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "u: long, v: long"
    )
    p = plan(_small_star(_large_star(edges)))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_nulls_topk_is_take_ordered(spark):
    """o_sort_nulls_topk must plan as TakeOrderedAndProject (per-
    partition heap), never a global sort — NULLS FIRST placement is
    free inside the heap's ordering."""
    p = plan(DEFS["o_sort_nulls_topk"].spark(spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "NULLS FIRST" in p


def test_decimal_agg_is_two_phase(spark):
    """Fixed-point sums merge partial+final exactly like double sums —
    the exactness upgrade must not cost the map-side combine."""
    p = plan(DEFS["agg_decimal_exact"].spark(spark, SF))
    assert p.count("HashAggregate") >= 2
    assert "partial_sum" in p


def test_not_in_plans_null_aware_anti_join(spark):
    """NOT IN must plan as the null-aware anti join — the three-valued-
    logic operator, not a plain anti join (which NOT EXISTS gets)."""
    p = plan(DEFS["subquery_not_in"].spark(spark, SF))
    # the trailing `true` on the BHJ line is the isNullAwareAntiJoin flag
    assert "LeftAnti, BuildRight, true" in p, p


def test_url_canonicalize_is_shuffle_free_projection(spark):
    """URL parsing must fold into the scan: no Exchange, no Python."""
    df = DEFS["text_url_canonicalize"].spark(spark, SF)
    p = plan(df)
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_token_histogram_single_partial_final_agg(spark):
    """Fixed-edge histogram: exactly one exchange for the bucket agg
    (the share window runs on the 25-row aggregate, which AQE plans as
    a single tiny partition, not a second big-table shuffle)."""
    df = DEFS["corpus_token_histogram"].spark(spark, SF)
    p = plan(df)
    # one big-table exchange: hashpartitioning on bucket; the window's
    # exchange moves <= n_buckets rows
    assert p.count("Exchange hashpartitioning") <= 1
    assert "partial" in p.lower()  # map-side combine before the shuffle


def test_embedding_centroid_partial_aggregates_before_shuffle(spark):
    """posexplode output must partial-agg on (label, pos) so the
    shuffle carries labels x dim rows per task, not exploded rows."""
    df = DEFS["agg_embedding_centroid"].spark(spark, SF)
    p = plan(df)
    assert "Generate" in p  # codegen explode, not a UDF
    assert "partial" in p.lower()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bloom_probe_prunes_exact_join_to_candidates(spark):
    """The exact-verify join input must be the bloom-candidate filter,
    not the full delivery: plan shows the probe UDF feeding a filter
    that sits under the join."""
    df = DEFS["dedup_bloom_incremental"].spark(spark, SF)
    p = plan(df)
    # vectorized probe (ArrowEvalPython), then the join on the sliver
    assert "ArrowEvalPython" in p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_quality_report_is_single_pass(spark):
    """All rules must fold into ONE aggregation over ONE scan: a single
    parquet scan node, one exchange (partial+final agg), and an Expand
    for the unpivot — never a scan or pass per rule."""
    df = DEFS["quality_report"].spark(spark, SF)
    p = plan(df)
    assert p.count("Scan parquet") == 1, p
    assert p.count("Exchange") <= 2  # agg exchange (+ AQE single-partition read)
    assert "Expand" in p or "Generate" in p  # the unpivot node


def test_gopher_rules_is_map_only(spark):
    """The quality gate must fuse into the scan: no Exchange, no
    Python stage — a pure codegen projection."""
    p = plan(DEFS["text_gopher_rules"].spark(spark, SF))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_chunker_is_map_only_generate(spark):
    """Chunking = projection + Generate (posexplode), still zero
    shuffles and JVM-only."""
    p = plan(DEFS["text_chunk_overlap"].spark(spark, SF))
    assert "Exchange" not in p
    assert "Generate" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_variant_extract_is_map_only(spark):
    p = plan(DEFS["p_variant_extract"].spark(spark, SF))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_hopping_window_is_expand_plus_single_agg_shuffle(spark):
    """Hopping windows must plan as ONE row-expansion node (each event
    replicated into its 2 windows — since round 9 a Generate/explode
    of the two window-start TIMESTAMPS, an 8-byte group key, rather
    than F.window's Expand into (start, end) structs) + partial/final
    agg around a single exchange — not a self-union or join."""
    p = plan(DEFS["window_hopping_2h"].spark(spark, SF))
    assert ("Generate" in p) or (p.count("Expand") >= 1)
    assert p.count("Exchange") == 1
    assert "Join" not in p
    assert "partial" in p.lower()
    # the group key must stay the truncated timestamp — a revert to
    # grouping by the per-row formatted STRING (the round-9 finding)
    # would put date_format BELOW the exchange, computed per input
    # row; in the fixed shape it appears only above the final agg
    tp = plan(DEFS["event_time_tumbling_1h"].spark(spark, SF))
    assert tp.count("Exchange") == 1 and "Join" not in tp
    assert "date_format" not in tp[tp.index("Exchange"):]
    assert "date_format" not in p[p.index("Exchange"):]  # hopping too


def test_index_probe_plan_no_corpus_shuffle(spark, tmp_path):
    """The minhash-index probe broadcasts the delivery; the index side
    must carry no Exchange before the join (corpus never shuffles)."""
    from aws_etl_project2_fiap_spark.operators.dedup import (
        build_minhash_index,
        probe_minhash_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    path = str(tmp_path / "idx")
    build_minhash_index(docs, path)
    probe = probe_minhash_index(
        spark, path, docs.limit(10), threshold=0.5
    )
    p = plan(probe)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    idx_side = p.split("BroadcastHashJoin")[1]
    # the streamed (index) side below the join has no exchange; the only
    # exchanges in the plan serve the broadcast build + final group
    assert "ShuffledHashJoin" not in p


def test_dv_scan_strategy_split(spark, tmp_path, monkeypatch):
    """Merge-on-read DV application picks its physical strategy by
    TOTAL deleted-position count:

    - ≤ _DV_ANTI_JOIN_CAP: a broadcast LEFT ANTI join — whole-stage
      codegen, no Python workers, and the driver load is bounded at
      cap×8 bytes (a BOUNDED broadcast, unlike the round-5 weak #1
      unbounded funnel);
    - past the cap: the executor-side Arrow pass (MapInPandas loading
      each file's own sidecar — the Delta/Iceberg reader shape) with
      NO join, so the driver never materializes O(deleted rows)."""
    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 1.0).alias("v")
    )
    V.create_table(df.repartitionByRange(4, "id"), path)
    V.delete_from(spark, path, F.col("id") % 97 == 0, mode="dv")
    # small DVs: codegen anti-join, no Python stage
    p = plan(V.read_table(spark, path))
    assert "LeftAnti" in p and "BroadcastHashJoin" in p
    assert "MapInPandas" not in p
    expected = {
        r["id"] for r in spark.range(0, 1000).collect()
        if r["id"] % 97 != 0
    }
    assert {
        r["id"] for r in V.read_table(spark, path).collect()
    } == expected
    # past the cap: executor-side Arrow filter, no join, same rows
    monkeypatch.setattr(V, "_DV_ANTI_JOIN_CAP", 0)
    p = plan(V.read_table(spark, path))
    assert "MapInPandas" in p
    assert "Join" not in p and "Exchange" not in p
    assert {
        r["id"] for r in V.read_table(spark, path).collect()
    } == expected


def test_dv_free_scan_has_no_join(spark, tmp_path):
    """A table without DVs must read as a plain scan — zero
    merge-on-read overhead when nothing was deleted."""
    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t")
    V.create_table(spark.range(0, 100).select("id"), path)
    p = plan(V.read_table(spark, path))
    assert "Join" not in p and "Exchange" not in p


def test_shard_assignment_is_shuffle_free_projection(spark):
    """assign_shards must fold into the scan: md5 + conv are codegen
    expressions, no Exchange, no Python stage."""
    from aws_etl_project2_fiap_spark.operators.corpus import assign_shards

    d = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(assign_shards(d, "doc_id", 8, seed=42))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_ivfpq_rerank_is_broadcast_join(spark):
    """The exact rerank joins a k×factor candidate list against the
    raw vectors — must broadcast the candidates, never shuffle the
    vector table."""
    from aws_etl_project2_fiap_spark.operators import similarity as sim

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = sim.kmeans_fit(e, k=8, iters=2)
    books = sim.pq_train(e, cents, m=8, ksub=16, iters=2)
    enc = sim.pq_encode(e, cents, books)
    q = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    out = sim.ivf_pq_search(enc, cents, books, q, k=5, nprobe=8, rerank=e)
    p = plan(out)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_partition_overwrite_readback_prunes(spark):
    """After a clustered partition overwrite, a month-selective read
    of the versioned table must hit a subset of files (manifest-level
    skipping feeds the scan a pruned file list)."""
    from aws_etl_project2_fiap_spark.io import versioned as V

    import tempfile

    from aws_etl_project2_fiap_spark.workload import t as _t

    with tempfile.TemporaryDirectory() as work:
        path = f"{work}/t"
        o = (
            _t(spark, SF, "orders")
            .filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
            .select(
                "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
                "o_totalprice",
            )
        )
        V.create_table(o, path, cluster_by=["mon"], num_files=6)
        pruned = V.read_table(spark, path, between=("mon", "1995-03", "1995-03"))
        full = V.read_table(spark, path)
        assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_q13_filter_pushes_into_join_side_scan(spark):
    """TPC-H Q13: the priority filter lives in the JOIN CONDITION (so
    zero-order customers survive the outer join) yet must still reach
    the orders scan as a pushed filter — join-side predicates are safe
    to push even under LeftOuter."""
    df = DEFS["tpch_q13_customer_distribution"].spark(spark, SF)
    s = formatted(df)
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert any("o_orderpriority" in ln for ln in pushed), pushed
    p = plan(df)
    assert "LeftOuter" in p
    assert "CartesianProduct" not in p


def test_q15_revenue_view_computes_once(spark):
    """TPC-H Q15: the revenue aggregate must compute ONCE and feed both
    the max probe and the equality filter — a plan that scans lineitem
    twice re-runs the quarter aggregation for the scalar subquery."""
    df = DEFS["tpch_q15_top_supplier"].spark(spark, SF)
    p = plan(df)
    # localCheckpoint truncates the lineage: the executed plan reads
    # the materialized RDD, never the parquet scan
    assert "lineitem.parquet" not in p, "revenue view recomputed"
    assert "CartesianProduct" not in p


def test_q17_threshold_decorrelates_no_nested_loop(spark):
    """TPC-H Q17: the per-part avg threshold must decorrelate to an
    aggregation + equi-join — a per-row subquery would plan as a
    nested-loop re-execution."""
    df = DEFS["tpch_q17_small_quantity_revenue"].spark(spark, SF)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_merge_probe_prunes_to_touched_files(spark, tmp_path):
    """VERDICT r7 #7, bench-independent: a delivery-sized MERGE into a
    many-file clustered table must probe only the files whose manifest
    key-envelope (and bloom) can hold the delivery's keys — a future
    change that reintroduces a full-table probe fails here, not in a
    bench regression three rounds later."""
    from aws_etl_project2_fiap_spark.io import versioned as V

    tbl = str(tmp_path / "orders")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    V.create_table(o, tbl, cluster_by=["o_orderkey"], num_files=8)
    nfiles = len(V._read_manifest(tbl, 1)["files"])
    assert nfiles >= 8
    lo, hi = o.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    # delivery confined to the bottom ~10% of the key range: the
    # range-clustered layout must prune the probe to a small minority
    delivery = (
        V.read_table(spark, tbl)
        .filter(F.col("o_orderkey") <= lo + (hi - lo) // 10)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    res = V.merge_table(
        spark, tbl, delivery, ["o_orderkey"],
        when_matched="replace", insert_unmatched=False,
    )
    assert res["files_probed"] < nfiles / 2, (res, nfiles)
    assert res["files_reused"] >= nfiles - res["files_probed"]


def test_matview_refresh_merge_is_bucket_pruned(spark, tmp_path):
    """VERDICT r7 #7: the incremental refresh's state merge must reuse
    every state file whose bucket the delta didn't touch. A one-group
    delta against an 8-bucket view carries >= N-1 files by reference —
    a refresh that rewrites (or even probes) the whole view state is a
    reintroduced full-table scan and fails here."""
    from aws_etl_project2_fiap_spark.io import matview as MV
    from aws_etl_project2_fiap_spark.io import versioned as V

    src = str(tmp_path / "src")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").alias("x"),
    )
    V.create_table(o.repartition(4), src)
    dst = str(tmp_path / "view")
    MV.create_aggregate_view(
        spark, src, dst, ["k"], {"sx": ("sum", "x")}, bucket_by_key=8
    )
    nfiles = len(V._read_manifest(dst, V.current_version(dst))["files"])
    assert nfiles > 1
    one_key = o.limit(1).collect()[0]["k"]
    V.append_table(
        spark.createDataFrame([(one_key, 5.0)], "k long, x double"), src
    )
    r = MV.refresh_aggregate_view(spark, dst)
    assert r["groups_changed"] == 1
    v = V.current_version(dst)
    pre = {f["path"] for f in V._read_manifest(dst, v - 1)["files"]}
    now = {f["path"] for f in V._read_manifest(dst, v)["files"]}
    assert len(pre & now) >= nfiles - 1, (len(pre & now), nfiles)
