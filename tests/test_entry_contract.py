"""__spark_entry__ contract invariants (cheap, no Spark jobs).

The driver consumes entry()/queries()/oracle_sql() blind — these pin
the structural guarantees it depends on before any engine work runs.
"""

from __future__ import annotations

import duckdb
import pytest

from aws_etl_project2_fiap_spark.io.parquet import STAR_TABLES
from aws_etl_project2_fiap_spark.workload import (
    CATALOG,
    COMPONENTS,
    SUITES,
    oracle_sql,
    ordered_catalog,
    queries,
)


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())


def test_first_fifty_are_oracle_backed():
    """The driver hashes positions 1-50; a rows-only entry inside the
    window would waste a hash slot on a weaker check."""
    names = list(ordered_catalog())
    o = oracle_sql()
    assert all(n in o for n in names[:50]), [
        n for n in names[:50] if n not in o
    ]


def test_suite_members_exist_and_are_components():
    for suite, members in SUITES.items():
        assert suite in CATALOG
        for m in members:
            assert m in COMPONENTS, f"{suite} references unknown {m}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    sorted(
        set(oracle_sql())
        | {n for n, qd in COMPONENTS.items() if qd.oracle is not None}
    ),
)
def test_every_oracle_parses(duck, name):
    """EXPLAIN (never execute): a dialect typo in any oracle — catalog
    or component — fails here in milliseconds instead of erring a
    driver correctness row."""
    sql = (
        oracle_sql().get(name)
        or COMPONENTS[name].oracle
    )
    duck.execute(f"EXPLAIN {sql}")


# the round-8 window: the r7 rotated window (50/50 driver-green in
# CORRECTNESS_r07.json) with the two entries that landed AFTER the r7
# rotation — k_wap_merge_publish_readback and k_lakesql_verbs_readback,
# never driver-hash-checked — swapped in for tpch_q3/tpch_q5 (both
# driver-green r3-r7). Pinned so that appending new catalog entries
# can never reorder-and-evict a row mid-round.
_R8_WINDOW = [
    "a1_top5_7day_sum",
    "tpch_q4_order_priority", "tpch_q7_nation_volume",
    "tpch_q10_returned_items", "tpch_q12_priority_class",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders", "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_supplier", "tpch_q22_global_sales",
    "k_zorder_readback", "k_bloom_readback", "k_dv_delete_readback",
    "k_partition_overwrite_readback", "k_cluster_evolution_readback",
    "k_matview_incremental_readback", "k_matview_star_readback",
    "k_wap_publish_readback", "k_table_source_readback",
    "k_merge_clauses_readback", "k_merge_sync_readback",
    "k_replicate_readback",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_span_exact",
    "sample_stratified", "text_rolling_chunks", "corpus_shard_export",
    "k_wap_merge_publish_readback", "k_lakesql_verbs_readback",
    "dedup_minhash_lsh_portable", "dedup_cluster_lsh",
    "similarity_knn_quantized", "stream_neardup_ingest",
    "a2_count", "k_matview_dim_evolution_readback", "join_star_revenue",
    "window_keep_latest", "sessionize_30m",
    "dedup_exact", "multimodal_meta", "dedup_embedding_cosine",
    "k6_update_readback", "p_projection_suite", "suite_subquery",
    "suite_asof", "suite_text",
]

# the r3-r6 window, kept to prove the rotation actually rotated
_R3_GREEN_WINDOW = [
    "a1_top5_7day_sum", "p6_arith_projection", "a2_count", "o1_topk",
    "o2_ordered_scan", "agg_pricing_summary", "agg_count_distinct",
    "agg_having", "agg_pivot", "agg_percentiles", "join_star_revenue",
    "join_left_count", "join_semi", "join_anti", "window_keep_latest",
    "window_top3_per_cust", "sessionize_30m", "event_time_tumbling_1h",
    "join_range_binned", "p_projection_suite", "session_window_native",
    "stream_stats_by_key", "dedup_exact", "dedup_keep_latest",
    "dedup_ngram_jaccard", "text_langid", "similarity_knn",
    "similarity_pairs_exact", "multimodal_meta", "corpus_select",
    "tpch_q3_shipping_priority", "tpch_q5_regional_revenue",
    "dedup_embedding_cosine", "explode_token_topk", "text_tfidf_topk",
    "dedup_fuzzy_levenshtein", "dedup_cluster_assign",
    "k6_update_readback", "suite_proj_orders", "suite_proj_customer",
    "suite_proj_events", "suite_setops", "suite_agg_grouping",
    "suite_join_outer", "suite_window_frames", "suite_window_rank",
    "suite_subquery", "suite_asof", "suite_corpus_ops", "suite_text",
]


def test_driver_window_order_is_pinned():
    """Positions 1-50 of queries() must stay EXACTLY the pinned r8
    window, in order: the driver hash-compares by position, so any
    reorder (e.g. registering a new oracle-backed query before the
    suites) silently evicts a row mid-round."""
    assert list(ordered_catalog())[:50] == _R8_WINDOW


def test_r8_window_covers_post_rotation_entries():
    """The two oracle-backed entries added after the r7 rotation must
    be inside the driver window (VERDICT r7 #1), and the rotation
    property vs the byte-identical r3-r6 window must still hold."""
    assert "k_wap_merge_publish_readback" in _R8_WINDOW
    assert "k_lakesql_verbs_readback" in _R8_WINDOW
    fresh = [n for n in _R8_WINDOW if n not in _R3_GREEN_WINDOW]
    assert len(fresh) >= 25, fresh
    # and everything evicted is still oracle-backed in the tail
    evicted = [n for n in _R3_GREEN_WINDOW if n not in _R8_WINDOW]
    cat, o = list(ordered_catalog()), oracle_sql()
    for n in evicted:
        assert n in cat and n in o
