"""IO edge tests: SQLite source/sink (S5/K4/S6) and the driver-side
extract surface (S1/S2)."""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_project2_fiap_spark.io.extract import (
    extract_pages,
    extract_point,
    extract_records,
)
from aws_etl_project2_fiap_spark.io.sqlite import read_sqlite, write_sqlite


@pytest.fixture()
def btc_db(tmp_path) -> str:
    path = str(tmp_path / "ticks.db")
    with sqlite3.connect(path) as conn:
        conn.execute(
            "CREATE TABLE preco_bitcoin (id INTEGER PRIMARY KEY AUTOINCREMENT,"
            " data_hora TEXT, preco_brl REAL)"
        )
        conn.executemany(
            "INSERT INTO preco_bitcoin (data_hora, preco_brl) VALUES (?, ?)",
            [
                ("2025-07-31 23:52:19.088260", 649034.0),
                ("2025-08-01 00:10:00.000000", 650000.5),
                ("2025-08-01 08:00:00.500000", 648500.25),
            ],
        )
    return path


def test_read_sqlite_ordered_scan(spark, btc_db):
    """S5 + S6/O2: SQL table scan with ORDER BY id DESC (the reference's
    newest-first read-back, src/bitoin_coin_gecko_api.py:59)."""
    df = read_sqlite(
        spark, btc_db, "SELECT id, data_hora, preco_brl FROM preco_bitcoin ORDER BY id DESC"
    )
    rows = df.collect()
    assert [r.id for r in rows] == [3, 2, 1]
    assert rows[0].preco_brl == 648500.25
    # it IS a distributed frame now: Spark ops compose
    assert df.filter(F.col("preco_brl") > 649000).count() == 2


def test_write_sqlite_roundtrip(spark, btc_db):
    """K4: batch insert (executemany semantics) then read-back."""
    new_ticks = spark.createDataFrame(
        [(10, "2025-08-02 00:00:00.000000", 651000.0)],
        ["id", "data_hora", "preco_brl"],
    )
    n = write_sqlite(new_ticks, btc_db, "preco_bitcoin")
    assert n == 1
    back = read_sqlite(spark, btc_db, "SELECT count(*) AS n FROM preco_bitcoin")
    assert back.first().n == 4


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("Código", T.StringType()),
        T.StructField("Qtde. Teórica", T.StringType()),
    ]
)


def test_extract_pages_unions_and_stops_early(spark):
    """S1: page loop → one Arrow batch → one DataFrame; None ends the
    pagination like the reference's missing next-button."""
    def provider(i: int):
        if i >= 3:  # pages 0,1,2 exist
            return None
        return pd.DataFrame(
            {"Código": [f"TICK{i}"], "Qtde. Teórica": [f"{i}.000.000"]}
        )

    df = extract_pages(spark, provider, max_pages=10, schema=PAGE_SCHEMA)
    assert df.count() == 3
    assert df.schema == PAGE_SCHEMA
    assert {r["Código"] for r in df.collect()} == {"TICK0", "TICK1", "TICK2"}


def test_extract_pages_empty_needs_schema(spark):
    assert extract_pages(spark, lambda i: None, 5, PAGE_SCHEMA).count() == 0
    with pytest.raises(ValueError):
        extract_pages(spark, lambda i: None, 5)


TICK_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def test_extract_point_single_row(spark):
    """S2: one API response → one typed row."""
    df = extract_point(
        spark,
        lambda: {"timestamp": "2025-08-01 10:00:00", "price": 600000.5},
        TICK_SCHEMA,
    )
    assert df.count() == 1
    assert df.first().price == 600000.5


def test_extract_records(spark):
    recs = [{"timestamp": f"2025-08-01 10:00:0{i}", "price": 600000.0 + i} for i in range(5)]
    df = extract_records(spark, recs, TICK_SCHEMA)
    assert df.count() == 5
    assert df.agg(F.max("price")).first()[0] == 600004.0


def test_analyze_table_statistics_reach_optimizer(spark, tmp_path):
    """ANALYZE TABLE (+ FOR COLUMNS) must land row-count/size stats in
    the catalog AND surface them to the optimizer: the logical plan's
    stats drop from the byte-size guess to the exact analyzed row
    count. This is the CBO input path — the stats that drive join
    reordering and broadcast decisions before the first exchange."""
    from aws_etl_project2_fiap_spark.io.catalog import analyze_table, table_stats

    spark.sql("DROP TABLE IF EXISTS stats_probe")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").write.mode(
        "overwrite"
    ).saveAsTable("stats_probe")
    try:
        analyze_table(spark, "stats_probe", columns=["n_nationkey", "n_name"])
        desc = table_stats(spark, "stats_probe")
        assert "Statistics" in desc and "25 rows" in desc["Statistics"], desc

        col_desc = spark.sql(
            "DESCRIBE TABLE EXTENDED stats_probe n_nationkey"
        ).collect()
        kv = {r.info_name: r.info_value for r in col_desc}
        assert kv.get("distinct_count") == "25", kv
        assert kv.get("min") == "0" and kv.get("max") == "24", kv

        # optimizer visibility: exact rowCount in the plan statistics —
        # only propagated when the cost-based optimizer is on (default
        # off; AQE covers runtime re-planning, CBO consumes these
        # pre-exchange)
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table("stats_probe")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert int(stats.rowCount().get()) == 25, stats.toString()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_probe")
