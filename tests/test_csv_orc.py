"""CSV source/sink (quoting, corrupt-row quarantine, partition pruning)
and ORC round-trip coverage."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_project2_fiap_spark.io import csv as csv_io
from aws_etl_project2_fiap_spark.io.jsonl import split_corrupt

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def test_csv_roundtrip_with_quoting(spark, tmp_path):
    rows = [
        (1, "plain", 1.5),
        (2, 'comma, inside', 2.5),
        (3, 'quote " inside', 3.5),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "csv_rt")
    csv_io.write_csv(df, path)
    back = csv_io.read_csv(spark, path, SCHEMA).drop("_corrupt_record")
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "part.csv").write_text(
        "id,name,price\n"
        "1,good,9.99\n"
        "not_a_number,bad cast,1.0\n"
        "2,also good,0.5\n"
    )
    parsed = csv_io.read_csv(spark, str(raw), SCHEMA)
    clean, bad = split_corrupt(parsed)
    assert sorted(tuple(r) for r in clean.collect()) == [
        (1, "good", 9.99),
        (2, "also good", 0.5),
    ]
    assert [r[0] for r in bad.collect()] == ["not_a_number,bad cast,1.0"]


def test_csv_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i), "a" if i % 2 else "b") for i in range(10)],
        "id long, name string, price double, bucket string",
    )
    path = str(tmp_path / "csv_part")
    csv_io.write_csv(df, path, partition_by=["bucket"])
    sub = T.StructType([f for f in SCHEMA.fields])
    back = csv_io.read_csv(spark, path, sub, header=True).filter(
        F.col("bucket") == "a"
    )
    assert back.count() == 5
    # partition pruning: only the bucket=a directory is scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "bucket=b" not in plan


def test_orc_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 4, i % 3) for i in range(60)],
        "id long, name string, price double, k int",
    )
    path = str(tmp_path / "orc_rt")
    df.write.mode("overwrite").partitionBy("k").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 60
    assert sorted(tuple(r) for r in back.select("id", "name", "price").collect()) \
        == sorted(tuple(r) for r in df.select("id", "name", "price").collect())
    # predicate on the partition column prunes directories
    pruned = back.filter(F.col("k") == 1)
    assert pruned.count() == 20
