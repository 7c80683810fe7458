"""JSONL source/sink: round-trip fidelity, schema-explicit reads,
corrupt-line quarantine, partitioned layout pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_documents_roundtrip(spark, tmp_path):
    """parquet → jsonl → back: every doc_id/lang/text survives exactly
    (JSON escaping covers newlines/quotes inside text)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back, bad = split_corrupt(read_jsonl(spark, path, DOCUMENTS_SCHEMA))
    assert bad.count() == 0
    orig = {(r.doc_id, r.lang, r.text) for r in docs.collect()}
    got = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert got == orig


def test_corrupt_lines_quarantine_not_fail(spark, tmp_path):
    """One malformed line must not kill the read: it lands whole in the
    quarantine frame, clean rows parse normally."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "text": "ok"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "lang": "pt", "text": "bom"}\n'
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p), DOCUMENTS_SCHEMA))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    badlines = [r[0] for r in bad.collect()]
    assert badlines == ["this is not json at all"]


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partition_by=lang gives hive layout: a lang predicate must prune
    at planning time (PartitionFilters), same as the parquet sink."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    path = str(tmp_path / "by_lang")
    write_jsonl(docs, path, partition_by=["lang"])
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(os.listdir(path)) >= {f"lang={x}" for x in langs}

    schema_nopart = DOCUMENTS_SCHEMA["doc_id"].dataType
    df = spark.read.schema("doc_id long, text string, lang string").json(path)
    one = sorted(langs)[0]
    filtered = df.filter(F.col("lang") == one)
    s = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in s.splitlines() if "PartitionFilters" in ln]
    assert pf and "lang" in pf[0], s
    assert filtered.count() == docs.filter(F.col("lang") == one).count()


def test_default_output_is_compressed(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    path = str(tmp_path / "z")
    write_jsonl(docs, path)
    files = [f for f in os.listdir(path) if f.endswith(".gz")]
    assert files, os.listdir(path)
