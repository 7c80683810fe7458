"""Python UDTF surface (functions/udtfs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.functions.udtfs import SentenceSpans, register_udtfs


def test_sentence_spans_lateral_sql(spark):
    register_udtfs(spark)
    rows = spark.sql(
        """
        SELECT s.* FROM (SELECT 'Hello there. Second span.  Third' AS text),
        LATERAL sentence_spans(text) s
        """
    ).collect()
    got = [(r["span"], r["start"], r["end"]) for r in rows]
    text = "Hello there. Second span.  Third"
    # offsets must index back into the original string exactly
    assert got == [("Hello there", 0, 11), ("Second span", 13, 24), ("Third", 27, 32)]
    for span, start, end in got:
        assert text[start:end] == span


def test_sentence_spans_dataframe_api(spark):
    df = spark.createDataFrame([("a. b",), (None,), ("",)], "text: string")
    out = (
        df.lateralJoin(SentenceSpans(F.col("text").outer()))
        if hasattr(df, "lateralJoin")
        else None
    )
    if out is None:  # API fallback: go through SQL on a temp view
        register_udtfs(spark)
        df.createOrReplaceTempView("udtf_in")
        out = spark.sql(
            "SELECT s.* FROM udtf_in, LATERAL sentence_spans(text) s"
        )
    got = {(r["span"], r["start"]) for r in out.select("span", "start").collect()}
    assert got == {("a", 0), ("b", 3)}


def test_spans_match_codegen_formulation(spark):
    """The UDTF (python path) and the codegen split+posexplode path must
    agree on the span TEXTS; only the offsets need the UDTF."""
    register_udtfs(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    udtf_spans = spark.sql(
        "SELECT doc_id, s.span FROM udtf_docs, LATERAL sentence_spans(text) s"
    )
    codegen_spans = (
        docs.select(
            "doc_id", F.explode(F.split("text", r"\.")).alias("raw")
        )
        .select("doc_id", F.trim("raw").alias("span"))
        .filter(F.col("span") != "")
    )
    assert sorted(map(tuple, udtf_spans.collect())) == sorted(
        map(tuple, codegen_spans.collect())
    )
