"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL project (hguazza/aws-etl-project2-fiap).

Brand-new, Spark-first design: everything is a lazy DataFrame plan that
Catalyst optimizes (predicate pushdown, partition pruning, AQE). The
reference's pandas/Glue semantics are re-expressed as composable
``DataFrame.transform``-style operators — see ``SURVEY.md`` for the
operator inventory this package implements.

Layout
------
- ``session``    — SparkSession builder (AQE, Arrow, shuffle sizing)
- ``io``         — partitioned parquet read/write, schema canonicalization,
                   catalog helpers
- ``operators``  — relational/window/as-of/dedup/similarity/text/multimodal
                   operators
- ``functions``  — the gs_* transform registry + scalar helpers
- ``plans``      — the reference's end-to-end pipelines (B3 pregão, BTC ticks)
- ``streaming``  — Structured Streaming sources/sinks mirroring the
                   Firehose/Lambda trigger patterns
"""

__version__ = "0.1.0"
