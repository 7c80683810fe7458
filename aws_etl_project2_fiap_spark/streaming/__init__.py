"""Structured Streaming surface (SURVEY §2.9: T1–T3) plus the idiomatic
event-time upgrades the reference's design implies but never wrote
(watermarked windows, streaming dedup, custom stateful ops).

Reference semantics being re-expressed:

- T1 — 1 Hz polling tick source (reference src/ingest_strem_btc.py:44-58)
  → rate-paced streaming source with a deterministic synthetic price.
- T2 — Firehose 64 MB / 60 s buffered delivery to S3
  (reference src/create_firehose_stream.py:27-39) → processing-time
  trigger + checkpointed parquet sink (exactly-once, vs. the
  reference's at-least-once).
- T3 — S3 ObjectCreated → Lambda → Glue batch run, maxConcurrentRuns=1
  (reference src/sqs.py:63-87, src/trigger_glue.py:14-26) → file-source
  streaming over the landing dir with ``availableNow`` (batch-per-drop)
  as a single named query.
"""

from .sources import file_source, parse_firehose_records, tick_source
from .sinks import buffered_parquet_sink, process_available_files
from .pipelines import (
    dedup_ticks,
    session_window_agg,
    sliding_window_agg,
    stateful_price_alerts,
    stateful_running_stats,
    tumbling_window_agg,
)

__all__ = [
    "tick_source",
    "file_source",
    "parse_firehose_records",
    "buffered_parquet_sink",
    "process_available_files",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_ticks",
    "stateful_price_alerts",
    "stateful_running_stats",
]
