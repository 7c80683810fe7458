"""Incremental file-discovery batch ingest (checkpointed).

The reference's analytics job is EVENT-TRIGGERED: an object lands in the
raw bucket and the job processes exactly that delivery (reference
src/etl.py — per-run batches appended to the refined zone). The
streaming half of that contract lives in streaming/sources.py
(``availableNow`` file source); this module is the BATCH half — the
cron-shaped "process whatever arrived since the last run" job every
lake has:

- ``discover_new_files``: list the source dir, diff against the
  checkpoint state (path + size + mtime — a re-uploaded file counts as
  new), return the unprocessed set.
- ``ingest_batch``: read ONLY the new files (one multi-file scan, not
  per-file loops), hand them to the sink, then commit the state with an
  atomic ``os.replace``.

Failure contract: state commits AFTER the sink succeeds, so a crash
anywhere re-processes the same delivery next run — at-least-once, made
effectively-once by an idempotent sink (the versioned-table append
records the batch's file set in its manifest; the incremental-dedup
operators absorb replays by content hash).

At 100 TB the listing is the scale point, not the read: keep deliveries
in date-partitioned prefixes so each run lists one prefix (pass the
prefix as ``src_dir``), exactly how the reference's bucket layout
(`ano=/mes=/dia=`) is organized.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _load_state(state_path: str) -> dict:
    try:
        with open(state_path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"processed": {}}


def _save_state(state_path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    tmp = f"{state_path}.tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, state_path)  # atomic: a crash never truncates state


def _stamp(path: str) -> list:
    st = os.stat(path)
    return [st.st_size, st.st_mtime]


def discover_new_files(
    src_dir: str, state_path: str, suffix: str = ".parquet"
) -> list[str]:
    """Files under ``src_dir`` (recursive) not yet in the checkpoint,
    or whose (size, mtime) changed since they were processed."""
    state = _load_state(state_path)
    seen = state["processed"]
    out = []
    for root, _dirs, names in os.walk(src_dir):
        for name in sorted(names):
            if not name.endswith(suffix):
                continue
            full = os.path.join(root, name)
            if seen.get(full) != _stamp(full):
                out.append(full)
    return sorted(out)


def _is_readable_parquet(path: str) -> bool:
    """Footer check via pyarrow — a truncated upload or non-parquet
    stray must not poison the whole multi-file scan."""
    import pyarrow.parquet as pq

    try:
        pq.read_metadata(path)
        return True
    except Exception:  # pyarrow raises ArrowInvalid/OSError variants
        return False


def ingest_batch(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    sink,
    suffix: str = ".parquet",
) -> dict:
    """One incremental run: read every newly-arrived file in a single
    multi-file scan, apply ``sink(df) -> None``, commit the state.

    Corrupt arrivals (truncated upload, non-parquet stray) are
    QUARANTINED, not fatal: they're recorded under state["quarantined"]
    and skipped, so one bad object can't wedge the pipeline — the ops
    answer to the reference's unvalidated S3 drops. A quarantined path
    is re-checked whenever its (size, mtime) changes (the re-upload
    heals it). Footer checks are driver-side pyarrow metadata reads —
    O(new files), no data IO.

    Returns {"files": n, "quarantined": [...], "committed": bool}.
    ``files == 0`` short-circuits without touching Spark or the sink."""
    new = discover_new_files(src_dir, state_path, suffix)
    state = _load_state(state_path)
    quarantined = state.setdefault("quarantined", {})
    # re-uploaded quarantined files get another chance; unchanged ones
    # stay skipped (discover treats them as new every run otherwise)
    new = [
        f
        for f in new
        if quarantined.get(f) != _stamp(f)
    ]
    good, bad = [], []
    for f in new:
        (good if _is_readable_parquet(f) else bad).append(f)
    if bad:
        for f in bad:
            quarantined[f] = _stamp(f)
        _save_state(state_path, state)
    if not good:
        return {"files": 0, "quarantined": bad, "committed": False}
    df = spark.read.option("mergeSchema", "true").parquet(*good)
    sink(df)
    state = _load_state(state_path)
    for f in good:
        state["processed"][f] = _stamp(f)
    _save_state(state_path, state)
    return {"files": len(good), "quarantined": bad, "committed": True}
