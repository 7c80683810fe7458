"""Versioned table as a Structured Streaming SOURCE (the Delta
streaming-source pattern on io/versioned.py's manifest log).

``readStream.format("versioned_table").option("path", ...)`` turns a
lakehouse table into a live stream: each micro-batch delivers the rows
INSERTED since the last committed offset, where an offset is simply the
table VERSION — the engine owns replay and exactly-once, the source
only answers "rows between version A and B", which the manifest log
answers by FILE DIFF (cost ∝ files added, never table size or history
length).

Contracts (same as io/versioned.consume_changes, the batch consumer):

- first batch = the full snapshot at the then-current version;
- a copy-on-write UPDATE/MERGE re-emits the rows of its rewritten
  files (file-diff granularity — consumers keying on a unique id
  reconcile, Delta's ``ignoreChanges`` caveat);
- DELETE-only commits (including deletion-vector commits) deliver
  nothing — this is the INSERT feed; the delete feed is
  ``table_changes``;
- replay of a committed offset range (``readBetweenOffsets``) is
  bit-stable while the manifests are retained; a range older than
  vacuum retention raises with the resync instruction.

This uses the SimpleDataSourceStreamReader (driver-side reads) — right
for delivery-sized commits; a 100 TB initial snapshot should start the
stream AT a version (``startVersion``) after seeding by batch copy, or
use the partition-planning DataSourceStreamReader variant of the same
offset contract.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)


def _arrow_to_ddl(schema) -> str:
    """Spark DDL string from a pyarrow schema (primitive columns)."""
    import pyarrow as pa

    out = []
    for field in schema:
        t = field.type
        if pa.types.is_int64(t) or pa.types.is_uint32(t):
            s = "long"
        elif pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
            s = "int"
        elif pa.types.is_float64(t):
            s = "double"
        elif pa.types.is_float32(t):
            s = "float"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            s = "string"
        elif pa.types.is_boolean(t):
            s = "boolean"
        elif pa.types.is_date(t):
            s = "date"
        elif pa.types.is_timestamp(t):
            s = "timestamp"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            s = "binary"
        else:
            raise ValueError(
                f"versioned_table source: unsupported column type {t} "
                f"({field.name}) — project it away before streaming"
            )
        out.append(f"`{field.name}` {s}")
    return ", ".join(out)


def _live_rows(entry: dict, columns: list[str]):
    """Rows of one manifest entry as tuples (DV positions removed) —
    pyarrow read, driver-side."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..io.versioned import _read_dv

    tbl = pq.read_table(entry["path"], columns=columns)
    if entry.get("dv"):
        mask = np.ones(tbl.num_rows, dtype=bool)
        pos = _read_dv(entry["dv"]["path"])
        mask[pos[pos < tbl.num_rows]] = False
        tbl = tbl.filter(mask)
    cols = [tbl.column(c).to_pylist() for c in columns]
    return zip(*cols) if cols else iter(())


class _VersionedTableStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"version": N} — the table's own commit log is the
    offset space, so source progress is human-auditable (`history`)."""

    def __init__(self, options, columns: list[str]):
        self.path = options["path"]
        self.columns = columns
        self.start_version = int(options.get("startversion", "0"))

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def _inserted_entries(self, lo: int, hi: int) -> list[dict]:
        from ..io import versioned as V

        import os

        if lo > 0 and not os.path.exists(
            os.path.join(V._manifest_dir(self.path), f"v{lo}.json")
        ):
            raise ValueError(
                f"versioned_table source: offset v{lo} of {self.path} "
                f"predates vacuum retention — restart the stream with a "
                f"fresh checkpoint (full-snapshot resync)"
            )
        hi_files = V._read_manifest(self.path, hi)["files"]
        if lo == 0:
            return hi_files
        lo_paths = {f["path"] for f in V._read_manifest(self.path, lo)["files"]}
        return [f for f in hi_files if f["path"] not in lo_paths]

    def read(self, start: dict):
        from ..io import versioned as V

        lo = start["version"]
        hi = V.current_version(self.path)
        if hi == lo:
            return iter(()), {"version": lo}
        rows = []
        for entry in self._inserted_entries(lo, hi):
            rows.extend(_live_rows(entry, self.columns))
        return iter(rows), {"version": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for entry in self._inserted_entries(start["version"], end["version"]):
            rows.extend(_live_rows(entry, self.columns))
        return iter(rows)


class _VersionedTableBatchReader(DataSourceReader):
    def __init__(self, options, columns: list[str]):
        self.path = options["path"]
        self.columns = columns
        self.version = options.get("version")

    def read(self, partition):
        from ..io import versioned as V

        v = int(self.version) if self.version else V.current_version(self.path)
        for entry in V._read_manifest(self.path, v)["files"]:
            yield from _live_rows(entry, self.columns)


class VersionedTableDataSource(DataSource):
    """``format("versioned_table")`` — a versioned table as a batch or
    streaming source. Options: ``path`` (required), ``startVersion``
    (stream: first offset; 0 = snapshot-then-deltas), ``version``
    (batch: time travel)."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _columns(self):
        import pyarrow.parquet as pq

        from ..io import versioned as V

        v = V.current_version(self.options["path"])
        first = V._read_manifest(self.options["path"], v)["files"][0]
        return pq.read_schema(first["path"])

    def schema(self) -> str:
        return _arrow_to_ddl(self._columns())

    def reader(self, schema) -> DataSourceReader:
        return _VersionedTableBatchReader(
            self.options, [f.name for f in self._columns()]
        )

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _VersionedTableStreamReader(
            self.options, [f.name for f in self._columns()]
        )
