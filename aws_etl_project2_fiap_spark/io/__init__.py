from .jsonl import read_jsonl, split_corrupt, write_jsonl
from .parquet import (
    canonicalize,
    read_partitioned,
    read_star_schema,
    write_partitioned,
)
from .update import apply_update, update_table

__all__ = [
    "canonicalize",
    "read_partitioned",
    "read_star_schema",
    "write_partitioned",
    "apply_update",
    "update_table",
    "read_jsonl",
    "split_corrupt",
    "write_jsonl",
]
