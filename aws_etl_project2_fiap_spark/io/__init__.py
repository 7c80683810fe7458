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
]
