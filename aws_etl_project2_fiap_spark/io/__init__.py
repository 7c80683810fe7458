from .parquet import (
    canonicalize,
    read_partitioned,
    read_star_schema,
    write_partitioned,
)

__all__ = [
    "canonicalize",
    "read_partitioned",
    "read_star_schema",
    "write_partitioned",
]
