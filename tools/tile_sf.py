#!/usr/bin/env python
"""Deterministic scale-up of a driver sf dir by integer tiling.

``python tools/tile_sf.py [--src /root/testdata/sf0.1] [--tiles 10]``
writes ``/tmp/spark_graft_tiled_sf{sf*tiles}``: each fact/dim table is
replicated ``tiles`` times with every surrogate key shifted by
``tile_index * KEY_STRIDE``, so joins stay exactly consistent across
tiles (tile i's lineitem rows join tile i's orders/part/supplier rows)
while group cardinalities on keys grow linearly and group cardinalities
on categorical/date columns stay fixed — the same growth profile a real
TPC-H sf bump has. region/nation are fixed dimensions (25 nations at
every TPC-H sf) and are copied, not tiled; nationkey/regionkey foreign
keys are left unshifted accordingly.

This is BENCH infrastructure for scale-sensitivity runs (SCALE.md) —
correctness stays gated on the driver's own sf dirs, untouched.
"""

from __future__ import annotations

import argparse
import math
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# every surrogate key shifted per tile; nation/region FKs stay fixed
KEY_COLS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = {"region", "nation"}
KEY_STRIDE = 100_000_000  # far above any sf<=10 key domain


def tile_table(src: str, dst: str, keys: list[str], tiles: int,
               row_groups: int) -> int:
    """Stream one tile at a time through a ParquetWriter — peak memory
    is ONE tile regardless of the tile count, so sf10+ scales."""
    tbl = pq.read_table(src)
    rg_size = max(1, math.ceil(len(tbl) * tiles / row_groups))
    total = 0
    writer = pq.ParquetWriter(dst, tbl.schema)
    try:
        for i in range(tiles):
            t = tbl
            for k in keys:
                idx = t.schema.get_field_index(k)
                shifted = pc.add(
                    t.column(k), pa.scalar(i * KEY_STRIDE, type="int64")
                )
                t = t.set_column(
                    idx, t.schema.field(k), shifted.cast(t.schema.field(k).type)
                )
            writer.write_table(t, row_group_size=rg_size)
            total += len(t)
    finally:
        writer.close()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--tiles", type=int, default=10)
    ap.add_argument("--row-groups", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    src_sf = args.src.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(src_sf) * args.tiles
    out_dir = args.out or f"/tmp/spark_graft_tiled_sf{sf:g}"
    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(args.src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        tiles = 1 if name in FIXED_DIMS else args.tiles
        n = tile_table(
            os.path.join(args.src, fname),
            os.path.join(out_dir, fname),
            KEY_COLS.get(name, []),
            tiles,
            args.row_groups,
        )
        print(f"{name}: {n} rows x{tiles}")
    print(out_dir)


if __name__ == "__main__":
    main()
