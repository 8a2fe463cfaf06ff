"""Deterministic scale-up of the driver testdata by integer replication.

Produces an sf{0.1*N} dataset from sf0.1 by stacking N copies of every
scaling table with FK-consistent key offsets (copy r shifts each key
space by r * <key range of the base copy>), regenerating the key-bearing
name columns so name<->key stay consistent. Fixed dimensions (region,
nation) are copied unchanged, exactly like TPC-H's scale model. The
result is NOT the driver's generator output — it doesn't need to be:
the correctness gate compares Spark vs DuckDB on the SAME files, so any
schema-faithful sf1 corpus proves the 10x-scale claims (VERDICT r5
item 2). Text/embedding payloads repeat across copies, which is the
realistic hard case for the dedup/ANN family (every doc gains 9 exact
clones).

Usage: python tools/make_scaled_testdata.py [N] [out_dir]
Defaults: N=10, out_dir=<repo>/.scratch/sf1. Idempotent (skips tables
whose output already exists with the expected row count).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"

# table -> {column: offset-unit} ; offset-unit = rows of the base table
# that owns the key space (so copy r adds r * unit to the key).
KEY_UNITS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED = ("region", "nation")

# key-derived name columns regenerated so the embedded id matches the
# shifted key (TPC-H convention: Name#%09d).
NAME_COLS = {
    "customer": ("c_name", "c_custkey", "Customer#"),
    "supplier": ("s_name", "s_suppkey", "Supplier#"),
}


def scaled_table(name: str, n_copies: int) -> pa.Table:
    base = pq.read_table(os.path.join(BASE, f"{name}.parquet"))
    copies = []
    for r in range(n_copies):
        t = base
        for col, unit in KEY_UNITS.get(name, {}).items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(r * unit, t.schema.field(col).type))
            t = t.set_column(idx, t.schema.field(col), shifted.cast(t.schema.field(col).type))
        if name in NAME_COLS:
            name_col, key_col, prefix = NAME_COLS[name]
            idx = t.schema.get_field_index(name_col)
            keys = t.column(key_col).to_pylist()
            names = pa.array([f"{prefix}{k:09d}" for k in keys], pa.string())
            t = t.set_column(idx, t.schema.field(name_col), names)
        copies.append(t)
    return pa.concat_tables(copies)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    for name in FIXED + tuple(KEY_UNITS):
        dst = os.path.join(out, f"{name}.parquet")
        src = os.path.join(BASE, f"{name}.parquet")
        want = pq.read_metadata(src).num_rows * (1 if name in FIXED else n)
        if os.path.exists(dst) and pq.read_metadata(dst).num_rows == want:
            print(f"skip  {name} ({want} rows, exists)")
            continue
        table = (
            pq.read_table(src) if name in FIXED else scaled_table(name, n)
        )
        # Row groups sized so Spark/DuckDB can split a single-file table
        # across tasks (the base files are one row group, which pins any
        # scan-partitioned stage to one task — a measured sf1 hazard for
        # the pair-stage operators). At least ~32 groups per scaling
        # table, capped at 256k rows per group.
        rg = max(1024, min(262_144, table.num_rows // 32))
        pq.write_table(table, dst, row_group_size=rg)
        print(f"wrote {name} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
