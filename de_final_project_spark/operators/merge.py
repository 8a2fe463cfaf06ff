"""Keyed MERGE (upsert) into a parquet gold table.

The reference's only write semantics are full overwrite (warehouse K3,
src/warehousing_lambda.py:64-71) and blind append (lake K1). A real
warehouse needs the third: merge a delta into a keyed table — update
matched keys, insert new ones. Without a transactional table format this
is the classic copy-on-write merge:

    new = delta ∪ (current ⟵anti-join⟶ delta keys)

i.e. keep every current row whose key is NOT in the delta, add all delta
rows, rewrite. The delta key set is dimension-sized in incremental use,
so the anti join broadcasts and the current table streams through one
narrow stage — cost is O(|current|) rewrite, the same as any
copy-on-write merge (Delta/Iceberg reduce it to touched-file rewrite;
this is the format-free equivalent with whole-table granularity).

Write safety: the rewrite goes to a temp directory first and swaps in
via atomic rename, so a failed merge never truncates the table.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    delta: DataFrame,
    keys: Sequence[str],
) -> None:
    """Upsert ``delta`` into the parquet table at ``table_path`` by key.
    Delta rows win on key collision; delta must be unique per key
    (pre-dedup with keep_latest)."""
    keys = list(keys)
    if os.path.exists(table_path):
        current = spark.read.parquet(table_path)
        delta_keys = F.broadcast(delta.select(*keys).distinct())
        survivors = current.join(delta_keys, keys, "left_anti")
        merged = survivors.unionByName(delta)
    else:
        merged = delta

    tmp = f"{table_path}__merge_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{table_path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(tmp, table_path)
    if os.path.exists(old):
        shutil.rmtree(old)
