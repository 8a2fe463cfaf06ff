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


def merged_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable end-to-end exercise of ``merge_upsert``: build a
    keyed user snapshot from the first half of the events table (by
    event_id, cut at the id midpoint), then MERGE the second half's
    snapshot in — delta rows replace matched users, unmatched users
    survive. The returned table is read back from the parquet the merge
    actually rewrote, so the anti-join/union/atomic-swap machinery is in
    the checked path, not just the arithmetic. ``from_delta`` records
    which side won each key, pinning the merge decision row-by-row.

    The oracle restates the post-state relationally: per user, the
    latest event of the delta half if one exists, else the latest of the
    base half (ties broken by event_id, same total order as
    keep_latest). At scale the cost is the documented copy-on-write
    bound — one broadcast anti-join over the current table."""
    import tempfile

    from de_final_project_spark.operators.dedup import keep_latest
    from de_final_project_spark.sources.readers import read_testdata

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    cut = (lo + hi) // 2  # control-plane scalar: deterministic id midpoint
    snap = lambda df, flag: keep_latest(  # noqa: E731
        df, "user_id", ["ts", "event_id"]
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        "value",
        F.lit(flag).alias("from_delta"),
    )
    base = snap(ev.where(F.col("event_id") <= cut), False)
    delta = snap(ev.where(F.col("event_id") > cut), True)
    path = os.path.join(
        tempfile.mkdtemp(prefix="merge_snapshot_"), "user_snapshot"
    )
    merge_upsert(spark, path, base, ["user_id"])
    merge_upsert(spark, path, delta, ["user_id"])
    return spark.read.parquet(path)


MERGED_USER_SNAPSHOT_SQL = """
WITH c AS (
  SELECT (min(event_id) + max(event_id)) // 2 AS cut FROM events
), halves AS (
  SELECT e.event_id, e.user_id, e.event_type, e.ts, e.value,
         (e.event_id > c.cut) AS from_delta
  FROM events e, c
), latest AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id, from_delta
           ORDER BY ts DESC, event_id DESC) AS rk
  FROM halves
), pick AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY from_delta DESC) AS mrk
  FROM latest WHERE rk = 1
)
SELECT user_id, event_id, event_type, ts, value, from_delta
FROM pick WHERE mrk = 1
"""
