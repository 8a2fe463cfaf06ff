"""readStream-native change-feed source (streaming/change_source.py):
version offsets, per-version task assembly, Arrow executor reads,
restart-resume from the streaming checkpoint, steady-state admission
control, and fail-fast on commits that carry no row-level evidence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators.txlog import VersionedTable
from de_final_project_spark.streaming.change_source import (
    ChangeFeedStreamReader,
    read_change_feed,
    version_tasks,
)


def _mk(spark, data):
    return spark.createDataFrame(
        data, "id long, s string, ts timestamp, pb int"
    )


def _ts(spark):
    return F.to_timestamp(F.lit("2024-01-01 00:00:00"))


def _seed(spark, tmp_path, name="t"):
    """v1 overwrite (2 partitions), v2 append, v3 MOR update, v4 MOR
    delete — one committed version per supported change kind."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t = VersionedTable(str(tmp_path / name), partition_col="pb")
    t.overwrite(
        _mk(spark, [(1, "a", t0, 0), (2, "b", t0, 1), (3, "c", t0, 0)])
    )
    t.append(_mk(spark, [(4, "d", t0, 1)]))
    t.update_where(spark, "id = 2", {"s": "'B'"}, mode="mor")
    t.delete_where(spark, "id = 3", mode="mor")
    return t


def test_version_tasks_kinds(spark, tmp_path):
    t = _seed(spark, tmp_path)
    kinds = {
        v: sorted(
            task["kind"] for task in version_tasks(t, t._read_entry(v))
        )
        for v in range(1, 5)
    }
    assert set(kinds[1]) == {"insert"}
    assert kinds[2] == ["insert"]
    assert set(kinds[3]) == {"update_preimage", "update_postimage"}
    assert kinds[4] == ["delete"]
    # content-preserving rewrites emit nothing
    v5 = t.compact_partitions(spark, min_files=1)
    assert version_tasks(t, t._read_entry(v5)) == []


def test_unsupported_cow_commit_fails_fast(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    t = VersionedTable(str(tmp_path / "t"), partition_col="pb")
    t.overwrite(_mk(spark, [(1, "a", t0, 0)]))
    v = t.merge(spark, _mk(spark, [(1, "A", t0, 0)]), ["id"])
    with pytest.raises(ValueError, match="no row-level"):
        version_tasks(t, t._read_entry(v))


def _run_stream(spark, path, ckpt, sink):
    q = (
        read_change_feed(spark, path)
        .writeStream.foreachBatch(
            lambda df, bid: sink.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_emits_exact_change_rows(spark, tmp_path):
    """End-to-end over all four change kinds: the emitted rows are the
    exact CDC content (old images for deletes/preimages, new images for
    inserts/postimages, partition value reconstructed, versions
    stamped)."""
    t = _seed(spark, tmp_path)
    rows: list = []
    _run_stream(spark, t.path, str(tmp_path / "ck"), rows)
    got = {
        (r["id"], r["s"], r["pb"], r["_change_type"], r["_commit_version"])
        for r in rows
    }
    assert got == {
        (1, "a", "0", "insert", 1),
        (2, "b", "1", "insert", 1),
        (3, "c", "0", "insert", 1),
        (4, "d", "1", "insert", 2),
        (2, "b", "1", "update_preimage", 3),
        (2, "B", "1", "update_postimage", 3),
        (3, "c", "0", "delete", 4),
    }
    # timestamps survive the arrow round-trip with exact values
    assert all(
        r["ts"].isoformat() == "2024-01-01T00:00:00" for r in rows
    )


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop after consuming v1-4, commit more DML, restart on the SAME
    checkpoint: only the new versions arrive (Structured Streaming
    offset tracking, no consumer-side sidecar)."""
    t = _seed(spark, tmp_path)
    ckpt = str(tmp_path / "ck")
    first: list = []
    _run_stream(spark, t.path, ckpt, first)
    assert {r["_commit_version"] for r in first} == {1, 2, 3, 4}
    t.delete_where(spark, "id = 1", mode="mor")  # v5
    t.append(
        _mk(
            spark,
            [(9, "z", __import__("datetime").datetime(2024, 1, 2), 0)],
        )
    )  # v6
    second: list = []
    _run_stream(spark, t.path, ckpt, second)
    got = {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in second
    }
    assert got == {(1, "delete", 5), (9, "insert", 6)}


def test_admission_control_offsets(spark, tmp_path):
    """Steady-state rate limiting: the first trigger of a reader
    instance reports everything pending (availableNow target / restart
    safety), subsequent triggers advance at most maxVersionsPerTrigger
    versions."""
    t = _seed(spark, tmp_path)  # head = 4
    r = ChangeFeedStreamReader(
        {"path": t.path, "maxversionspertrigger": "1"}
    )
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 4}  # first: uncapped
    t.delete_where(spark, "id = 4", mode="mor")  # 5
    t.delete_where(spark, "id = 2", mode="mor")  # 6
    t.append(
        _mk(
            spark,
            [(8, "y", __import__("datetime").datetime(2024, 1, 3), 0)],
        )
    )  # 7
    assert r.latestOffset() == {"version": 5}
    assert r.latestOffset() == {"version": 6}
    assert r.latestOffset() == {"version": 7}
    assert r.latestOffset() == {"version": 7}
    parts = r.partitions({"version": 4}, {"version": 6})
    assert [p.version for p in parts] == [5, 6]


def test_gold_table_idempotent_replay(spark, tmp_path):
    """A fresh-checkpoint re-run over already-consumed versions must
    not duplicate or corrupt the gold table: merges carry
    txn=(consumer, version) stamps and key-tombstone deletes are
    naturally idempotent — the effectively-once composition."""
    t = _seed(spark, tmp_path)
    gold_dir = str(tmp_path / "gold")

    def apply(batch_df, bid):
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        gold = VersionedTable(gold_dir, partition_col="pb2")
        for v in sorted(
            r[0]
            for r in batch_df.select("_commit_version").distinct().collect()
        ):
            sub = batch_df.where(F.col("_commit_version") == v)
            ups = (
                sub.where(
                    F.col("_change_type").isin(
                        "insert", "update_postimage"
                    )
                )
                .drop("_change_type", "_commit_version", "pb")
                .withColumn("pb2", (F.col("id") % 2).cast("int"))
            )
            if ups.limit(1).count():
                gold.merge(s, ups, ["id"], txn=("gold", v))
            dels = (
                sub.where(F.col("_change_type") == "delete")
                .select("id")
                .distinct()
            )
            if dels.limit(1).count():
                gold.delete_keys(s, dels)

    for ck in ("ck1", "ck2"):  # second run = full replay, fresh offsets
        q = (
            read_change_feed(spark, t.path)
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    gold = VersionedTable(gold_dir, partition_col="pb2")
    got = {r["id"]: r["s"] for r in gold.read(spark).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_stream_resolves_column_mapping_logical_names(spark, tmp_path):
    """A stream over a RENAMED table emits the head's LOGICAL names
    (files keep physical names; the reader resolves the mapping frozen
    at start), including history from BEFORE the rename and the
    renamed partition column."""
    t = _seed(spark, tmp_path, "cm")
    t.rename_column(spark, "s", "label")
    t.rename_column(spark, "pb", "bucket")
    rows: list = []
    _run_stream(spark, t.path, str(tmp_path / "cm_ck"), rows)
    assert rows and set(rows[0].asDict()) == {
        "id", "label", "ts", "bucket", "_change_type", "_commit_version"
    }
    got = {
        (r["id"], r["label"], r["bucket"], r["_change_type"])
        for r in rows
    }
    assert (2, "B", "1", "update_postimage") in got
    assert (3, "c", "0", "delete") in got


def test_stream_fails_on_mid_stream_rename(spark, tmp_path):
    """A RENAME committed after the stream started must fail the next
    trigger (the output schema was resolved at start) instead of
    silently emitting stale names — Delta's restart-to-adopt rule."""
    t = _seed(spark, tmp_path, "cm_mid")
    reader = ChangeFeedStreamReader({"path": t.path})
    # consume the existing history, then rename mid-stream
    head = {"version": t.latest_version()}
    reader.partitions({"version": 0}, head)
    t.rename_column(spark, "s", "label")
    import datetime as dt

    t.append(_mk(spark, [(9, "z", dt.datetime(2024, 1, 2), 0)]).withColumnRenamed("s", "label"))
    with pytest.raises(ValueError, match="mid-stream"):
        reader.partitions(head, {"version": t.latest_version()})
