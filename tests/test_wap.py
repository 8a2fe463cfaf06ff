"""Write-audit-publish on VersionedTable (txlog.stage_wap /
read_wap / publish_wap / discard_wap): the isolation and concurrency
contracts the driver query can't exercise alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators.txlog import (
    ConcurrentWriteError,
    ConstraintViolationError,
    VersionedTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, s string, pb long")


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"), partition_col="pb")
    t.overwrite(_mk(spark, [(1, "a", 0), (2, "b", 1)]))
    return t


def test_staged_invisible_everywhere(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0)]), "w1")
    # normal read, time travel AT the stage version, and the change
    # feed all show nothing
    assert table.read(spark).count() == 2
    assert table.read(spark, version=v).count() == 2
    # change feed: a stage commit changes no live partition, which the
    # feed reports as the documented empty-window error
    with pytest.raises(ValueError, match="share every live partition"):
        table.read_changes(spark, ["id"], v - 1, v)
    # the audit view shows history + staged rows
    assert table.read_wap(spark, v, "w1").count() == 3


def test_publish_folds_and_is_idempotent(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0), (4, "d", 2)]), "w1")
    p1 = table.publish_wap(spark, v, "w1")
    got = {(r.id, r.s) for r in table.read(spark).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    # crash-retry replay: no second commit, state unchanged
    p2 = table.publish_wap(spark, v, "w1")
    assert p2 == p1 == table.latest_version()
    # the publish surfaces in the change feed as plain inserts
    feed = table.read_changes(spark, ["id"], p1 - 1, p1)
    assert {(r.id, r["_change_type"]) for r in feed.collect()} == {
        (3, "insert"),
        (4, "insert"),
    }


def test_publish_survives_concurrent_appends(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0)]), "w1")
    table.append(_mk(spark, [(9, "z", 0)]))  # same partition, fine
    table.merge(spark, _mk(spark, [(2, "B", 1)]), ["id"])
    table.publish_wap(spark, v, "w1")
    got = {(r.id, r.s) for r in table.read(spark).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (9, "z")}


def test_publish_conflicts_with_snapshot_replacement(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0)]), "w1")
    table.overwrite(_mk(spark, [(7, "q", 0)]))
    with pytest.raises(ConcurrentWriteError, match="re-stage"):
        table.publish_wap(spark, v, "w1")


def test_discard_blocks_publish(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0)]), "w1")
    table.discard_wap(spark, v, "w1")
    assert table.read(spark).count() == 2
    with pytest.raises(ValueError, match="discarded"):
        table.publish_wap(spark, v, "w1")


def test_publish_after_publish_of_other_wap(spark, table):
    va = table.stage_wap(_mk(spark, [(3, "c", 0)]), "wa")
    vb = table.stage_wap(_mk(spark, [(4, "d", 1)]), "wb")
    table.publish_wap(spark, va, "wa")
    table.publish_wap(spark, vb, "wb")
    assert table.read(spark).count() == 4


def test_wrong_handle_rejected(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0)]), "w1")
    with pytest.raises(ValueError, match="not a staged WAP"):
        table.read_wap(spark, v, "other")
    with pytest.raises(ValueError, match="not a staged WAP"):
        table.publish_wap(spark, v - 1, "w1")


def test_constraints_enforced_at_stage_time(spark, tmp_path):
    t = VersionedTable(
        str(tmp_path / "t"),
        partition_col="pb",
        constraints={"pos_id": "id > 0"},
    )
    t.overwrite(_mk(spark, [(1, "a", 0)]))
    with pytest.raises(ConstraintViolationError):
        t.stage_wap(_mk(spark, [(-5, "bad", 0)]), "w1")


def test_vacuum_keeps_staged_files(spark, table):
    v = table.stage_wap(_mk(spark, [(3, "c", 0)]), "w1")
    table.append(_mk(spark, [(9, "z", 0)]))
    removed = table.vacuum(retain_versions=10, retention_seconds=0)
    assert removed == []
    # audit still readable (pinned at the STAGE-TIME snapshot: 2
    # history rows + 1 staged; the later append is not its business),
    # publish still folds real files
    assert table.read_wap(spark, v, "w1").count() == 3
    table.publish_wap(spark, v, "w1")
    assert {r.id for r in table.read(spark).collect()} == {1, 2, 3, 9}


def test_tombstones_do_not_gate_published_rows(spark, table):
    """A key-delete BETWEEN stage and publish must not swallow the
    published rows (their pointers stamp the publish version)."""
    v = table.stage_wap(_mk(spark, [(2, "again", 1)]), "w1")
    table.delete_where(spark, "id = 2", mode="mor")
    assert table.read(spark).count() == 1
    table.publish_wap(spark, v, "w1")
    got = {(r.id, r.s) for r in table.read(spark).collect()}
    assert got == {(1, "a"), (2, "again")}
