"""Multi-table atomic transactions (operators/catalog_txn.py): the
concurrency and isolation contracts beyond the driver query's happy
path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators.catalog_txn import (
    MultiTableTransaction,
    TransactionalCatalog,
)
from de_final_project_spark.operators.txlog import (
    ConcurrentWriteError,
    VersionedTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


@pytest.fixture()
def cat(spark, tmp_path):
    c = TransactionalCatalog(str(tmp_path))
    c.register("a", VersionedTable(str(tmp_path / "a")))
    c.register("b", VersionedTable(str(tmp_path / "b")))
    t = MultiTableTransaction(c)
    t.run("a", lambda x: x.overwrite(_mk(spark, [(1, 10)])))
    t.run("b", lambda x: x.overwrite(_mk(spark, [(1, 100)])))
    t.commit()
    return c


def test_crash_before_flip_is_invisible(spark, cat):
    txn = MultiTableTransaction(cat)
    txn.run("a", lambda t: t.append(_mk(spark, [(2, 20)])))
    # "crash" here: table a's log has the append, the catalog does not
    assert cat.table("a").read(spark).count() == 2  # direct read sees it
    assert cat.read(spark, "a").count() == 1  # catalog readers do not
    # the next txn over table a simply re-pins its own result
    txn2 = MultiTableTransaction(cat)
    txn2.run("a", lambda t: t.append(_mk(spark, [(3, 30)])))
    txn2.commit()
    assert {r.id for r in cat.read(spark, "a").collect()} == {1, 2, 3}


def test_write_write_conflict_detected(spark, cat):
    t1 = MultiTableTransaction(cat)
    t2 = MultiTableTransaction(cat)
    t1.run("a", lambda t: t.append(_mk(spark, [(2, 20)])))
    t2.run("a", lambda t: t.append(_mk(spark, [(3, 30)])))
    t1.commit()
    with pytest.raises(ConcurrentWriteError, match="pin for 'a' moved"):
        t2.commit()


def test_disjoint_txns_compose(spark, cat):
    t1 = MultiTableTransaction(cat)
    t2 = MultiTableTransaction(cat)
    t1.run("a", lambda t: t.append(_mk(spark, [(2, 20)])))
    t2.run("b", lambda t: t.append(_mk(spark, [(2, 200)])))
    t1.commit()
    t2.commit()  # different table: slides through
    assert cat.read(spark, "a").count() == 2
    assert cat.read(spark, "b").count() == 2


def test_cross_table_snapshot(spark, cat):
    v1 = cat.latest_version()
    txn = MultiTableTransaction(cat)
    txn.run("a", lambda t: t.append(_mk(spark, [(2, 20)])))
    txn.run("b", lambda t: t.append(_mk(spark, [(2, 200)])))
    txn.commit()
    # time-travel the PAIR: both tables at their txn-1 pins
    assert cat.read(spark, "a", catalog_version=v1).count() == 1
    assert cat.read(spark, "b", catalog_version=v1).count() == 1
    assert cat.read(spark, "a").count() == 2


def test_guardrails(spark, cat):
    txn = MultiTableTransaction(cat)
    with pytest.raises(KeyError):
        txn.run("nope", lambda t: t.append(_mk(spark, [(9, 9)])))
    with pytest.raises(ValueError, match="empty"):
        txn.commit()
    t2 = MultiTableTransaction(cat)
    with pytest.raises(TypeError, match="committed table version"):
        t2.run("a", lambda t: None)
    with pytest.raises(FileNotFoundError, match="no catalog pin"):
        TransactionalCatalog(cat.root + "/fresh").read(spark, "a")


def test_spent_txn_refuses_reuse(spark, cat):
    txn = MultiTableTransaction(cat)
    txn.run("a", lambda t: t.append(_mk(spark, [(2, 20)])))
    txn.commit()
    with pytest.raises(RuntimeError, match="already committed"):
        txn.run("a", lambda t: t.append(_mk(spark, [(3, 30)])))
    with pytest.raises(RuntimeError, match="already committed"):
        txn.commit()


def test_consistency_invariant_never_torn(spark, cat):
    """Reader invariant sum(a.v)*10 == sum(b.v) holds at every catalog
    version even while txns land between the table logs."""
    for i in range(2, 5):
        txn = MultiTableTransaction(cat)
        txn.run("a", lambda t, i=i: t.append(_mk(spark, [(i, 10 * i)])))
        txn.run("b", lambda t, i=i: t.append(_mk(spark, [(i, 100 * i)])))
        txn.commit()
    for cv in range(1, cat.latest_version() + 1):
        sa = cat.read(spark, "a", cv).agg(F.sum("v")).first()[0]
        sb = cat.read(spark, "b", cv).agg(F.sum("v")).first()[0]
        assert sa * 10 == sb, (cv, sa, sb)
