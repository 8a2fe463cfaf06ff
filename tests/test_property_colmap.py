"""Property-based test for the column-mapping predicate translator:
for ARBITRARY conjunctive/disjunctive predicates written in LOGICAL
names over a table that went through a rename chain that REBINDS a
freed name (s -> s_old, then a NEW logical s on a fresh physical), the
translated predicate evaluated against the physical frame must select
exactly the rows the logical predicate selects on the logical frame.
This is the sequential-substitution corruption case: replacing one
name at a time would rewrite the output of an earlier replacement.
The check is pure Python + one Spark frame built once; each drawn
predicate costs two tiny filters."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_final_project_spark.operators.txlog import VersionedTable

_STATE: dict = {}


@pytest.fixture(scope="module")
def mapped_table(spark, tmp_path_factory):
    if _STATE:
        return _STATE
    path = str(tmp_path_factory.mktemp("prop_cm") / "t")
    df = spark.createDataFrame(
        [(i, f"w{i % 5}", i % 7) for i in range(200)],
        "id long, s string, v int",
    )
    t = VersionedTable(path)
    t.overwrite(df.coalesce(2))
    # rename chain that frees and rebinds the name 's':
    # logical s_old -> physical s; new logical s -> physical s__p1
    t.rename_column(spark, "s", "s_old")
    t.merge(
        spark,
        spark.createDataFrame(
            [(i, f"w{i % 5}", i % 7, f"n{i % 3}") for i in range(200)],
            "id long, s_old string, v int, s string",
        ),
        ["id"],
        merge_schema=True,
    )
    head = t._read_entry(t.latest_version())
    cmap = head["colmap"]
    assert cmap["s_old"] == "s" and cmap["s"] not in ("s", "s_old")
    _STATE["t"] = t
    _STATE["entry"] = head
    _STATE["logical"] = t.read(spark).persist()
    # the physical frame: raw snapshot without the rename boundary
    _STATE["physical"] = t._read_snapshot(
        spark, head["live"], head
    ).persist()
    return _STATE


_COLS = ["id", "s_old", "s", "v"]
_lit = {
    "id": st.integers(0, 220),
    "v": st.integers(-1, 8),
    "s_old": st.sampled_from([f"w{i}" for i in range(6)] + ["s", "s_old"]),
    "s": st.sampled_from([f"n{i}" for i in range(4)] + ["s", "s_old"]),
}


@st.composite
def predicate(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        c = draw(st.sampled_from(_COLS))
        op = draw(st.sampled_from(["=", "<", ">", "<=", ">=", "<>"]))
        v = draw(_lit[c])
        lit = f"'{v}'" if isinstance(v, str) else str(v)
        parts.append(f"{c} {op} {lit}")
    glue = draw(st.sampled_from([" AND ", " OR "]))
    return glue.join(parts)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_translated_predicate_selects_identical_rows(
    spark, mapped_table, pred
):
    t = mapped_table["t"]
    entry = mapped_table["entry"]
    phys_pred = t._predicate_to_physical(pred, t._colmap_state(entry))
    want = {
        r["id"]
        for r in mapped_table["logical"].where(F.expr(pred)).collect()
    }
    got = {
        r["id"]
        for r in mapped_table["physical"]
        .where(F.expr(phys_pred))
        .collect()
    }
    assert got == want
    # and the end-to-end read(where=...) path agrees (pruning included)
    got_read = {
        r["id"] for r in t.read(spark, where=pred).collect()
    }
    assert got_read == want
