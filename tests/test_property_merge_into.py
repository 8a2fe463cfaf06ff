"""Property-based test: ``VersionedTable.merge_into`` must equal a
sequential Python reference model of the WHEN-clause grammar for
arbitrary small target/source frames and clause combinations — update
condition, delete condition, insert condition, clause precedence, and
the NULL-is-not-satisfied discipline all fall out of the comparison.
Examples are deliberately few (each costs real commits); the value is
the adversarial shape coverage, not volume."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from de_final_project_spark.operators.txlog import VersionedTable

_spark = None


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),                 # id (collisions)
        st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),  # v
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],  # MERGE requires key-unique frames
)


def _reference(target, source, upd_thresh, del_val, ins_min):
    """The WHEN grammar, sequentially: UPDATE v = s.v when s.v > thresh
    (NULL not satisfied); else DELETE when t.v = del_val (NULL not
    satisfied); unmatched source INSERTs when s.v >= ins_min."""
    out = dict(target)
    src = dict(source)
    for k, tv in target.items():
        if k in src:
            sv = src[k]
            if sv is not None and sv > upd_thresh:
                out[k] = sv
            elif tv is not None and tv == del_val:
                del out[k]
    for k, sv in src.items():
        if k not in target and sv is not None and sv >= ins_min:
            out[k] = sv
    return out


@given(
    target=rows_strategy,
    source=rows_strategy,
    upd_thresh=st.integers(min_value=-2, max_value=2),
    del_val=st.integers(min_value=-2, max_value=2),
    ins_min=st.integers(min_value=-2, max_value=2),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_into_matches_reference_model(
    spark, tmp_path_factory, target, source, upd_thresh, del_val, ins_min
):
    global _spark
    _spark = spark
    if not target:
        return  # first-commit path is pinned by unit tests
    base = tmp_path_factory.mktemp("mi")
    t = VersionedTable(os.path.join(str(base), "t"), partition_col="pb")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(k, v, k % 2) for k, v in rows], "id long, v long, pb int"
    )
    t.overwrite(mk(target))
    t.merge_into(
        spark,
        mk(source),
        ["id"],
        matched_update={"v": "s.v"},
        matched_update_condition=f"s.v > {upd_thresh}",
        matched_delete_condition=f"t.v = {del_val}",
        insert_condition=f"s.v >= {ins_min}",
    )
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    want = _reference(
        dict(target), dict(source), upd_thresh, del_val, ins_min
    )
    assert got == want, (
        f"target={target} source={source} "
        f"upd>{upd_thresh} del={del_val} ins>={ins_min}"
    )
