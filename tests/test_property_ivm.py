"""Property-based test: an IncrementalAggView refreshed after EVERY
step of an arbitrary DML sequence must equal a sequential Python
reference model of the final aggregate — the maintenance invariant
under adversarial op interleavings (append / COW delete / MOR delete /
MOR update, group creation, group vanishing, NULL values), for both
strategies (delta COUNT/SUM and rescan MIN/COUNT DISTINCT). Examples
are deliberately few (each costs real commits); the value is the
shape coverage, not volume."""

from __future__ import annotations

import os
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_final_project_spark.operators.ivm import IncrementalAggView
from de_final_project_spark.operators.txlog import VersionedTable

# ops: ("append", rows) | ("delete", mod, rem, mode) | ("update", mod,
# rem, add). Predicates are id-modulus so the reference model is exact.
_row = st.tuples(
    st.integers(min_value=0, max_value=30),
    st.sampled_from(["a", "b", "c"]),
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
)


def _rows(min_size=1):
    return st.lists(_row, min_size=min_size, max_size=6, unique_by=lambda r: r[0])


_op = st.one_of(
    st.tuples(st.just("append"), _rows(min_size=0)),
    st.tuples(
        st.just("delete"),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["cow", "mor"]),
    ),
    st.tuples(
        st.just("update"),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=1, max_value=7),
    ),
)


def _reference(state: dict) -> dict:
    """state: id -> (g, v). Returns g -> (cnt, sum, min, n_distinct,
    nn, sum_sq) — the last two feed the moments (avg/var_pop) model."""
    out: dict = {}
    for g, v in state.values():
        c, s, m, d, nn, s2 = out.get(g, (0, None, None, set(), 0, 0))
        c += 1
        if v is not None:
            s = v if s is None else s + v
            m = v if m is None else min(m, v)
            d = d | {v}
            nn += 1
            s2 += v * v
        out[g] = (c, s, m, d, nn, s2)
    return {
        g: (c, s, m, len(d), nn, s2)
        for g, (c, s, m, d, nn, s2) in out.items()
    }


def _moments(nn: int, s, s2) -> tuple:
    """The exact-moments read formula, replayed in Python floats — the
    same IEEE op sequence IncrementalAggView.read() generates, so the
    comparison is bit-exact."""
    if nn == 0:
        return (None, None)
    avg = float(s) / nn
    return (avg, float(s2) / nn - avg * avg)


@given(initial=_rows(), ops=st.lists(_op, min_size=1, max_size=3))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ivm_matches_reference_through_dml(
    spark, tmp_path_factory, initial, ops
):
    root = str(tmp_path_factory.mktemp("ivm"))
    base = VersionedTable(os.path.join(root, "base"), partition_col="pb")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(i, g, float(v) if v is not None else None, i % 2) for i, g, v in rows],
        "id long, g string, v double, pb long",
    )
    base.overwrite(mk(initial))
    delta_view = IncrementalAggView(
        base,
        os.path.join(root, "mv_delta"),
        keys=["id"],
        group_by=["g"],
        aggs={"cnt": ("count", ""), "sv": ("sum", "CAST(v AS DECIMAL(12,2))")},
    )
    rescan_view = IncrementalAggView(
        base,
        os.path.join(root, "mv_rescan"),
        keys=["id"],
        group_by=["g"],
        aggs={"mn": ("min", "v"), "nd": ("count_distinct", "v")},
    )
    moments_view = IncrementalAggView(
        base,
        os.path.join(root, "mv_moments"),
        keys=["id"],
        group_by=["g"],
        aggs={
            "av": ("avg", "CAST(v AS DECIMAL(12,2))"),
            "vr": ("var_pop", "CAST(v AS DECIMAL(12,2))"),
        },
    )
    state = {i: (g, v) for i, g, v in initial}
    delta_view.refresh(spark)
    rescan_view.refresh(spark)
    moments_view.refresh(spark)
    for op in ops:
        if op[0] == "append":
            fresh = [r for r in op[1] if r[0] not in state]
            if not fresh:
                continue
            base.append(mk(fresh))
            for i, g, v in fresh:
                state[i] = (g, v)
        elif op[0] == "delete":
            _, mod, rem, mode = op
            if not any(i % mod == rem for i in state):
                continue
            base.delete_where(spark, f"id % {mod} = {rem}", mode=mode)
            state = {i: gv for i, gv in state.items() if i % mod != rem}
        else:
            _, mod, rem, add = op
            if not any(i % mod == rem for i in state):
                continue
            base.update_where(
                spark,
                f"id % {mod} = {rem}",
                {"v": F.col("v") + add},
                mode="mor",
            )
            state = {
                i: (g, (v + add) if (i % mod == rem and v is not None) else v)
                for i, (g, v) in state.items()
            }
        r1 = delta_view.refresh(spark)
        r2 = rescan_view.refresh(spark)
        r3 = moments_view.refresh(spark)
        assert r1["mode"] in ("delta", "noop")
        assert r2["mode"] in ("rescan", "noop")
        assert r3["mode"] in ("delta", "noop")  # moments are delta kinds
    want = _reference(state)
    if not state:
        return  # every row deleted: the empty-view read is pinned elsewhere
    got_d = {
        r["g"]: (r["cnt"], None if r["sv"] is None else Decimal(r["sv"]))
        for r in delta_view.read(spark).collect()
    }
    got_r = {
        r["g"]: (r["mn"], r["nd"])
        for r in rescan_view.read(spark).collect()
    }
    got_m = {
        r["g"]: (r["av"], r["vr"])
        for r in moments_view.read(spark).collect()
    }
    assert got_d == {
        g: (c, None if s is None else Decimal(s).quantize(Decimal("0.01")))
        for g, (c, s, m, d, nn, s2) in want.items()
    }, f"delta diverged: state={state}"
    assert got_r == {
        g: (None if m is None else float(m), d)
        for g, (c, s, m, d, nn, s2) in want.items()
    }, f"rescan diverged: state={state}"
    assert got_m == {
        g: _moments(nn, s, s2)
        for g, (c, s, m, d, nn, s2) in want.items()
    }, f"moments diverged: state={state}"


# ---------------------------------------------------------- join view
# fact ops: ("fappend", rows) | ("fdelete", mod, rem) — dim ops:
# ("dmove", mod, rem, grp) | ("ddelete", mod, rem) | ("dappend", keys)
_fact_row = st.tuples(
    st.integers(min_value=0, max_value=24),      # id
    st.integers(min_value=0, max_value=6),       # k (dim key, some missing)
    st.integers(min_value=-4, max_value=4),      # v
)
_join_op = st.one_of(
    st.tuples(
        st.just("fappend"),
        st.lists(_fact_row, min_size=0, max_size=4, unique_by=lambda r: r[0]),
    ),
    st.tuples(
        st.just("fdelete"),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=0, max_value=3),
    ),
    st.tuples(
        st.just("dmove"),
        st.integers(min_value=2, max_value=3),
        st.integers(min_value=0, max_value=2),
        st.sampled_from(["gx", "gy"]),
    ),
    st.tuples(
        st.just("ddelete"),
        st.integers(min_value=2, max_value=3),
        st.integers(min_value=0, max_value=2),
    ),
)


def _join_reference(facts: dict, dims: dict) -> dict:
    out: dict = {}
    for _, (k, v) in facts.items():
        if k in dims:
            g = dims[k]
            c, s = out.get(g, (0, 0))
            out[g] = (c + 1, s + v)
    return out


@given(
    initial=st.lists(
        _fact_row, min_size=1, max_size=6, unique_by=lambda r: r[0]
    ),
    ops=st.lists(_join_op, min_size=1, max_size=3),
    refresh_every=st.booleans(),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_view_matches_reference_through_dml(
    spark, tmp_path_factory, initial, ops, refresh_every
):
    """The two-term identity under arbitrary fact/dim interleavings —
    with refresh_every=False several ops land in ONE window, covering
    simultaneous two-sided churn (the no-cross-term case)."""
    from de_final_project_spark.operators.ivm import IncrementalJoinAggView

    root = str(tmp_path_factory.mktemp("ivmj"))
    fact = VersionedTable(os.path.join(root, "fact"), partition_col="pb")
    mkf = lambda rows: spark.createDataFrame(  # noqa: E731
        [(i, k, float(v), i % 2) for i, k, v in rows],
        "id long, k long, v double, pb long",
    )
    fact.overwrite(mkf(initial))
    dims = {k: f"g{k % 3}" for k in range(5)}  # keys 5,6 start missing
    dim = VersionedTable(os.path.join(root, "dim"))
    dim.overwrite(
        spark.createDataFrame(
            [(k, g) for k, g in dims.items()], "k long, grp string"
        )
    )
    view = IncrementalJoinAggView(
        fact,
        dim,
        os.path.join(root, "mv"),
        fact_keys=["id"],
        dim_keys=["k"],
        on=("k", "k"),
        group_by=["grp"],
        aggs={"cnt": ("count", ""), "sv": ("sum", "CAST(v AS DECIMAL(12,2))")},
    )
    facts = {i: (k, v) for i, k, v in initial}
    view.refresh(spark)
    for op in ops:
        if op[0] == "fappend":
            fresh = [r for r in op[1] if r[0] not in facts]
            if fresh:
                fact.append(mkf(fresh))
                for i, k, v in fresh:
                    facts[i] = (k, v)
        elif op[0] == "fdelete":
            _, mod, rem = op
            if any(i % mod == rem for i in facts):
                fact.delete_where(spark, f"id % {mod} = {rem}", mode="mor")
                facts = {i: kv for i, kv in facts.items() if i % mod != rem}
        elif op[0] == "dmove":
            _, mod, rem, grp = op
            if any(k % mod == rem for k in dims):
                dim.update_where(
                    spark, f"k % {mod} = {rem}", {"grp": f"'{grp}'"},
                    mode="mor",
                )
                dims = {
                    k: (grp if k % mod == rem else g)
                    for k, g in dims.items()
                }
        else:
            _, mod, rem = op
            if any(k % mod == rem for k in dims):
                dim.delete_where(spark, f"k % {mod} = {rem}", mode="mor")
                dims = {k: g for k, g in dims.items() if k % mod != rem}
        if refresh_every:
            view.refresh(spark)
    view.refresh(spark)
    want = _join_reference(facts, dims)
    got = {
        r["grp"]: (r["cnt"], int(r["sv"]))
        for r in view.read(spark).collect()
    }
    assert got == {g: (c, s) for g, (c, s) in want.items()}, (
        f"facts={facts} dims={dims} refresh_every={refresh_every}"
    )
