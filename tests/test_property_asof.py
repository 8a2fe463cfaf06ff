"""Property-based test: asof_join_backward must equal the sequential
per-row spec — for every left row, the right row with the same key, max
timestamp <= left ts, ties resolved by max tiebreak — on arbitrary
inputs including duplicate timestamps and empty right sides."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from de_final_project_spark.operators.asof import asof_join_backward

_EPOCH = datetime(2024, 1, 1)


def _ts(minutes: int) -> datetime:
    return _EPOCH + timedelta(minutes=minutes)


left_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key (few -> collisions)
        st.integers(min_value=0, max_value=10),  # ts minutes
    ),
    min_size=1,
    max_size=15,
)
right_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=10),  # ts minutes
        st.integers(min_value=0, max_value=99),  # payload value
    ),
    min_size=0,
    max_size=15,
)


def _reference_asof(left_rows, right_rows):
    out = []
    for i, (k, lt) in enumerate(left_rows):
        cands = [
            (rt, rid, val)
            for rid, (rk, rt, val) in enumerate(right_rows)
            if rk == k and rt <= lt
        ]
        # max ts, then max tiebreak id
        val = max(cands)[2] if cands else None
        out.append((i, k, lt, val))
    return sorted(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_strategy, right=right_strategy)
def test_asof_matches_sequential_spec(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), v, rid) for rid, (k, t, v) in enumerate(right)],
        "k long, ts timestamp, val long, rid long",
    ) if right else spark.createDataFrame([], "k long, ts timestamp, val long, rid long")
    got = sorted(
        (r["lid"], r["k"], r["ts"].replace(tzinfo=None), r["val"])
        for r in asof_join_backward(
            ldf, rdf, ["k"], "ts", ["val"], tiebreak_col="rid"
        ).collect()
    )
    want = sorted(
        (i, k, _ts(t), val) for i, k, t, val in _reference_asof(left, right)
    )
    assert got == want
