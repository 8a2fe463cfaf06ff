"""Property-based test: keep_latest must equal a sequential reference
implementation for arbitrary inputs (SURVEY.md §7.4 risk 3 — the total
order replacing pandas positional keep='last')."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from de_final_project_spark.operators.dedup import keep_latest

_spark = None  # hypothesis can't take pytest fixtures through @given


def _get_spark(spark):
    global _spark
    _spark = spark
    return spark


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (few -> collisions)
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # ver
        st.text(alphabet="abc", min_size=0, max_size=2),  # payload
    ),
    min_size=1,
    max_size=30,
)


def _reference_keep_latest(rows):
    """Sequential spec: per key, max by (ver desc nulls-last, payload desc)."""
    best = {}
    for k, ver, payload in rows:
        rank = ((ver is not None, ver if ver is not None else 0), payload)
        if k not in best or rank > best[k][0]:
            best[k] = (rank, (k, ver, payload))
    return sorted(v[1] for v in best.values())


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_keep_latest_matches_reference(spark, rows):
    _get_spark(spark)
    df = spark.createDataFrame(rows, "k int, ver int, payload string")
    got = sorted(
        (r.k, r.ver, r.payload) for r in keep_latest(df, "k", "ver").collect()
    )
    assert got == _reference_keep_latest(rows)
