"""Property test: connected_components agrees with a reference union-find
on arbitrary small graphs (the CC drives near-dup cluster assignment, so
a wrong fixpoint silently corrupts dedup decisions)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from de_final_project_spark.operators.neardup import connected_components

edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {n: find(n) for n in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges_strategy)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _uf_components(edges)
    assert got == want
