"""Driver-contract invariants: every oracle key has a query, QUERIES.md
is fresh, and every query callable has the right signature."""

import inspect

import __spark_entry__ as entry_mod


def test_every_oracle_has_a_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # named exceptions only for the rows-only checks
    assert set(qs) - set(oracles) == {"knn_lsh_candidates", "approx_distinct_users"}


def test_queries_md_is_fresh():
    qs = entry_mod.queries()
    text = open("QUERIES.md").read()
    for name in qs:
        assert f"`{name}`" in text, f"{name} missing from QUERIES.md — rerun tools/inventory.py"
    assert f"Totals: {len(qs)} queries" in text


def test_query_signatures():
    for name, fn in entry_mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], name
