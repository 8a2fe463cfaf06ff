"""Tests for the driver-checkable OLTP-builder path (plans/oltp.py).

The oracle equivalence itself is covered by tools/driver_twin.py; these
tests pin the properties the oracle pairing RELIES on: that the derived
bronze really exercises keep-latest (versioned rows, and for
purchase_order genuine pk collisions with tied ``last_updated``), and
that the builder outputs are key-unique with the documented schemas.
"""

from __future__ import annotations

import duckdb
import pytest

from de_final_project_spark.plans import oltp

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

TABLES = "region nation customer supplier part orders lineitem".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for sf, prefix in ((SF, ""), (SF01, "sf01_")):
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {prefix}{t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
    yield con
    con.close()


def test_bronze_cols_match_sql(duck):
    """_BRONZE_COLS (the oracle tiebreak order) must equal the actual
    SELECT order of every bronze derivation — a drifted list silently
    breaks the keep-latest total-order restatement."""
    for table, cols in oltp._BRONZE_COLS.items():
        rel = duck.sql(oltp.bronze_sql(table, "duck"))
        assert rel.columns == cols, table


def test_versioned_bronze_exercises_dedup(duck):
    """Every v2-carrying bronze table must contain real duplicate pks."""
    for table, pk in [
        ("address", "address_id"),
        ("counterparty", "counterparty_id"),
        ("design", "design_id"),
        ("staff", "staff_id"),
        ("payment", "payment_id"),
        ("purchase_order", "purchase_order_id"),
        ("sales_order", "sales_order_id"),
    ]:
        sql = oltp.bronze_sql(table, "duck")
        n_dupe = duck.execute(
            f"SELECT count(*) FROM (SELECT {pk} FROM ({sql}) "
            f"GROUP BY {pk} HAVING count(*) > 1)"
        ).fetchone()[0]
        assert n_dupe > 0, table


def test_purchase_order_ties_exercise_full_tiebreak(duck):
    """At sf0.01 the synthetic lineitem has duplicate (l_orderkey,
    l_linenumber) pairs, so purchase_order pks collide WITH tied
    last_updated — the case that forces keep_latest's column tiebreak.
    If testdata regeneration ever removes these, the oracle's full
    ORDER BY is untested and this guard should flag it."""
    sql = oltp.bronze_sql("purchase_order", "duck").replace(
        "FROM lineitem", "FROM sf01_lineitem"
    )
    n_tied = duck.execute(
        f"SELECT count(*) FROM (SELECT purchase_order_id FROM ({sql}) "
        f"GROUP BY purchase_order_id, last_updated HAVING count(*) > 1)"
    ).fetchone()[0]
    assert n_tied > 0


@pytest.mark.parametrize(
    "query,pk",
    [
        ("oltp_dim_location", "location_id"),
        ("oltp_dim_counterparty", "counterparty_id"),
        ("oltp_fact_payment", "payment_id"),
        ("oltp_fact_sales_order", "sales_order_id"),
    ],
)
def test_builder_outputs_key_unique(spark, query, pk):
    df = getattr(oltp, query)(spark, SF)
    total = df.count()
    distinct = df.select(pk).distinct().count()
    assert total == distinct > 0


def test_dim_date_ids_dense(spark):
    rows = oltp.oltp_dim_date(spark, SF).select("date_id").collect()
    ids = sorted(r.date_id for r in rows)
    assert ids == list(range(1, len(ids) + 1))


def test_fact_sales_order_schema(spark):
    df = oltp.oltp_fact_sales_order(spark, SF)
    assert df.columns == [
        "sales_record_id", "sales_order_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time", "sales_staff_id",
        "counterparty_id", "units_sold", "unit_price", "currency_id",
        "design_id", "agreed_payment_date", "agreed_delivery_date",
        "agreed_delivery_location_id",
    ]
