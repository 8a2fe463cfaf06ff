"""Dimension builder tests against reference-shaped fixtures — column
contracts (FIXTURES.md §2), keep-latest behavior, intended FK equi-join
semantics, and left-join null behavior for dangling FKs."""

from de_final_project_spark.plans.dims import (
    make_dim_counterparty,
    make_dim_currency,
    make_dim_date,
    make_dim_location,
    make_dim_staff,
)
from de_final_project_spark.schemas import STAR_OUTPUT_COLUMNS


def test_dim_location_contract_and_dedup(spark, address_df):
    out = make_dim_location(address_df)
    assert out.columns == STAR_OUTPUT_COLUMNS["dim_location"]
    rows = {r.location_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    # keep-latest: address 2's Feb version wins
    assert rows[2].address_line_1 == "2 Low Road"
    assert rows[2].address_line_2 == "Unit 4"


def test_dim_currency_contract(spark, currency_df):
    out = make_dim_currency(currency_df)
    assert out.columns == STAR_OUTPUT_COLUMNS["dim_currency"]
    assert out.count() == 3


def test_dim_counterparty_fk_join_and_nulls(spark, counterparty_df, address_df):
    out = make_dim_counterparty(counterparty_df, address_df)
    assert out.columns == STAR_OUTPUT_COLUMNS["dim_counterparty"]
    rows = {r.counterparty_id: r for r in out.collect()}
    # Intended equi-join: cp 2 -> address_id 2 (latest version), NOT row
    # position 2 (the reference's latent positional-join bug, SURVEY §2.4).
    assert rows[2].counterparty_legal_address_line_1 == "2 Low Road"
    assert rows[1].counterparty_legal_city == "Leeds"
    # Dangling FK -> all address fields null, row preserved (left join).
    assert rows[3].counterparty_legal_city is None
    assert rows[3].counterparty_legal_name == "Chi SA"


def test_dim_staff_join_and_dedup(spark, staff_df, department_df):
    out = make_dim_staff(staff_df, department_df)
    assert out.columns == STAR_OUTPUT_COLUMNS["dim_staff"]
    rows = {r.staff_id: r for r in out.collect()}
    assert rows[2].last_name == "Beech"  # keep-latest on staff
    assert rows[2].department_name == "Ops"
    assert rows[3].department_name is None  # dangling department FK


def test_dim_date_derivation(spark, payment_df, purchase_order_df, sales_order_df):
    out = make_dim_date(payment_df, purchase_order_df, sales_order_df)
    assert out.columns == STAR_OUTPUT_COLUMNS["dim_date"]
    with_date = make_dim_date(
        payment_df, purchase_order_df, sales_order_df, keep_date=True
    ).collect()
    dates = [r.date for r in sorted(with_date, key=lambda r: r.date_id)]
    # distinct, ascending, ids dense from 1
    assert dates == sorted(set(dates))
    assert [r.date_id for r in sorted(with_date, key=lambda r: r.date_id)] == list(
        range(1, len(dates) + 1)
    )
    # every source date present (incl. date-typed and timestamp-typed cols)
    import datetime as dt

    assert dt.date(2023, 12, 31) in dates  # payment 3 created_at + payment_date
    assert dt.date(2024, 7, 25) in dates  # sales agreed_delivery_date
    by_date = {r.date: r for r in with_date}
    jan1 = by_date[dt.date(2024, 1, 1)]
    assert (jan1.day_of_week, jan1.day_name, jan1.quarter) == (0, "Monday", 1)
