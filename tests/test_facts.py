"""Fact builder tests: timestamp splitting, date-key resolution via the
broadcast dim_date joins, keep-latest on fact sources, sequence keys."""

from de_final_project_spark.plans.dims import make_dim_date
from de_final_project_spark.plans.facts import (
    make_fact_payment,
    make_fact_purchase_order,
    make_fact_sales_order,
)
from de_final_project_spark.schemas import STAR_OUTPUT_COLUMNS


def _dim_date(payment_df, purchase_order_df, sales_order_df):
    return make_dim_date(
        payment_df, purchase_order_df, sales_order_df, keep_date=True
    )


def test_fact_payment(spark, payment_df, purchase_order_df, sales_order_df):
    dd = _dim_date(payment_df, purchase_order_df, sales_order_df)
    out = make_fact_payment(payment_df, dd)
    assert out.columns == STAR_OUTPUT_COLUMNS["fact_payment"]
    rows = {r.payment_id: r for r in out.collect()}
    # keep-latest: payment 2's second version (amount 1000.00, paid) wins
    assert len(rows) == 3
    assert rows[2].payment_amount == 1000.00 and rows[2].paid is True
    # time strings carry microseconds
    assert rows[1].created_time == "10:30:00.123456"
    assert rows[2].created_time == "23:59:59.999999"
    # date keys resolve to dim_date ids (dense longs >= 1)
    date_ids = {r.date_id for r in dd.collect()}
    assert rows[1].created_date in date_ids
    assert rows[1].payment_date in date_ids
    # record ids dense 1..n ordered by payment_id
    assert sorted(r.record_payment_id for r in rows.values()) == [1, 2, 3]


def test_fact_purchase_order(spark, payment_df, purchase_order_df, sales_order_df):
    dd = _dim_date(payment_df, purchase_order_df, sales_order_df)
    out = make_fact_purchase_order(purchase_order_df, dd)
    assert out.columns == STAR_OUTPUT_COLUMNS["fact_purchase_order"]
    rows = out.collect()
    assert len(rows) == 2
    assert [r.purchase_record_id for r in rows] != [None, None]


def test_fact_sales_order(spark, payment_df, purchase_order_df, sales_order_df):
    dd = _dim_date(payment_df, purchase_order_df, sales_order_df)
    out = make_fact_sales_order(sales_order_df, dd)
    assert out.columns == STAR_OUTPUT_COLUMNS["fact_sales_order"]
    rows = {r.sales_order_id: r for r in out.collect()}
    # keep-latest: sales_order 2's Aug-updated version (55 units) wins
    assert rows[2].units_sold == 55
    # rename staff_id -> sales_staff_id happened
    assert rows[1].sales_staff_id == 1


def test_fact_date_keys_roundtrip(spark, payment_df, purchase_order_df, sales_order_df):
    """Joining fact date keys back to dim_date recovers the calendar date."""
    dd = _dim_date(payment_df, purchase_order_df, sales_order_df)
    out = make_fact_payment(payment_df, dd)
    j = (
        out.join(dd.select("date_id", "date"), out["payment_date"] == dd["date_id"])
        .select("payment_id", "date")
        .collect()
    )
    import datetime as dt

    by_id = {r.payment_id: r.date for r in j}
    assert by_id[1] == dt.date(2024, 1, 5)
    assert by_id[3] == dt.date(2023, 12, 31)
