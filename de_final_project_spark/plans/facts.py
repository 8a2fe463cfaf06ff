"""Fact builders — fact_payment / fact_purchase_order / fact_sales_order
(reference src/process_lambda.py:245-435; SURVEY.md §2.12).

Pattern per fact: keep-latest dedup of the source -> split each timestamp
into a calendar date + HH:MM:SS.ffffff time string (F3/F4) -> replace each
date column with its ``date_id`` via chained **broadcast** left joins
against dim_date (J3-J5; dim_date is thousands of rows, so each join is a
broadcast hash join — the fact side never shuffles) -> project/rename ->
per-run sequence record id (W2).

Record ids are per-run sequence numbers ordered by the business key, which
makes them deterministic for a given input (SURVEY.md §7.4 risk 1). They
are assigned with the distributed strategy (range-partition + local rank +
broadcast offsets) — same assignment as a global row_number over the same
ordering, without the single-partition sort the reference's
``range(1, len(df)+1)`` transcribes to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_final_project_spark.functions.datetime import time_string
from de_final_project_spark.operators.dedup import keep_latest
from de_final_project_spark.operators.surrogate import (
    add_sequence_key_distributed,
)


def _date_key_join(df: DataFrame, dim_date: DataFrame, date_col: str) -> DataFrame:
    """Replace ``date_col`` (a calendar date) with dim_date's date_id,
    keeping the same column name — one broadcast left join per date role
    (the reference's rename+join chain, src/process_lambda.py:260-274)."""
    lookup = F.broadcast(
        dim_date.select(F.col("date").alias("__dd_date"), F.col("date_id").alias("__dd_id"))
    )
    return (
        df.join(lookup, df[date_col] == lookup["__dd_date"], "left")
        .drop(date_col, "__dd_date")
        .withColumnRenamed("__dd_id", date_col)
    )


def _split_ts(df: DataFrame, ts_col: str, date_name: str, time_name: str) -> DataFrame:
    """created_at -> (created_date, created_time-string) etc. (reference
    src/process_lambda.py:246-254)."""
    return df.withColumn(date_name, F.to_date(F.col(ts_col))).withColumn(
        time_name, time_string(F.col(ts_col))
    )


def make_fact_payment(payment: DataFrame, dim_date: DataFrame) -> DataFrame:
    """payment -> fact_payment (reference src/process_lambda.py:245-300).

    dim_date must carry its calendar ``date`` column
    (make_dim_date(keep_date=True))."""
    p = keep_latest(payment, "payment_id", ["last_updated", "_batch_ts"]
                    if "_batch_ts" in payment.columns else ["last_updated"])
    p = _split_ts(p, "created_at", "created_date", "created_time")
    p = _split_ts(p, "last_updated", "last_updated_date", "last_updated_time")
    p = p.withColumn("payment_date", F.to_date("payment_date"))
    for c in ("created_date", "last_updated_date", "payment_date"):
        p = _date_key_join(p, dim_date, c)
    p = p.select(
        "payment_id", "created_date", "created_time", "last_updated_date",
        "last_updated_time", "transaction_id", "counterparty_id",
        "payment_amount", "currency_id", "payment_type_id", "paid",
        "payment_date",
    )
    return add_sequence_key_distributed(p, "record_payment_id", "payment_id")


def make_fact_purchase_order(purchase_order: DataFrame, dim_date: DataFrame) -> DataFrame:
    """purchase_order -> fact_purchase_order (reference
    src/process_lambda.py:303-367)."""
    po = keep_latest(
        purchase_order, "purchase_order_id",
        ["last_updated", "_batch_ts"] if "_batch_ts" in purchase_order.columns
        else ["last_updated"],
    )
    po = _split_ts(po, "created_at", "created_date", "created_time")
    po = _split_ts(po, "last_updated", "last_updated_date", "last_updated_time")
    po = po.withColumn("agreed_delivery_date", F.to_date("agreed_delivery_date"))
    po = po.withColumn("agreed_payment_date", F.to_date("agreed_payment_date"))
    for c in ("created_date", "last_updated_date", "agreed_delivery_date",
              "agreed_payment_date"):
        po = _date_key_join(po, dim_date, c)
    po = po.select(
        "purchase_order_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time", "staff_id",
        "counterparty_id", "item_code", "item_quantity", "item_unit_price",
        "currency_id", "agreed_delivery_date", "agreed_payment_date",
        "agreed_delivery_location_id",
    )
    return add_sequence_key_distributed(
        po, "purchase_record_id", "purchase_order_id"
    )


def make_fact_sales_order(sales_order: DataFrame, dim_date: DataFrame) -> DataFrame:
    """sales_order -> fact_sales_order (reference
    src/process_lambda.py:370-435; staff_id renamed sales_staff_id :427)."""
    so = keep_latest(
        sales_order, "sales_order_id",
        ["last_updated", "_batch_ts"] if "_batch_ts" in sales_order.columns
        else ["last_updated"],
    )
    so = _split_ts(so, "created_at", "created_date", "created_time")
    so = _split_ts(so, "last_updated", "last_updated_date", "last_updated_time")
    so = so.withColumn("agreed_delivery_date", F.to_date("agreed_delivery_date"))
    so = so.withColumn("agreed_payment_date", F.to_date("agreed_payment_date"))
    for c in ("created_date", "last_updated_date", "agreed_delivery_date",
              "agreed_payment_date"):
        so = _date_key_join(so, dim_date, c)
    so = so.select(
        "sales_order_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time",
        F.col("staff_id").alias("sales_staff_id"), "counterparty_id",
        "units_sold", "unit_price", "currency_id", "design_id",
        "agreed_payment_date", "agreed_delivery_date",
        "agreed_delivery_location_id",
    )
    return add_sequence_key_distributed(so, "sales_record_id", "sales_order_id")


def stable_date_key(col: str):
    """yyyymmdd integer date key — a pure function of the calendar date.

    The reference regenerates dim_date ids per run (sorted-order ranks:
    SURVEY.md §7.4 risk 5), which makes fact date FKs unstable across
    runs and forces every incremental build to re-derive the dimension.
    A functional key needs NO dim join and never changes — the property
    that unlocks append-only incremental fact processing at scale (the
    date dimension becomes a generated lookup, not a join dependency)."""
    return F.date_format(F.col(col), "yyyyMMdd").cast("int")


def make_fact_sales_order_stable(sales_order: DataFrame) -> DataFrame:
    """fact_sales_order with stable yyyymmdd date keys and NO sequence key
    (the caller assigns record ids — e.g. with a continuation offset for
    incremental appends). Zero joins: every derived column is a map-side
    expression, so a delta batch builds in one narrow stage."""
    so = keep_latest(
        sales_order, "sales_order_id",
        ["last_updated", "_batch_ts"] if "_batch_ts" in sales_order.columns
        else ["last_updated"],
    )
    so = _split_ts(so, "created_at", "created_date", "created_time")
    so = _split_ts(so, "last_updated", "last_updated_date", "last_updated_time")
    for c in ("created_date", "last_updated_date"):
        so = so.withColumn(c, stable_date_key(c))
    for c in ("agreed_delivery_date", "agreed_payment_date"):
        so = so.withColumn(c, stable_date_key(c))
    return so.select(
        "sales_order_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time",
        F.col("staff_id").alias("sales_staff_id"), "counterparty_id",
        "units_sold", "unit_price", "currency_id", "design_id",
        "agreed_payment_date", "agreed_delivery_date",
        "agreed_delivery_location_id",
    )
