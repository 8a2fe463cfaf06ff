"""Dimension builders — the 8 dim "queries" of the reference
(src/process_lambda.py:91-242; SURVEY.md §2.12), Spark-first.

Every builder: keep-latest dedup -> (broadcast lookup join) -> project /
rename. Inputs are the raw accumulated bronze tables (possibly holding
multiple versions per key plus a ``_batch_ts`` ingest column); outputs
match the reference's column contracts exactly (FIXTURES.md §2).

Join intent note: the reference's counterparty⋈address and
staff⋈department joins are latent positional joins (pandas join-on-index
without set_index — reference src/process_lambda.py:121,184). This engine
implements the documented intent: FK equi-joins on the key columns
(SURVEY.md §2.4). Both right sides are dimension-sized, so they broadcast —
no shuffle of the left side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_final_project_spark.functions.datetime import date_parts
from de_final_project_spark.operators.dedup import keep_latest
from de_final_project_spark.operators.surrogate import add_sequence_key

# Version/order columns for keep-latest: last_updated when extracted, then
# the bronze batch id as tiebreak (SURVEY.md §7.4 risk 3).
def _dedup(df: DataFrame, pk: str) -> DataFrame:
    order = [c for c in ("last_updated", "_batch_ts") if c in df.columns]
    return keep_latest(df, pk, order or [pk])


def make_dim_location(address: DataFrame) -> DataFrame:
    """address -> dim_location (reference src/process_lambda.py:91-108)."""
    return _dedup(address, "address_id").select(
        F.col("address_id").alias("location_id"),
        "address_line_1", "address_line_2", "district", "city",
        "postal_code", "country", "phone",
    )


def make_dim_counterparty(counterparty: DataFrame, address: DataFrame) -> DataFrame:
    """counterparty ⋈ address -> dim_counterparty (reference
    src/process_lambda.py:111-144; intended FK equi-join on
    legal_address_id = address_id, broadcast because addresses are
    dimension-sized)."""
    cp = _dedup(counterparty, "counterparty_id")
    addr = _dedup(address, "address_id").select(
        "address_id", "address_line_1", "address_line_2", "district",
        "city", "postal_code", "country", "phone",
    )
    return (
        cp.join(
            F.broadcast(addr),
            cp["legal_address_id"] == addr["address_id"],
            "left",
        )
        .select(
            "counterparty_id",
            "counterparty_legal_name",
            F.col("address_line_1").alias("counterparty_legal_address_line_1"),
            F.col("address_line_2").alias("counterparty_legal_address_line_2"),
            F.col("district").alias("counterparty_legal_district"),
            F.col("city").alias("counterparty_legal_city"),
            F.col("postal_code").alias("counterparty_legal_postal_code"),
            F.col("country").alias("counterparty_legal_country"),
            F.col("phone").alias("counterparty_legal_phone_number"),
        )
    )


def make_dim_currency(currency: DataFrame) -> DataFrame:
    """currency -> dim_currency (reference src/process_lambda.py:147-154)."""
    return _dedup(currency, "currency_id").select("currency_id", "currency_code")


def make_dim_design(design: DataFrame) -> DataFrame:
    """design -> dim_design (reference src/process_lambda.py:157-163)."""
    return _dedup(design, "design_id").select(
        "design_id", "design_name", "file_location", "file_name"
    )


def make_dim_payment_type(payment_type: DataFrame) -> DataFrame:
    """payment_type -> dim_payment_type (reference src/process_lambda.py:166-172)."""
    return _dedup(payment_type, "payment_type_id").select(
        "payment_type_id", "payment_type_name"
    )


def make_dim_staff(staff: DataFrame, department: DataFrame) -> DataFrame:
    """staff ⋈ department -> dim_staff (reference
    src/process_lambda.py:175-192; intended FK equi-join, broadcast)."""
    st = _dedup(staff, "staff_id")
    dept = _dedup(department, "department_id").select(
        "department_id", "department_name", "location"
    )
    return st.join(F.broadcast(dept), "department_id", "left").select(
        "staff_id", "first_name", "last_name", "department_name",
        "location", "email_address",
    )


def make_dim_transaction(transaction: DataFrame) -> DataFrame:
    """transaction -> dim_transaction (reference src/process_lambda.py:195-206)."""
    return _dedup(transaction, "transaction_id").select(
        "transaction_id", "transaction_type", "sales_order_id", "purchase_order_id"
    )


# Date/timestamp columns melted into dim_date per source table (reference
# src/process_lambda.py:213-222).
DATE_SOURCE_COLUMNS = {
    "payment": ["created_at", "last_updated", "payment_date"],
    "purchase_order": [
        "created_at", "last_updated", "agreed_delivery_date", "agreed_payment_date",
    ],
    "sales_order": [
        "created_at", "last_updated", "agreed_delivery_date", "agreed_payment_date",
    ],
}


def distinct_dates(*sources: tuple[DataFrame, list[str]]) -> DataFrame:
    """Unpivot each source's date/ts columns to a single ``date`` column and
    union-distinct (the melt+concat of reference src/process_lambda.py:213-227,
    O3/O4). One narrow projection per column, then a distinct — the only
    shuffle is the distinct's, on an already column-pruned single column."""
    parts = []
    for df, cols in sources:
        for c in cols:
            parts.append(df.select(F.to_date(F.col(c)).alias("date")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("date").isNotNull()).distinct()


def make_dim_date(
    payment: DataFrame,
    purchase_order: DataFrame,
    sales_order: DataFrame,
    keep_date: bool = False,
) -> DataFrame:
    """dim_date (reference src/process_lambda.py:209-242): distinct union of
    every date in the three fact sources -> 7 derived parts -> 1-based
    ``date_id`` in ascending date order (O1+W2, Monday=0 shift F6).

    ``keep_date=True`` retains the calendar date column (used internally by
    fact builders to join; the reference's output drops it)."""
    dates = distinct_dates(
        (payment, DATE_SOURCE_COLUMNS["payment"]),
        (purchase_order, DATE_SOURCE_COLUMNS["purchase_order"]),
        (sales_order, DATE_SOURCE_COLUMNS["sales_order"]),
    )
    parts = date_parts("date")
    with_parts = dates.select(
        "date", *[expr.alias(name) for name, expr in parts.items()]
    )
    keyed = add_sequence_key(with_parts, "date_id", "date")
    if keep_date:
        return keyed
    return keyed.drop("date")
