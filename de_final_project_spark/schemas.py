"""Explicit schema catalog.

The reference pins a hand-declared column list per source table
(reference src/ingestion_lambda.py:26-119, the ``TABLE_LIST`` dict) and
then re-infers types from CSV on every read (src/process_lambda.py:34).
This engine replaces both with explicit ``StructType``s: the projection
contract lives here, and every reader passes ``schema=`` so types are
stable across the bronze CSV round-trip (SURVEY.md §1.3-1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# 11 OLTP source tables (reference src/ingestion_lambda.py:26-119).
# Every table also carries last_updated/created_at in the source DB; they
# are listed only where the reference extracts them.
# --------------------------------------------------------------------------

SOURCE_SCHEMAS: dict[str, T.StructType] = {
    "address": T.StructType(
        [
            T.StructField("address_id", T.LongType(), False),
            T.StructField("address_line_1", T.StringType(), True),
            T.StructField("address_line_2", T.StringType(), True),
            T.StructField("district", T.StringType(), True),
            T.StructField("city", T.StringType(), True),
            T.StructField("postal_code", T.StringType(), True),
            T.StructField("country", T.StringType(), True),
            T.StructField("phone", T.StringType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "counterparty": T.StructType(
        [
            T.StructField("counterparty_id", T.LongType(), False),
            T.StructField("counterparty_legal_name", T.StringType(), True),
            T.StructField("legal_address_id", T.LongType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "currency": T.StructType(
        [
            T.StructField("currency_id", T.LongType(), False),
            T.StructField("currency_code", T.StringType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "department": T.StructType(
        [
            T.StructField("department_id", T.LongType(), False),
            T.StructField("department_name", T.StringType(), True),
            T.StructField("location", T.StringType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "design": T.StructType(
        [
            T.StructField("design_id", T.LongType(), False),
            T.StructField("design_name", T.StringType(), True),
            T.StructField("file_location", T.StringType(), True),
            T.StructField("file_name", T.StringType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "payment": T.StructType(
        [
            T.StructField("payment_id", T.LongType(), False),
            T.StructField("created_at", T.TimestampType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
            T.StructField("transaction_id", T.LongType(), True),
            T.StructField("counterparty_id", T.LongType(), True),
            T.StructField("payment_amount", T.DoubleType(), True),
            T.StructField("currency_id", T.LongType(), True),
            T.StructField("payment_type_id", T.LongType(), True),
            T.StructField("paid", T.BooleanType(), True),
            T.StructField("payment_date", T.DateType(), True),
        ]
    ),
    "payment_type": T.StructType(
        [
            T.StructField("payment_type_id", T.LongType(), False),
            T.StructField("payment_type_name", T.StringType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "purchase_order": T.StructType(
        [
            T.StructField("purchase_order_id", T.LongType(), False),
            T.StructField("created_at", T.TimestampType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
            T.StructField("staff_id", T.LongType(), True),
            T.StructField("counterparty_id", T.LongType(), True),
            T.StructField("item_code", T.StringType(), True),
            T.StructField("item_quantity", T.LongType(), True),
            T.StructField("item_unit_price", T.DoubleType(), True),
            T.StructField("currency_id", T.LongType(), True),
            T.StructField("agreed_delivery_date", T.DateType(), True),
            T.StructField("agreed_payment_date", T.DateType(), True),
            T.StructField("agreed_delivery_location_id", T.LongType(), True),
        ]
    ),
    "sales_order": T.StructType(
        [
            T.StructField("sales_order_id", T.LongType(), False),
            T.StructField("created_at", T.TimestampType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
            T.StructField("design_id", T.LongType(), True),
            T.StructField("staff_id", T.LongType(), True),
            T.StructField("counterparty_id", T.LongType(), True),
            T.StructField("units_sold", T.LongType(), True),
            T.StructField("unit_price", T.DoubleType(), True),
            T.StructField("currency_id", T.LongType(), True),
            T.StructField("agreed_delivery_date", T.DateType(), True),
            T.StructField("agreed_payment_date", T.DateType(), True),
            T.StructField("agreed_delivery_location_id", T.LongType(), True),
        ]
    ),
    "staff": T.StructType(
        [
            T.StructField("staff_id", T.LongType(), False),
            T.StructField("first_name", T.StringType(), True),
            T.StructField("last_name", T.StringType(), True),
            T.StructField("department_id", T.LongType(), True),
            T.StructField("email_address", T.StringType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
    "transaction": T.StructType(
        [
            T.StructField("transaction_id", T.LongType(), False),
            T.StructField("transaction_type", T.StringType(), True),
            T.StructField("sales_order_id", T.LongType(), True),
            T.StructField("purchase_order_id", T.LongType(), True),
            T.StructField("last_updated", T.TimestampType(), True),
        ]
    ),
}

# Primary (dedup) key per source table — the keep-latest operator's key
# (reference src/process_lambda.py:95-199 uses drop_duplicates(subset=[pk])).
SOURCE_PRIMARY_KEYS: dict[str, str] = {
    "address": "address_id",
    "counterparty": "counterparty_id",
    "currency": "currency_id",
    "department": "department_id",
    "design": "design_id",
    "payment": "payment_id",
    "payment_type": "payment_type_id",
    "purchase_order": "purchase_order_id",
    "sales_order": "sales_order_id",
    "staff": "staff_id",
    "transaction": "transaction_id",
}

# --------------------------------------------------------------------------
# Star-schema output column contracts (reference src/process_lambda.py:
# dims :99-241, facts :276-433; FIXTURES.md §2). Used by tests to pin the
# projection of every builder.
# --------------------------------------------------------------------------

STAR_OUTPUT_COLUMNS: dict[str, list[str]] = {
    "dim_location": [
        "location_id", "address_line_1", "address_line_2", "district",
        "city", "postal_code", "country", "phone",
    ],
    "dim_counterparty": [
        "counterparty_id", "counterparty_legal_name",
        "counterparty_legal_address_line_1", "counterparty_legal_address_line_2",
        "counterparty_legal_district", "counterparty_legal_city",
        "counterparty_legal_postal_code", "counterparty_legal_country",
        "counterparty_legal_phone_number",
    ],
    "dim_currency": ["currency_id", "currency_code"],
    "dim_design": ["design_id", "design_name", "file_location", "file_name"],
    "dim_payment_type": ["payment_type_id", "payment_type_name"],
    "dim_staff": [
        "staff_id", "first_name", "last_name", "department_name",
        "location", "email_address",
    ],
    "dim_transaction": [
        "transaction_id", "transaction_type", "sales_order_id", "purchase_order_id",
    ],
    "dim_date": [
        "date_id", "year", "month", "day", "day_of_week", "day_name",
        "month_name", "quarter",
    ],
    "fact_payment": [
        "record_payment_id", "payment_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time", "transaction_id",
        "counterparty_id", "payment_amount", "currency_id", "payment_type_id",
        "paid", "payment_date",
    ],
    "fact_purchase_order": [
        "purchase_record_id", "purchase_order_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time", "staff_id", "counterparty_id",
        "item_code", "item_quantity", "item_unit_price", "currency_id",
        "agreed_delivery_date", "agreed_payment_date",
        "agreed_delivery_location_id",
    ],
    "fact_sales_order": [
        "sales_record_id", "sales_order_id", "created_date", "created_time",
        "last_updated_date", "last_updated_time", "sales_staff_id",
        "counterparty_id", "units_sold", "unit_price", "currency_id",
        "design_id", "agreed_payment_date", "agreed_delivery_date",
        "agreed_delivery_location_id",
    ],
}

# --------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; TESTDATA.md).
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
