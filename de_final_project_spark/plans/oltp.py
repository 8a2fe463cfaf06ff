"""Driver-checkable path through the REAL 11 OLTP table builders.

``plans/dims.py`` / ``plans/facts.py`` implement the reference's actual
builders (reference src/process_lambda.py:91-435) over its ToteSys bronze
tables — address, counterparty, currency, design, payment_type, staff,
department, transaction, payment, purchase_order, sales_order — which the
driver testdata does not contain. This module closes that verification
gap: each bronze table is DERIVED deterministically from testdata columns
(pure expressions: key remaps, string assembly, exact integer timestamp
arithmetic — no RNG, no driver-side state), the real builders run on the
derived bronze, and every output is paired with DuckDB oracle SQL that
restates the same derivation + builder logic.

Multi-version rows: tables with a ``v2`` block carry a second version for
a deterministic key subset (newer ``last_updated``, one changed
attribute), so the keep-latest dedup inside every builder is exercised
end-to-end, not just on trivially-unique inputs. ``purchase_order_id``
even collides for real (the synthetic lineitem has duplicate
``(l_orderkey, l_linenumber)`` pairs, some tying on the derived
``last_updated``), so the oracle dedup CTEs restate ``keep_latest``'s
FULL total order — ``last_updated DESC`` then every remaining column
DESC NULLS LAST in bronze column order — not just the version column.

Dialect handling: one Python source of truth per table emits both the
Spark SQL text (run via temp views over ``read_testdata``) and the DuckDB
text (embedded as oracle CTEs). The only dialect-divergent pieces are
CAST-to-string, interval arithmetic, and date addition — wrapped in
``_dialect``; everything else is shared ANSI text, verified equal by
construction.

Scale shape: bronze derivation is a narrow projection (no shuffle); every
builder keeps its documented physics — keep-latest is one hash exchange +
window, lookup joins broadcast the dimension side, date-role joins
broadcast dim_date, sequence keys are the reference-parity global
row_number (swap for add_sequence_key_distributed past ~10^8 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from de_final_project_spark.plans.dims import (
    make_dim_counterparty,
    make_dim_currency,
    make_dim_date,
    make_dim_design,
    make_dim_location,
    make_dim_payment_type,
    make_dim_staff,
    make_dim_transaction,
)
from de_final_project_spark.plans.facts import (
    make_fact_payment,
    make_fact_purchase_order,
    make_fact_sales_order,
)
from de_final_project_spark.sources.readers import read_testdata

_BASE_TS = "TIMESTAMP '2023-01-01 00:00:00'"

# A day in microseconds; multipliers are primes so derived times spread
# over the day without colliding.
_DAY_US = 86_400_000_000


def _dialect(d: str) -> dict:
    if d == "spark":
        return {
            "s": lambda x: f"CAST({x} AS STRING)",
            "add_sec": lambda ts, n: f"timestampadd(SECOND, CAST({n} AS BIGINT), {ts})",
            "add_us": lambda ts, n: f"timestampadd(MICROSECOND, CAST({n} AS BIGINT), {ts})",
            "add_day": lambda ts, n: f"timestampadd(DAY, CAST({n} AS BIGINT), {ts})",
            "dadd": lambda dt, n: f"date_add(CAST({dt} AS DATE), CAST({n} AS INT))",
        }
    return {
        "s": lambda x: f"CAST({x} AS VARCHAR)",
        "add_sec": lambda ts, n: f"({ts} + to_seconds(CAST({n} AS BIGINT)))",
        "add_us": lambda ts, n: f"({ts} + to_microseconds(CAST({n} AS BIGINT)))",
        "add_day": lambda ts, n: f"({ts} + to_days(CAST({n} AS INT)))",
        "dadd": lambda dt, n: f"(CAST({dt} AS DATE) + CAST({n} AS INT))",
    }


def bronze_sql(table: str, dialect: str) -> str:
    """SELECT text deriving one ToteSys-shaped bronze table from testdata,
    in the given dialect ('spark' | 'duck'). Raw tables are referenced by
    their plain names (Spark: temp views; DuckDB: driver-registered views).
    """
    f = _dialect(dialect)
    s, add_sec, add_us, add_day, dadd = (
        f["s"], f["add_sec"], f["add_us"], f["add_day"], f["dadd"],
    )
    if table == "address":
        base = f"""
  SELECT c_custkey AS address_id,
         c_name AS address_line_1,
         CASE WHEN c_custkey % 3 = 0 THEN NULL
              ELSE 'Suite ' || {s('c_custkey % 100')} END AS address_line_2,
         c_mktsegment AS district,
         'City-' || {s('c_nationkey')} AS city,
         lpad({s('(c_custkey * 7919) % 100000')}, 5, '0') AS postal_code,
         'Country-' || {s('c_nationkey')} AS country,
         {s('c_nationkey')} || '-' || {s('c_custkey % 10000')} AS phone,
         {add_sec(_BASE_TS, 'c_custkey % 86400')} AS last_updated
  FROM customer"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT address_id, address_line_1, address_line_2, district,
       'Relocated ' || city AS city, postal_code, country, phone,
       {add_day('last_updated', 1)} AS last_updated
FROM ({base}
) b WHERE address_id % 10 = 0"""
    if table == "counterparty":
        base = f"""
  SELECT s_suppkey AS counterparty_id,
         s_name AS counterparty_legal_name,
         (s_suppkey * 13) % 97 AS legal_address_id,
         {add_sec(_BASE_TS, '(s_suppkey * 997) % 86400')} AS last_updated
  FROM supplier"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT counterparty_id, counterparty_legal_name || ' (restated)' AS counterparty_legal_name,
       legal_address_id, {add_day('last_updated', 1)} AS last_updated
FROM ({base}
) b WHERE counterparty_id % 7 = 0"""
    if table == "currency":
        return f"""
  SELECT r_regionkey AS currency_id,
         upper(substring(r_name, 1, 3)) AS currency_code,
         {add_sec(_BASE_TS, 'r_regionkey * 60')} AS last_updated
  FROM region"""
    if table == "design":
        base = f"""
  SELECT p_partkey AS design_id,
         p_name AS design_name,
         '/designs/' || p_brand AS file_location,
         'design-' || {s('p_partkey')} || '.json' AS file_name,
         {add_sec(_BASE_TS, 'p_partkey % 86400')} AS last_updated
  FROM part"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT design_id, design_name, file_location,
       'design-' || {s('design_id')} || '.v2.json' AS file_name,
       {add_day('last_updated', 1)} AS last_updated
FROM ({base}
) b WHERE design_id % 13 = 0"""
    if table == "payment_type":
        return f"""
  SELECT payment_type_id, payment_type_name,
         {add_sec(_BASE_TS, 'payment_type_id * 60')} AS last_updated
  FROM (
    SELECT DISTINCT CAST(substring(o_orderpriority, 1, 1) AS INT) AS payment_type_id,
           o_orderpriority AS payment_type_name
    FROM orders
  ) p"""
    if table == "department":
        return f"""
  SELECT n_nationkey AS department_id,
         n_name AS department_name,
         'Building-' || {s('n_regionkey')} AS location,
         {add_sec(_BASE_TS, 'n_nationkey * 3600')} AS last_updated
  FROM nation"""
    if table == "staff":
        base = f"""
  SELECT s_suppkey AS staff_id,
         'Agent-' || {s('s_suppkey % 20')} AS first_name,
         replace(s_name, 'Supplier#', 'S') AS last_name,
         s_nationkey AS department_id,
         lower(replace(s_name, '#', '.')) || '@totesys.example' AS email_address,
         {add_sec(_BASE_TS, 's_suppkey * 13')} AS last_updated
  FROM supplier"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT staff_id, first_name, last_name, department_id,
       'new.' || email_address AS email_address,
       {add_day('last_updated', 1)} AS last_updated
FROM ({base}
) b WHERE staff_id % 5 = 0"""
    if table == "transaction":
        return f"""
  SELECT o_orderkey AS transaction_id,
         CASE WHEN o_orderkey % 2 = 0 THEN 'SALE' ELSE 'PURCHASE' END AS transaction_type,
         CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey END AS sales_order_id,
         CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey END AS purchase_order_id,
         {add_sec('o_orderdate', 'o_orderkey % 86400')} AS last_updated
  FROM orders"""
    if table == "payment":
        base = f"""
  SELECT o_orderkey AS payment_id,
         {add_us('o_orderdate', f'(o_orderkey * 1000003) % {_DAY_US}')} AS created_at,
         {add_us('o_orderdate', f'((o_orderkey * 1000003) % {_DAY_US}) + 7200000000')} AS last_updated,
         o_orderkey AS transaction_id,
         (o_orderkey * 31) % 97 AS counterparty_id,
         o_totalprice AS payment_amount,
         o_orderkey % 5 AS currency_id,
         CAST(substring(o_orderpriority, 1, 1) AS INT) AS payment_type_id,
         o_orderkey % 2 = 0 AS paid,
         {dadd('o_orderdate', 'o_orderkey % 30')} AS payment_date
  FROM orders"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT payment_id, created_at, {add_day('last_updated', 1)} AS last_updated,
       transaction_id, counterparty_id, payment_amount, currency_id,
       payment_type_id, NOT paid AS paid, payment_date
FROM ({base}
) b WHERE payment_id % 11 = 0"""
    if table == "purchase_order":
        base = f"""
  SELECT l_orderkey * 8 + l_linenumber AS purchase_order_id,
         {add_us('l_shipdate', f'(l_orderkey * 999983 + l_linenumber * 101) % {_DAY_US}')} AS created_at,
         {add_us('l_shipdate', f'((l_orderkey * 999983 + l_linenumber * 101) % {_DAY_US}) + 3600000000')} AS last_updated,
         l_suppkey AS staff_id,
         (l_suppkey * 7) % 97 AS counterparty_id,
         'ITEM-' || lpad({s('l_partkey')}, 7, '0') AS item_code,
         l_quantity AS item_quantity,
         l_extendedprice AS item_unit_price,
         l_orderkey % 5 AS currency_id,
         {dadd('l_shipdate', 'l_linenumber % 7')} AS agreed_delivery_date,
         {dadd('l_shipdate', 30)} AS agreed_payment_date,
         l_partkey % 97 AS agreed_delivery_location_id
  FROM lineitem"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT purchase_order_id, created_at, {add_day('last_updated', 1)} AS last_updated,
       staff_id, counterparty_id, item_code,
       item_quantity + 1 AS item_quantity, item_unit_price, currency_id,
       agreed_delivery_date, agreed_payment_date, agreed_delivery_location_id
FROM ({base}
) b WHERE purchase_order_id % 17 = 0"""
    if table == "sales_order":
        base = f"""
  SELECT o_orderkey AS sales_order_id,
         {add_us('o_orderdate', f'(o_orderkey * 999979) % {_DAY_US}')} AS created_at,
         {add_us('o_orderdate', f'((o_orderkey * 999979) % {_DAY_US}) + 5400000000')} AS last_updated,
         o_orderkey % 10 AS staff_id,
         o_custkey % 97 AS counterparty_id,
         (o_orderkey * 3) % 50 + 1 AS units_sold,
         o_totalprice AS unit_price,
         o_orderkey % 5 AS currency_id,
         o_custkey % 199 AS design_id,
         {dadd('o_orderdate', 'o_orderkey % 14')} AS agreed_payment_date,
         {dadd('o_orderdate', 'o_orderkey % 21')} AS agreed_delivery_date,
         o_custkey % 97 AS agreed_delivery_location_id
  FROM orders"""
        return f"""
SELECT * FROM ({base}
) b
UNION ALL
SELECT sales_order_id, created_at, {add_day('last_updated', 1)} AS last_updated,
       staff_id, counterparty_id, units_sold + 5 AS units_sold, unit_price,
       currency_id, design_id, agreed_payment_date, agreed_delivery_date,
       agreed_delivery_location_id
FROM ({base}
) b WHERE sales_order_id % 13 = 0"""
    raise KeyError(table)


# Bronze column order per table (= the SELECT order in bronze_sql).
# keep_latest's tiebreak is "remaining columns DESC in df.columns order",
# so the oracle needs this exact order to restate the total order.
_BRONZE_COLS = {
    "address": [
        "address_id", "address_line_1", "address_line_2", "district",
        "city", "postal_code", "country", "phone", "last_updated",
    ],
    "counterparty": [
        "counterparty_id", "counterparty_legal_name", "legal_address_id",
        "last_updated",
    ],
    "currency": ["currency_id", "currency_code", "last_updated"],
    "design": [
        "design_id", "design_name", "file_location", "file_name",
        "last_updated",
    ],
    "payment_type": ["payment_type_id", "payment_type_name", "last_updated"],
    "department": [
        "department_id", "department_name", "location", "last_updated",
    ],
    "staff": [
        "staff_id", "first_name", "last_name", "department_id",
        "email_address", "last_updated",
    ],
    "transaction": [
        "transaction_id", "transaction_type", "sales_order_id",
        "purchase_order_id", "last_updated",
    ],
    "payment": [
        "payment_id", "created_at", "last_updated", "transaction_id",
        "counterparty_id", "payment_amount", "currency_id",
        "payment_type_id", "paid", "payment_date",
    ],
    "purchase_order": [
        "purchase_order_id", "created_at", "last_updated", "staff_id",
        "counterparty_id", "item_code", "item_quantity", "item_unit_price",
        "currency_id", "agreed_delivery_date", "agreed_payment_date",
        "agreed_delivery_location_id",
    ],
    "sales_order": [
        "sales_order_id", "created_at", "last_updated", "staff_id",
        "counterparty_id", "units_sold", "unit_price", "currency_id",
        "design_id", "agreed_payment_date", "agreed_delivery_date",
        "agreed_delivery_location_id",
    ],
}

# Raw testdata tables each bronze derivation reads.
_SOURCES = {
    "address": ["customer"],
    "counterparty": ["supplier"],
    "currency": ["region"],
    "design": ["part"],
    "payment_type": ["orders"],
    "department": ["nation"],
    "staff": ["supplier"],
    "transaction": ["orders"],
    "payment": ["orders"],
    "purchase_order": ["lineitem"],
    "sales_order": ["orders"],
}


def bronze(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Derive one bronze table as a DataFrame. Registers the raw testdata
    tables as temp views (idempotent) and runs the Spark-dialect text —
    pure projections, so Catalyst prunes/pushes through them freely."""
    for t in _SOURCES[table]:
        read_testdata(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(bronze_sql(table, "spark"))


# ----------------------------------------------------------------------
# Driver queries: real builders over derived bronze
# ----------------------------------------------------------------------

def oltp_dim_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_location (reference src/process_lambda.py:91-108) over
    derived address bronze with multi-version rows — keep-latest + project."""
    return make_dim_location(bronze(spark, sf_dir, "address"))


def oltp_dim_counterparty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_counterparty (reference src/process_lambda.py:111-144):
    keep-latest both sides, then the intended FK equi-join
    legal_address_id = address_id with the address side broadcast."""
    return make_dim_counterparty(
        bronze(spark, sf_dir, "counterparty"), bronze(spark, sf_dir, "address")
    )


def oltp_dim_currency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_currency (reference src/process_lambda.py:147-154)."""
    return make_dim_currency(bronze(spark, sf_dir, "currency"))


def oltp_dim_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_design (reference src/process_lambda.py:157-163) over
    versioned design bronze."""
    return make_dim_design(bronze(spark, sf_dir, "design"))


def oltp_dim_payment_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_payment_type (reference src/process_lambda.py:166-172)."""
    return make_dim_payment_type(bronze(spark, sf_dir, "payment_type"))


def oltp_dim_staff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_staff (reference src/process_lambda.py:175-192): broadcast
    department lookup join after keep-latest on both sides."""
    return make_dim_staff(
        bronze(spark, sf_dir, "staff"), bronze(spark, sf_dir, "department")
    )


def oltp_dim_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_transaction (reference src/process_lambda.py:195-206);
    sales/purchase order ids are genuinely NULL for the other type."""
    return make_dim_transaction(bronze(spark, sf_dir, "transaction"))


def oltp_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_dim_date (reference src/process_lambda.py:209-242): melt every
    date/timestamp column of the three fact bronzes, union-distinct,
    7 date parts, 1-based date_id in date order (date column dropped,
    matching the reference's output contract)."""
    return make_dim_date(
        bronze(spark, sf_dir, "payment"),
        bronze(spark, sf_dir, "purchase_order"),
        bronze(spark, sf_dir, "sales_order"),
    )


def _dim_date_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact builders join on the calendar date; cache because each fact
    # does 3-4 date-role joins and Catalyst would otherwise duplicate the
    # whole melt subtree per role.
    return make_dim_date(
        bronze(spark, sf_dir, "payment"),
        bronze(spark, sf_dir, "purchase_order"),
        bronze(spark, sf_dir, "sales_order"),
        keep_date=True,
    ).select("date", "date_id").cache()


def oltp_fact_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_fact_payment (reference src/process_lambda.py:245-300):
    keep-latest, timestamp split to date + HH:MM:SS.ffffff string, three
    broadcast date-role joins, sequence record id."""
    return make_fact_payment(
        bronze(spark, sf_dir, "payment"), _dim_date_kept(spark, sf_dir)
    )


def oltp_fact_purchase_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_fact_purchase_order (reference src/process_lambda.py:303-367):
    four broadcast date-role joins."""
    return make_fact_purchase_order(
        bronze(spark, sf_dir, "purchase_order"), _dim_date_kept(spark, sf_dir)
    )


def oltp_fact_sales_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_fact_sales_order (reference src/process_lambda.py:370-435):
    four broadcast date-role joins, staff_id renamed sales_staff_id."""
    return make_fact_sales_order(
        bronze(spark, sf_dir, "sales_order"), _dim_date_kept(spark, sf_dir)
    )


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

def _cte(table: str) -> str:
    return f"{table}_b AS ({bronze_sql(table, 'duck')}\n)"


def _dedup_cte(table: str, pk: str) -> str:
    # keep_latest restated in full: last_updated DESC, then every other
    # column DESC NULLS LAST in bronze column order (keep_latest's
    # documented tiebreak). purchase_order genuinely needs the tail.
    tiebreak = [
        c for c in _BRONZE_COLS[table] if c not in (pk, "last_updated")
    ]
    order = ", ".join(
        f"{c} DESC NULLS LAST" for c in ["last_updated", *tiebreak]
    )
    return (
        f"{table}_d AS (SELECT * EXCLUDE (rn) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {pk} "
        f"ORDER BY {order}) AS rn FROM {table}_b) WHERE rn = 1)"
    )


_DD_CTE = f"""dd AS (
  SELECT row_number() OVER (ORDER BY date) AS date_id, date FROM (
    SELECT DISTINCT d AS date FROM (
      SELECT CAST(created_at AS DATE) AS d FROM payment_b
      UNION ALL SELECT CAST(last_updated AS DATE) FROM payment_b
      UNION ALL SELECT CAST(payment_date AS DATE) FROM payment_b
      UNION ALL SELECT CAST(created_at AS DATE) FROM purchase_order_b
      UNION ALL SELECT CAST(last_updated AS DATE) FROM purchase_order_b
      UNION ALL SELECT CAST(agreed_delivery_date AS DATE) FROM purchase_order_b
      UNION ALL SELECT CAST(agreed_payment_date AS DATE) FROM purchase_order_b
      UNION ALL SELECT CAST(created_at AS DATE) FROM sales_order_b
      UNION ALL SELECT CAST(last_updated AS DATE) FROM sales_order_b
      UNION ALL SELECT CAST(agreed_delivery_date AS DATE) FROM sales_order_b
      UNION ALL SELECT CAST(agreed_payment_date AS DATE) FROM sales_order_b
    ) u WHERE d IS NOT NULL
  ) dates
)"""

_FACT_CTES = ",\n".join(
    [_cte("payment"), _cte("purchase_order"), _cte("sales_order"), _DD_CTE]
)

OLTP_DIM_LOCATION_SQL = f"""
WITH {_cte('address')},
{_dedup_cte('address', 'address_id')}
SELECT address_id AS location_id, address_line_1, address_line_2,
       district, city, postal_code, country, phone
FROM address_d
"""

OLTP_DIM_COUNTERPARTY_SQL = f"""
WITH {_cte('address')},
{_dedup_cte('address', 'address_id')},
{_cte('counterparty')},
{_dedup_cte('counterparty', 'counterparty_id')}
SELECT counterparty_id, counterparty_legal_name,
       a.address_line_1 AS counterparty_legal_address_line_1,
       a.address_line_2 AS counterparty_legal_address_line_2,
       a.district AS counterparty_legal_district,
       a.city AS counterparty_legal_city,
       a.postal_code AS counterparty_legal_postal_code,
       a.country AS counterparty_legal_country,
       a.phone AS counterparty_legal_phone_number
FROM counterparty_d c
LEFT JOIN address_d a ON c.legal_address_id = a.address_id
"""

OLTP_DIM_CURRENCY_SQL = f"""
WITH {_cte('currency')},
{_dedup_cte('currency', 'currency_id')}
SELECT currency_id, currency_code FROM currency_d
"""

OLTP_DIM_DESIGN_SQL = f"""
WITH {_cte('design')},
{_dedup_cte('design', 'design_id')}
SELECT design_id, design_name, file_location, file_name FROM design_d
"""

OLTP_DIM_PAYMENT_TYPE_SQL = f"""
WITH {_cte('payment_type')},
{_dedup_cte('payment_type', 'payment_type_id')}
SELECT payment_type_id, payment_type_name FROM payment_type_d
"""

OLTP_DIM_STAFF_SQL = f"""
WITH {_cte('staff')},
{_dedup_cte('staff', 'staff_id')},
{_cte('department')},
{_dedup_cte('department', 'department_id')}
SELECT staff_id, first_name, last_name, department_name, location,
       email_address
FROM staff_d s
LEFT JOIN department_d d USING (department_id)
"""

OLTP_DIM_TRANSACTION_SQL = f"""
WITH {_cte('transaction')},
{_dedup_cte('transaction', 'transaction_id')}
SELECT transaction_id, transaction_type, sales_order_id, purchase_order_id
FROM transaction_d
"""

OLTP_DIM_DATE_SQL = f"""
WITH {_FACT_CTES}
SELECT date_id,
       year(date)       AS year,
       month(date)      AS month,
       day(date)        AS day,
       isodow(date) - 1 AS day_of_week,
       dayname(date)    AS day_name,
       monthname(date)  AS month_name,
       quarter(date)    AS quarter
FROM dd
"""

OLTP_FACT_PAYMENT_SQL = f"""
WITH {_FACT_CTES},
{_dedup_cte('payment', 'payment_id')}
SELECT row_number() OVER (ORDER BY payment_id) AS record_payment_id,
       payment_id,
       dc.date_id AS created_date,
       strftime(created_at, '%H:%M:%S.%f') AS created_time,
       dl.date_id AS last_updated_date,
       strftime(last_updated, '%H:%M:%S.%f') AS last_updated_time,
       transaction_id, counterparty_id, payment_amount, currency_id,
       payment_type_id, paid,
       dp.date_id AS payment_date
FROM payment_d
LEFT JOIN dd dc ON CAST(created_at AS DATE) = dc.date
LEFT JOIN dd dl ON CAST(last_updated AS DATE) = dl.date
LEFT JOIN dd dp ON CAST(payment_date AS DATE) = dp.date
"""

OLTP_FACT_PURCHASE_ORDER_SQL = f"""
WITH {_FACT_CTES},
{_dedup_cte('purchase_order', 'purchase_order_id')}
SELECT row_number() OVER (ORDER BY purchase_order_id) AS purchase_record_id,
       purchase_order_id,
       dc.date_id AS created_date,
       strftime(created_at, '%H:%M:%S.%f') AS created_time,
       dl.date_id AS last_updated_date,
       strftime(last_updated, '%H:%M:%S.%f') AS last_updated_time,
       staff_id, counterparty_id, item_code, item_quantity,
       item_unit_price, currency_id,
       dd1.date_id AS agreed_delivery_date,
       dd2.date_id AS agreed_payment_date,
       agreed_delivery_location_id
FROM purchase_order_d
LEFT JOIN dd dc ON CAST(created_at AS DATE) = dc.date
LEFT JOIN dd dl ON CAST(last_updated AS DATE) = dl.date
LEFT JOIN dd dd1 ON CAST(agreed_delivery_date AS DATE) = dd1.date
LEFT JOIN dd dd2 ON CAST(agreed_payment_date AS DATE) = dd2.date
"""

OLTP_FACT_SALES_ORDER_SQL = f"""
WITH {_FACT_CTES},
{_dedup_cte('sales_order', 'sales_order_id')}
SELECT row_number() OVER (ORDER BY sales_order_id) AS sales_record_id,
       sales_order_id,
       dc.date_id AS created_date,
       strftime(created_at, '%H:%M:%S.%f') AS created_time,
       dl.date_id AS last_updated_date,
       strftime(last_updated, '%H:%M:%S.%f') AS last_updated_time,
       staff_id AS sales_staff_id, counterparty_id, units_sold, unit_price,
       currency_id, design_id,
       dd2.date_id AS agreed_payment_date,
       dd1.date_id AS agreed_delivery_date,
       agreed_delivery_location_id
FROM sales_order_d
LEFT JOIN dd dc ON CAST(created_at AS DATE) = dc.date
LEFT JOIN dd dl ON CAST(last_updated AS DATE) = dl.date
LEFT JOIN dd dd1 ON CAST(agreed_delivery_date AS DATE) = dd1.date
LEFT JOIN dd dd2 ON CAST(agreed_payment_date AS DATE) = dd2.date
"""
