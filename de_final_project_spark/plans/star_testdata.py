"""Star-schema operator patterns expressed over the driver testdata.

The reference's 11 table builders run on its OLTP tables (address, staff,
payment, ...), which the driver testdata does not contain; FIXTURES.md §3
maps the roles instead: ``nation ⋈ region`` plays the two-table lookup-join
pattern (dim_staff / dim_counterparty), ``orders``/``lineitem`` play the
fact sources feeding a derived date dimension, ``events`` plays the
incremental keep-latest surface. Each function here is the same plan shape
as the corresponding reference builder (file:line cited per function), on
testdata tables, and is cross-checked against a DuckDB oracle.

All joins against nation/region/dim_date are explicit broadcasts: the
right sides are dimension-sized at any scale factor, so the big side never
shuffles — at 100 TB these stay map-side joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.datetime import date_parts, time_string
from de_final_project_spark.operators.dedup import keep_latest
from de_final_project_spark.operators.surrogate import (
    add_sequence_key,
    add_sequence_key_distributed,
)
from de_final_project_spark.sources.readers import read_testdata


def dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region lookup-join dimension.

    Plan shape of dim_staff / dim_counterparty (reference
    src/process_lambda.py:111-144,175-192): entity table left-joined to a
    broadcast lookup chain, then project/rename."""
    customer = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation")
    region = read_testdata(spark, sf_dir, "region")
    geo = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "left"
    ).select("n_nationkey", "n_name", "r_name")
    return customer.join(
        F.broadcast(geo), customer["c_nationkey"] == geo["n_nationkey"], "left"
    ).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
        F.col("c_mktsegment").alias("market_segment"),
        F.col("c_acctbal").alias("account_balance"),
    )


DIM_CUSTOMER_SQL = """
SELECT c_custkey   AS customer_id,
       c_name      AS customer_name,
       n_name      AS nation_name,
       r_name      AS region_name,
       c_mktsegment AS market_segment,
       c_acctbal   AS account_balance
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


def dim_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier ⋈ nation ⋈ region — same lookup-join pattern as
    dim_customer (reference src/process_lambda.py:175-192)."""
    supplier = read_testdata(spark, sf_dir, "supplier")
    nation = read_testdata(spark, sf_dir, "nation")
    region = read_testdata(spark, sf_dir, "region")
    geo = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "left"
    ).select("n_nationkey", "n_name", "r_name")
    return supplier.join(
        F.broadcast(geo), supplier["s_nationkey"] == geo["n_nationkey"], "left"
    ).select(
        F.col("s_suppkey").alias("supplier_id"),
        F.col("s_name").alias("supplier_name"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
        F.col("s_acctbal").alias("account_balance"),
    )


DIM_SUPPLIER_SQL = """
SELECT s_suppkey AS supplier_id,
       s_name    AS supplier_name,
       n_name    AS nation_name,
       r_name    AS region_name,
       s_acctbal AS account_balance
FROM supplier
LEFT JOIN nation ON s_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


def dim_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection/rename dimension (the dim_currency / dim_design shape,
    reference src/process_lambda.py:147-163): dedup by PK, project."""
    part = read_testdata(spark, sf_dir, "part")
    return keep_latest(part, "p_partkey", "p_partkey").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("p_retailprice").alias("retail_price"),
    )


DIM_PART_SQL = """
SELECT p_partkey     AS part_id,
       p_name        AS part_name,
       p_brand       AS brand,
       p_type        AS part_type,
       p_size        AS part_size,
       p_retailprice AS retail_price
FROM part
"""


def keep_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-by-key dedup (D1, the reference's signature operator —
    src/process_lambda.py:95-199): newest event per user, explicit total
    order (ts desc, event_id desc), plus the HH:MM:SS.ffffff time-string
    derivation (F4, reference :251)."""
    events = read_testdata(spark, sf_dir, "events")
    latest = keep_latest(events, "user_id", ["ts", "event_id"])
    return latest.select(
        "user_id",
        "event_id",
        "ts",
        time_string("ts").alias("event_time"),
        "event_type",
        "value",
    )


KEEP_LATEST_EVENTS_SQL = """
SELECT user_id, event_id, ts,
       strftime(ts, '%H:%M:%S.%f') AS event_time,
       event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


def dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived date dimension (reference src/process_lambda.py:209-242):
    distinct union of o_orderdate and l_shipdate -> 7 date parts
    (Monday=0 day_of_week, English day/month names) -> 1-based date_id in
    ascending date order.

    Unlike the reference's output this keeps the calendar ``date`` column
    (the reference drops it and re-assembles it in fact builders,
    :256 — here the date is the natural join key and a stable hash anchor).
    """
    orders = read_testdata(spark, sf_dir, "orders")
    lineitem = read_testdata(spark, sf_dir, "lineitem")
    dates = (
        orders.select(F.to_date("o_orderdate").alias("date"))
        .unionByName(lineitem.select(F.to_date("l_shipdate").alias("date")))
        .where(F.col("date").isNotNull())
        .distinct()
    )
    parts = date_parts("date")
    with_parts = dates.select("date", *[e.alias(n) for n, e in parts.items()])
    return add_sequence_key(with_parts, "date_id", "date")


DIM_DATE_SQL = """
WITH dates AS (
  SELECT CAST(o_orderdate AS DATE) AS date FROM orders WHERE o_orderdate IS NOT NULL
  UNION
  SELECT CAST(l_shipdate AS DATE) FROM lineitem WHERE l_shipdate IS NOT NULL
)
SELECT row_number() OVER (ORDER BY date) AS date_id,
       date,
       year(date)      AS year,
       month(date)     AS month,
       day(date)       AS day,
       isodow(date) - 1 AS day_of_week,
       dayname(date)   AS day_name,
       monthname(date) AS month_name,
       quarter(date)   AS quarter
FROM dates
"""


def _fact_lineitem_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared star build behind both fact_lineitem variants:
    lineitem enriched with its order, calendar dates replaced by
    dim_date surrogate keys via broadcast joins, project/rename —
    everything except the sequence-key strategy."""
    lineitem = read_testdata(spark, sf_dir, "lineitem")
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    # dim_date is joined once per date role; without a cache Catalyst
    # duplicates the whole derivation subtree (two extra full scans of
    # lineitem+orders). The dimension is thousands of rows — cache it.
    dd = dim_date(spark, sf_dir).select("date", "date_id").cache()

    li = lineitem.withColumn("ship_date_cal", F.to_date("l_shipdate"))
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left")
    joined = joined.withColumn("order_date_cal", F.to_date("o_orderdate"))

    ship_dd = F.broadcast(dd.withColumnRenamed("date_id", "ship_date"))
    joined = joined.join(ship_dd, joined["ship_date_cal"] == ship_dd["date"], "left").drop(
        "date"
    )
    order_dd = F.broadcast(dd.withColumnRenamed("date_id", "order_date"))
    joined = joined.join(
        order_dd, joined["order_date_cal"] == order_dd["date"], "left"
    ).drop("date")

    projected = joined.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supplier_key"),
        F.col("o_custkey").alias("customer_key"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extended_price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        "ship_date",
        "order_date",
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").alias("order_total_price"),
    )
    # The sequence ordering is EVERY output column, not just the business
    # key: (order_key, line_number, part_key, supplier_key) is not
    # guaranteed unique in the synthetic data (sf0.001 has a duplicate
    # group), and any tie among rows that differ in some other column
    # would let two engines assign the ids differently. Ordering by all
    # columns makes remaining ties full-duplicate rows, where assignment
    # is value-indistinguishable. Runtime cost is nil — lexicographic
    # comparison is decided at the first differing column, almost always
    # order_key. Mirrors the oracle's ORDER BY exactly (both sides sort
    # ASC NULLS LAST).
    return projected


def fact_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship fact builder (the fact_sales_order shape, reference
    src/process_lambda.py:370-435): the shared star build plus a per-run
    sequence record id.

    Physical shape: lineitem never shuffles for the date joins (broadcast);
    the only wide exchanges are the orders join (shuffled hash join on
    orderkey — at 100 TB both sides bucket on orderkey) and the sequence
    key's range repartition.

    Sequence-key strategy (SURVEY.md §7.4 risk 1): the DEFAULT is the
    distributed form — range-partition on the ordering, local
    row_number, broadcast O(partitions) offsets — because the
    single-window global row_number the reference's ids imply costs a
    measured 3× at just 600 k rows (sf0.1: 2.79 s vs 0.94 s, round-5
    bench) and grows super-linearly. Both strategies produce the SAME
    key assignment for the same total ordering (oracle-checked
    bit-identical against FACT_LINEITEM_SQL); fact_lineitem_parity_key
    keeps the single-window form as the documented reference-parity
    demo."""
    projected = _fact_lineitem_projected(spark, sf_dir)
    return add_sequence_key_distributed(
        projected, "sales_record_id", projected.columns
    )


def fact_lineitem_parity_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity twin of fact_lineitem: identical star build and
    output, but the sequence key comes from the single-window global
    row_number — the literal Spark transcription of the reference's
    ``df.insert(0, key, range(1, len(df)+1))`` (src/process_lambda.py:433,
    W2). Kept as the documented parity demo and the measured cost of the
    funnel; the default fact path is the distributed form."""
    projected = _fact_lineitem_projected(spark, sf_dir)
    return add_sequence_key(projected, "sales_record_id", projected.columns)


FACT_LINEITEM_SQL = """
WITH dd AS (
  SELECT row_number() OVER (ORDER BY date) AS date_id, date
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS date FROM orders WHERE o_orderdate IS NOT NULL
    UNION
    SELECT CAST(l_shipdate AS DATE) FROM lineitem WHERE l_shipdate IS NOT NULL
  )
)
SELECT row_number() OVER (ORDER BY
         l_orderkey, l_linenumber, l_partkey, l_suppkey, o_custkey,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
         l_linestatus, dd_ship.date_id, dd_ord.date_id, o_orderstatus,
         o_totalprice) AS sales_record_id,
       l_orderkey     AS order_key,
       l_linenumber   AS line_number,
       l_partkey      AS part_key,
       l_suppkey      AS supplier_key,
       o_custkey      AS customer_key,
       l_quantity     AS quantity,
       l_extendedprice AS extended_price,
       l_discount     AS discount,
       l_tax          AS tax,
       l_returnflag   AS return_flag,
       l_linestatus   AS line_status,
       dd_ship.date_id  AS ship_date,
       dd_ord.date_id   AS order_date,
       o_orderstatus  AS order_status,
       o_totalprice   AS order_total_price
FROM lineitem
LEFT JOIN orders ON l_orderkey = o_orderkey
LEFT JOIN dd dd_ship ON CAST(l_shipdate AS DATE) = dd_ship.date
LEFT JOIN dd dd_ord  ON CAST(o_orderdate AS DATE) = dd_ord.date
"""
