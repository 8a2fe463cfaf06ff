"""Bucketed (pre-shuffled) storage for co-located joins.

The reference rewrites every star table wholesale each run
(src/warehousing_lambda.py:64-71) and joins on a single node, so data
placement never matters there. At 100 TB the dominant cost of
lineitem⋈orders is the shuffle of both fact tables on orderkey — unless
the tables are *stored* bucketed on the join key, in which case Spark's
scan reports the hash distribution and the sort-merge join runs with no
exchange on either side: the shuffle is paid once at write time and
amortized over every subsequent join.

This module materializes bucketed twins of the two big tables into the
session catalog (`bucketBy(n, key).sortBy(key)`) and exposes the
co-located join; tests/test_bucketing.py asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

N_BUCKETS = 8
LINEITEM_TBL = "lineitem_bucketed"
ORDERS_TBL = "orders_bucketed"


def build_bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> None:
    """Write lineitem/orders bucketed + sorted on the join key. The bucket
    count is the knob that becomes 'number of reducers' for every later
    co-located join; at 100 TB pick buckets so each is a few hundred MB."""
    (
        read_testdata(spark, sf_dir, "lineitem")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(LINEITEM_TBL)
    )
    (
        read_testdata(spark, sf_dir, "orders")
        .write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(ORDERS_TBL)
    )


def colocated_order_revenue(spark: SparkSession) -> DataFrame:
    """lineitem⋈orders on the bucket key, revenue per order status.

    With both sides bucketed on the key the join needs no exchange — each
    task reads bucket i of both tables. Only the final small aggregate
    shuffles (O(groups), not O(rows))."""
    li = spark.table(LINEITEM_TBL)
    o = spark.table(ORDERS_TBL)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("gross_revenue"),
        )
    )


def shuffled_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME join/aggregate from plain parquet scans — both fact sides
    pay an exchange on orderkey. Benchmarked next to
    ``colocated_order_revenue`` so the bucketed write's amortized payoff
    is measured, not just plan-asserted."""
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("gross_revenue"),
        )
    )


def drop_bucketed_tables(spark: SparkSession) -> None:
    for t in (LINEITEM_TBL, ORDERS_TBL):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
