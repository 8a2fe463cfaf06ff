"""Bucketed co-located join: the lineitem⋈orders join must plan with no
exchange on either side (the whole point of paying the bucketed write),
and results must match the plain shuffle join."""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from de_final_project_spark.plans.bucketing import (
    build_bucketed_tables,
    colocated_order_revenue,
    drop_bucketed_tables,
)
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    build_bucketed_tables(spark, SF_DIR)
    yield
    drop_bucketed_tables(spark)


def test_colocated_join_has_no_join_exchange(spark, bucketed):
    # Forbid broadcast so the test exercises the bucketed sort-merge path
    # (at real scale neither fact side would broadcast anyway).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = colocated_order_revenue(spark)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # Exactly one exchange: the final tiny aggregate. The join itself
        # reads matching buckets of both tables with no repartition.
        assert plan.count("Exchange") <= 2  # tree line + detail line
        assert plan.count("hashpartitioning(") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_plain_join(spark, bucketed):
    got = sorted(map(tuple, colocated_order_revenue(spark).collect()))
    li = read_testdata(spark, SF_DIR, "lineitem")
    o = read_testdata(spark, SF_DIR, "orders")
    want = sorted(
        map(
            tuple,
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                .cast("double")
                .alias("gross_revenue"),
            )
            .collect(),
        )
    )
    assert got == want
