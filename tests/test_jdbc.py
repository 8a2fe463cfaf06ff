"""LIVE JDBC integration tests (S1/S2/S9/K3) against embedded Derby.

The sandbox has no database server, but Spark ships Derby's embedded
JDBC driver (derby-*.jar on every executor classpath) and a built-in
DerbyDialect — so the reference's extract/load JDBC paths
(src/ingestion_lambda.py:157-169, src/warehousing_lambda.py:64-71) can
be executed for real: write over JDBC, scan back with pushdown, probe a
watermark. Complemented by a DuckDB parse/execute check of the generated
pushdown SQL so the query builder is validated against a second engine.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from de_final_project_spark.sources.readers import (
    jdbc_pushdown_query,
    read_jdbc_table,
    read_testdata,
)
from de_final_project_spark.sources.sinks import write_jdbc_overwrite

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def props():
    return {"driver": DRIVER}


def test_jdbc_roundtrip_k3_s9(spark, derby_url, props):
    """K3 batched overwrite -> S9 full scan: values survive the trip."""
    src = read_testdata(spark, SF, "region")
    write_jdbc_overwrite(src, derby_url, "region_wh", properties=props)
    back = read_jdbc_table(spark, derby_url, "region_wh", properties=props)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jdbc_pushdown_s1(spark, derby_url, props):
    """S1 scan with projection + predicate pushed into the derived-table
    query the DB executes."""
    # Spark quotes identifiers on CREATE TABLE, so unquoted identifiers in
    # the pushdown SQL (which Derby folds to upper case) only resolve if
    # the warehouse table is written upper-case — the usual convention.
    src = read_testdata(spark, SF, "customer")
    src_uc = src.toDF(*[c.upper() for c in src.columns])
    write_jdbc_overwrite(src_uc, derby_url, "customer_wh", properties=props)
    out = read_jdbc_table(
        spark,
        derby_url,
        "customer_wh",
        properties=props,
        predicate="c_nationkey < 5",
        columns=["c_custkey", "c_nationkey"],
    )
    assert out.columns == ["C_CUSTKEY", "C_NATIONKEY"]  # Derby upper-cases
    expected = src.where("c_nationkey < 5").select("c_custkey", "c_nationkey")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expected.collect()))


def test_jdbc_watermark_probe_s2(spark, derby_url, props):
    """S2: the max-watermark probe and delta predicate run against a live
    JDBC relation (the reference's hand-built max(last_updated) query,
    src/ingestion_lambda.py:157-163)."""
    from pyspark.sql import functions as F

    rows = [
        (1, dt.datetime(2024, 1, 1, 9, 0, 0)),
        (2, dt.datetime(2024, 2, 1, 9, 0, 0)),
        (3, dt.datetime(2024, 3, 1, 9, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "id int, last_updated timestamp")
    write_jdbc_overwrite(df, derby_url, "versioned_src", properties=props)
    jdbc_df = read_jdbc_table(spark, derby_url, "versioned_src", properties=props)

    cutoff = "2024-01-15 00:00:00"
    delta = jdbc_df.filter(F.col("LAST_UPDATED") > F.lit(cutoff).cast("timestamp"))
    probe = delta.agg(F.max("LAST_UPDATED").alias("mx")).collect()[0].mx
    assert probe == dt.datetime(2024, 3, 1, 9, 0, 0)
    assert delta.count() == 2


def test_pushdown_sql_parses_and_runs_in_duckdb():
    """The generated derived-table SQL is plain ANSI: a second engine
    (DuckDB) must parse AND execute it against the same tables."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    sql = jdbc_pushdown_query(
        "orders",
        columns=["o_orderkey", "o_totalprice"],
        predicate="o_totalprice > 100000",
    )
    out = con.execute(sql).df()
    assert list(out.columns) == ["o_orderkey", "o_totalprice"]
    n = con.execute(
        "SELECT count(*) FROM orders WHERE o_totalprice > 100000"
    ).fetchone()[0]
    assert len(out) == n > 0


def test_jdbc_partitioned_scan_matches_single(spark, derby_url, props):
    """Partitioned S1/S9: a 4-way range-partitioned scan (bounds derived
    by the min/max probe) runs 4 parallel range queries and returns
    exactly the single-connection result set."""
    from de_final_project_spark.sources.readers import jdbc_partition_bounds

    src = read_testdata(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src_uc = src.toDF(*[c.upper() for c in src.columns])
    write_jdbc_overwrite(src_uc, derby_url, "orders_wh", properties=props)

    lo, hi = jdbc_partition_bounds(spark, derby_url, "orders_wh", "O_ORDERKEY", props)
    assert lo is not None and hi > lo

    part = read_jdbc_table(
        spark,
        derby_url,
        "orders_wh",
        properties=props,
        partition_column="O_ORDERKEY",
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    single = read_jdbc_table(spark, derby_url, "orders_wh", properties=props)
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, single.collect()))
    # no partition is empty and none holds everything: the range stride
    # actually spread the work
    sizes = part.rdd.glom().map(len).collect()
    assert len(sizes) == 4 and max(sizes) < single.count()


def test_jdbc_partitioned_scan_with_predicate(spark, derby_url, props):
    """Partitioned scan + pushdown predicate: bounds honor the predicate
    and the result equals the filtered single-connection read."""
    part = read_jdbc_table(
        spark,
        derby_url,
        "orders_wh",
        properties=props,
        predicate="O_TOTALPRICE > 100000",
        columns=["O_ORDERKEY", "O_TOTALPRICE"],
        partition_column="O_ORDERKEY",
        num_partitions=4,
    )
    single = read_jdbc_table(
        spark,
        derby_url,
        "orders_wh",
        properties=props,
        predicate="O_TOTALPRICE > 100000",
        columns=["O_ORDERKEY", "O_TOTALPRICE"],
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, single.collect()))
