"""SQL entry path: the engine is usable through plain Spark SQL, not just
the DataFrame API. For queries whose oracle SQL is pure ANSI (no
DuckDB-specific functions), running that exact string through
``spark.sql`` over registered testdata views must produce the same
result as the DataFrame implementation — one logical surface, two
front-ends, one Catalyst plan space."""

import pytest

import __spark_entry__ as entry_mod
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"

# Oracle strings that are ANSI enough to run on Spark SQL unchanged.
ANSI_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "top_orders_per_customer",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "customer_value_tiles",
    "customers_without_orders",
    "late_shipment_orders",
    "idle_rich_customers",
    "orders_priority_pivot",
    "copurchased_parts",
    "doc_length_histogram",
    "source_quality_report",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    for t in TABLES:
        read_testdata(spark, SF_DIR, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_sql_string_matches_dataframe(spark, name):
    sql = entry_mod.oracle_sql()[name]
    df_api = entry_mod.queries()[name](spark, SF_DIR)
    sql_api = spark.sql(sql).select(*df_api.columns)  # align column order
    assert _rows(sql_api) == _rows(df_api)


def test_versioned_table_sql_views(spark, tmp_path):
    """The lakehouse is a SQL citizen: snapshots (with time travel and
    stats-pruned reads) and change feeds register as views, and plain
    spark.sql joins them like any other relation."""
    from de_final_project_spark.operators.txlog import VersionedTable

    t = VersionedTable(str(tmp_path / "t"), partition_col="pb",
                       stats_cols=["id"])
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "id long, s string, pb int"
    )
    t.overwrite(mk([(1, "a", 0), (2, "b", 1)]))
    t.merge(spark, mk([(2, "B", 1), (3, "c", 0)]), ["id"])

    t.register_sql(spark, "gold_head")
    t.register_sql(spark, "gold_v1", version=1)
    t.register_sql(spark, "gold_small", where="id <= 2")
    t.register_changes_sql(spark, "gold_changes", ["id"], 1, 2)
    try:
        assert spark.sql(
            "SELECT s FROM gold_head WHERE id = 2"
        ).first()["s"] == "B"
        assert spark.sql(
            "SELECT s FROM gold_v1 WHERE id = 2"
        ).first()["s"] == "b"
        assert {
            r["id"] for r in spark.sql("SELECT id FROM gold_small").collect()
        } == {1, 2}
        got = {
            (r["id"], r["_change_type"])
            for r in spark.sql(
                "SELECT id, _change_type FROM gold_changes"
            ).collect()
        }
        assert got == {(2, "update"), (3, "insert")}
        # views compose in ordinary SQL
        joined = spark.sql(
            "SELECT h.id FROM gold_head h JOIN gold_v1 v USING (id) "
            "WHERE h.s <> v.s"
        ).collect()
        assert [r["id"] for r in joined] == [2]
    finally:
        for v in ("gold_head", "gold_v1", "gold_small", "gold_changes"):
            spark.catalog.dropTempView(v)
