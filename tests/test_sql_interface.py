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
