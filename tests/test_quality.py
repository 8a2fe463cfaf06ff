"""Data-quality gate: one-pass row checks, unique-key and FK checks."""

import pyspark.sql.functions as F

from de_final_project_spark.operators.quality import (
    accepted_values,
    check_fk,
    check_unique_key,
    in_range,
    matches,
    not_null,
    quality_report,
    run_row_checks,
)


def _report_dict(df):
    return {r["check"]: (r["violations"], r["total"]) for r in df.collect()}


def test_row_checks_single_pass(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "GBP"),
            (2, None, -5.0, "USD"),
            (3, "bad-email", 200.0, "XXX"),
            (None, "c@y.org", 50.0, "EUR"),
        ],
        "id long, email string, amount double, ccy string",
    )
    rep = _report_dict(
        run_row_checks(
            df,
            not_null("id", "email"),
            in_range("amount", 0, 100),
            accepted_values("ccy", ["GBP", "USD", "EUR"]),
            matches("email", r"^[^@]+@[^@]+\.[^@]+$"),
        )
    )
    assert rep["not_null:id"] == (1, 4)
    assert rep["not_null:email"] == (1, 4)
    assert rep["in_range:amount"] == (2, 4)  # -5 and 200
    assert rep["accepted_values:ccy"] == (1, 4)
    # null email rows don't match the regex and aren't counted by rlike
    assert rep["matches:email"][0] == 1

    # the whole row-check report must come from ONE aggregate (one scan):
    import contextlib
    import io

    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_row_checks(df, not_null("id"), in_range("amount", 0, 100)).explain(
            "formatted"
        )
    # one scan node in the plan details -> all checks share one pass
    assert len(re.findall(r"^\(\d+\) Scan", buf.getvalue(), re.M)) == 1


def test_unique_key_and_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20), (3, 99), (4, None)],
        "id long, parent_id long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    rep = _report_dict(
        quality_report(
            [
                check_unique_key(child, ["id"]),
                check_fk(child, "parent_id", parent, "pid"),
            ]
        )
    )
    assert rep["unique_key:id"] == (1, 5)  # one extra row for id=2
    assert rep["fk:parent_id"] == (1, 5)  # 99 is an orphan; null not counted


def test_unique_key_empty_input(spark):
    empty = spark.createDataFrame([], "id long")
    (row,) = check_unique_key(empty, ["id"]).collect()
    assert (row["violations"], row["total"]) == (0, 0)


def test_pseudonymization_tokens_joinable_and_nonreversible(spark):
    """Tokens are unique per customer, reproduce on the fact side (the
    revenue join covers every customer with orders), and no output
    column leaks the raw key or full name."""
    from pyspark.sql import functions as F

    from de_final_project_spark.operators.privacy import (
        pseudonymize_customers,
        pseudonymized_revenue_join,
    )
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    dim = pseudonymize_customers(spark, sf).cache()
    n_cust = read_testdata(spark, sf, "customer").count()
    assert dim.count() == n_cust
    assert dim.select("customer_token").distinct().count() == n_cust
    assert set(dim.columns) == {
        "customer_token",
        "name_masked",
        "nation_key",
        "acctbal_band_lo",
        "acctbal_band_hi",
        "segment",
    }
    assert dim.where(~F.col("name_masked").startswith("***")).count() == 0
    assert dim.where(
        F.col("acctbal_band_hi") - F.col("acctbal_band_lo") != 500
    ).count() == 0
    joined = pseudonymized_revenue_join(spark, sf)
    n_cust_with_orders = (
        read_testdata(spark, sf, "orders").select("o_custkey").distinct().count()
    )
    assert joined.count() == n_cust_with_orders
    dim.unpersist()
