"""Date/time and text expression tests — the pandas↔Spark semantic gaps
(SURVEY.md §7.4 risk 2) pinned explicitly."""

import pyspark.sql.functions as F

from de_final_project_spark.functions.datetime import (
    date_parts,
    day_of_week_monday0,
    time_string,
)
from de_final_project_spark.functions.text import (
    fingerprint,
    stopword_count,
    token_count,
    total_token_chars,
)


def _one(spark, expr, value, schema="v string"):
    return spark.createDataFrame([(value,)], schema).select(expr.alias("r")).collect()[0].r


def test_day_of_week_monday0(spark):
    # 2024-01-01 was a Monday; pandas dt.day_of_week == 0.
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-07",)], "d string"
    ).select(F.to_date("d").alias("d"))
    vals = [r[0] for r in df.select(day_of_week_monday0("d")).orderBy("d").collect()]
    assert vals == [0, 6]


def test_time_string_microseconds(spark):
    df = spark.createDataFrame([("2024-01-01 09:08:07.123456",)], "t string").select(
        F.to_timestamp("t").alias("t")
    )
    assert df.select(time_string("t")).collect()[0][0] == "09:08:07.123456"


def test_time_string_midnight(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "t string").select(
        F.to_timestamp("t").alias("t")
    )
    assert df.select(time_string("t")).collect()[0][0] == "00:00:00.000000"


def test_date_parts_full(spark):
    df = spark.createDataFrame([("2024-06-15",)], "d string").select(
        F.to_date("d").alias("date")
    )
    row = df.select(
        *[e.alias(n) for n, e in date_parts("date").items()]
    ).collect()[0]
    assert (row.year, row.month, row.day) == (2024, 6, 15)
    assert row.day_of_week == 5  # Saturday
    assert row.day_name == "Saturday"
    assert row.month_name == "June"
    assert row.quarter == 2


def test_token_count(spark):
    assert _one(spark, token_count("v"), "a  b\tc\nd") == 4
    assert _one(spark, token_count("v"), "") == 0
    assert _one(spark, token_count("v"), "   ") == 0
    assert _one(spark, token_count("v"), "single") == 1


def test_total_token_chars(spark):
    assert _one(spark, total_token_chars("v"), "ab  cde") == 5
    assert _one(spark, total_token_chars("v"), "") == 0


def test_stopword_count(spark):
    assert _one(spark, stopword_count("v"), "The cat and THE dog") == 3


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a = _one(spark, fingerprint("v"), "Hello   World")
    b = _one(spark, fingerprint("v"), "  hello world ")
    c = _one(spark, fingerprint("v"), "hello worlds")
    assert a == b and a != c
