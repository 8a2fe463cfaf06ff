"""As-of join semantics: backward lookup, same-timestamp tie goes to the
right row, no-match rows get nulls, latest-of-several-ties wins."""

from datetime import datetime

import pyspark.sql.functions as F

from de_final_project_spark.operators.asof import asof_join_backward


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # before any right row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 10.0, 100),
            ("u1", _ts("2024-01-01 11:00:00"), 20.0, 101),
            ("u2", _ts("2024-01-01 09:30:00"), 30.0, 102),
        ],
        "user_id string, ts timestamp, state double, rid long",
    )
    out = {
        r["event_id"]: r["state"]
        for r in asof_join_backward(
            left, right, ["user_id"], "ts", ["state"], tiebreak_col="rid"
        ).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None}


def test_asof_tie_right_wins_and_latest_tiebreak(spark):
    # Left event exactly at a right timestamp sees that right row; two
    # right rows at the same instant resolve by the tiebreak column.
    t = _ts("2024-01-01 10:00:00")
    left = spark.createDataFrame(
        [(1, "u", t)], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", t, 1.0, 7), ("u", t, 2.0, 9), ("u", t, 3.0, 8)],
        "user_id string, ts timestamp, state double, rid long",
    )
    (row,) = asof_join_backward(
        left, right, ["user_id"], "ts", ["state"], tiebreak_col="rid"
    ).collect()
    assert row["state"] == 2.0  # rid=9 sorts last among the ties
    assert "rid" not in row.__fields__  # injected tiebreak is dropped


def test_asof_payload_collision_raises(spark):
    df = spark.range(1).select(
        F.col("id"), F.lit("u").alias("user_id"), F.current_timestamp().alias("ts")
    )
    try:
        asof_join_backward(df, df.withColumnRenamed("id", "x"), ["user_id"], "ts", ["ts"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
