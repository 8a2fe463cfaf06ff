"""events_gapfill invariants: dense grid, zero-count gaps, LOCF carry."""

from __future__ import annotations

import pyspark.sql.functions as F

from de_final_project_spark.plans.temporal import events_gapfill

SF_DIR = "/root/testdata/sf0.001"


def test_grid_is_dense_and_gaps_zero(spark):
    out = events_gapfill(spark, SF_DIR).cache()
    # dense: per type, row count == span hours + 1, hours are distinct
    span = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("hour").alias("nd"),
        ((F.unix_timestamp(F.max("hour")) - F.unix_timestamp(F.min("hour"))) / 3600 + 1)
        .cast("long")
        .alias("expect"),
    )
    assert span.where("n <> expect OR nd <> n").count() == 0
    # gaps carry zero count and a non-null fill once any value was seen
    assert out.where("is_gap AND event_count <> 0").count() == 0
    first_hours = out.groupBy("event_type").agg(F.min("hour").alias("h0"))
    non_first = out.join(first_hours, "event_type").where("hour <> h0")
    assert non_first.where(F.col("filled_avg").isNull()).count() == 0


def test_locf_carries_last_observed(spark):
    rows = (
        events_gapfill(spark, SF_DIR)
        .orderBy("event_type", "hour")
        .collect()
    )
    last = {}
    for r in rows:
        k = r["event_type"]
        if not r["is_gap"]:
            last[k] = r["filled_avg"]
        elif k in last:
            assert r["filled_avg"] == last[k]


def test_ewma_hand_computed(spark):
    """EWMA with alpha=1/2 over a hand-built 3-event frame: weights
    oldest->newest are 1,2,4 over a denominator of 7 (adjust form)."""
    import datetime as dt

    import pyspark.sql.functions as F  # noqa: F401

    from de_final_project_spark.plans import temporal as tp

    rows = [
        (1, 9, dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, 9, dt.datetime(2024, 1, 1, 0, 1, 0), 2.0),
        (3, 9, dt.datetime(2024, 1, 1, 0, 2, 0), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    import de_final_project_spark.sources.readers as readers

    orig = readers.read_testdata
    try:
        readers_patch = lambda s, d, t: df  # noqa: E731
        tp.read_testdata = readers_patch
        out = {r["event_id"]: r["ewma"] for r in tp.user_value_ewma(spark, "x").collect()}
    finally:
        tp.read_testdata = orig
    # frame [1]: 1.0; frame [1,2]: (1*1 + 2*2)/3; frame [1,2,4]:
    # (1*1 + 2*2 + 4*4)/7  (quantized by 64 exactly: values are ints)
    assert out[1] == 1.0
    assert out[2] == (1 + 2 * 2) / 3
    assert out[3] == (1 + 2 * 2 + 4 * 4) / 7
