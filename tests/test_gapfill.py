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
