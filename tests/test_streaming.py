"""Structured Streaming parity tests: each streaming operator's
AvailableNow output must equal its batch twin on the same data."""

import pyspark.sql.functions as F
import pytest

from de_final_project_spark.plans.analytics import events_hourly, events_sessionized
from de_final_project_spark.sources.readers import read_testdata
from de_final_project_spark.streaming.events import (
    dedup_events_stream,
    hourly_rollup_stream,
    run_available_now,
    sessionize_stream,
    stream_events,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return stream_events(spark, SF_DIR)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_hourly_rollup_matches_batch(spark, events_stream):
    run_available_now(
        hourly_rollup_stream(events_stream), "hourly_out", output_mode="complete"
    )
    got = spark.table("hourly_out")
    want = events_hourly(spark, SF_DIR).drop("n_users")
    cols = ["hour", "event_type", "n_events", "sum_value"]
    assert _rows(got.select(*cols), cols) == _rows(want.select(*cols), cols)


def test_stream_sessionize_matches_batch(spark, events_stream):
    run_available_now(
        sessionize_stream(events_stream), "sessions_out", output_mode="complete"
    )
    got = spark.table("sessions_out")
    want = events_sessionized(spark, SF_DIR).drop("sum_value")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got.select(*cols), cols) == _rows(want.select(*cols), cols)


def test_stream_dedup_preserves_distinct_events(spark, events_stream):
    run_available_now(dedup_events_stream(events_stream), "dedup_out")
    got = spark.table("dedup_out")
    batch = read_testdata(spark, SF_DIR, "events")
    # event_id is unique in the source, so dedup must be a no-op pass-through
    assert got.count() == batch.count()
    assert got.select(F.countDistinct("event_id")).collect()[0][0] == batch.count()
