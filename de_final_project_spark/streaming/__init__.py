"""Structured Streaming analogs of the reference's micro-batch pipeline."""

from de_final_project_spark.streaming.events import (  # noqa: F401
    dedup_events_stream,
    hourly_rollup_stream,
    run_available_now,
    sessionize_stream,
    stream_events,
)
