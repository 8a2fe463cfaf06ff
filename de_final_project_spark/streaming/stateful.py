"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for per-key logic Spark's built-in stateful operators
(windowed agg, session window, stream dedup) cannot express.

Demonstrated operator: a per-user lifetime profile (event count, value
total, first/last seen) maintained across micro-batches. The built-in
alternative would be ``complete``-mode aggregation, which rewrites the
whole result table each batch; keyed state emits only the touched keys —
the shape that scales to billions of users with RocksDB state backing.

State flows Arrow-batched (pandas per group-batch), so the Python hop is
vectorized, not per-row. The reference's analog is its hand-rolled
watermark file — a single global key of state (SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "first_seen timestamp, last_seen timestamp"
)
STATE_SCHEMA = "n long, total double, first_us long, last_us long"

_US = 1_000_000


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, first_us, last_us = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, total, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_seen": [pd.Timestamp(first_us, unit="us")],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profile_stateful(events: DataFrame) -> DataFrame:
    """Running per-user profile over an event stream; emits the updated
    profile row for every user touched in the micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------------
# Inactivity (gap) detection via event-time timeouts
# ----------------------------------------------------------------------

INACTIVITY_GAP_MIN = 30

GAP_OUTPUT_SCHEMA = (
    "user_id long, last_seen timestamp, n_events long, went_inactive boolean"
)
GAP_STATE_SCHEMA = "n long, last_us long"


def _detect_inactivity(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-user gap detector: while events keep arriving, update
    last-seen and re-arm an event-time timeout at last_seen + gap; when
    the watermark passes that deadline with no new data, the state TIMES
    OUT — emit the inactivity record and drop the state. This
    emit-on-silence shape (absence of data as a signal) is exactly what
    windowed aggregation cannot express: windows only fire where rows
    exist."""
    if state.hasTimedOut:
        n, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "went_inactive": [True],
            }
        )
        return
    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        ts_us = pdf["ts"].astype("int64") // 1000
        last_us = max(last_us, int(ts_us.max()))
    state.update((n, last_us))
    deadline_ms = last_us // 1000 + INACTIVITY_GAP_MIN * 60 * 1000
    state.setTimeoutTimestamp(deadline_ms)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "went_inactive": [False],
        }
    )


def user_inactivity_stateful(events: DataFrame) -> DataFrame:
    """Gap-detection stream: emits a live profile row per touched user
    and a terminal ``went_inactive`` row once the watermark passes their
    last event by ``INACTIVITY_GAP_MIN`` minutes. Requires a watermark on
    ts (event-time timeouts are measured against it)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _detect_inactivity,
            outputStructType=GAP_OUTPUT_SCHEMA,
            stateStructType=GAP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ----------------------------------------------------------------------
# Streaming transition extraction (sequence state)
# ----------------------------------------------------------------------

TRANSITION_OUTPUT_SCHEMA = "user_id long, from_type string, to_type string"
TRANSITION_STATE_SCHEMA = "last_type string, last_us long, last_id long"


def _emit_transitions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-user sequence state: remember the last event (type, ts, id)
    across micro-batches and emit one (from, to) row per consecutive
    pair. Events inside a batch sort by (ts, event_id) — the same total
    order the batch transition matrix uses — so the streaming output is
    a row-level match for the batch lag() formulation as long as arrival
    respects event time per key (guaranteed under AvailableNow file
    replay; with true out-of-order arrival a watermark + buffer variant
    applies)."""
    last_type, last_us, last_id = (
        state.get if state.exists else (None, None, None)
    )
    rows = []
    for pdf in pdfs:
        pdf = pdf.assign(_us=pdf["ts"].astype("int64") // 1000).sort_values(
            ["_us", "event_id"]
        )
        for et, us, eid in zip(pdf["event_type"], pdf["_us"], pdf["event_id"]):
            if last_type is not None:
                rows.append((key[0], last_type, et))
            last_type, last_us, last_id = et, int(us), int(eid)
    state.update((last_type, last_us, last_id))
    yield pd.DataFrame(rows, columns=["user_id", "from_type", "to_type"])


def user_transitions_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of plans/temporal.event_transition_matrix's pair
    extraction: consecutive event-type pairs per user, emitted
    incrementally with one tiny state tuple per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def event_transitions_streamed(spark, sf_dir: str) -> DataFrame:
    """Driver-checkable streaming query: run the stateful transition
    extraction as a REAL stream and return its batch-aggregated output.

    The events table is replayed as an AvailableNow file stream in two
    time-split micro-batches (split before/after the corpus midpoint, so
    within-user arrival respects event time — the precondition
    ``_emit_transitions`` documents). The keyed state tuple carries each
    user's last event across the batch boundary; the memory-sink rows
    are then aggregated to (from_type, to_type, n_transitions), which
    must equal the batch ``lag()`` formulation exactly — the oracle
    restates that batch form, so this is the correctness gate for the
    streaming family's semantics, not a batch stand-in.

    Reference analog: the event-notification-chained warehouse hop
    (SURVEY.md §2.10); the state tuple is the per-key generalization of
    its single global watermark record.
    """
    import os

    from pyspark.sql import functions as F

    from de_final_project_spark.session import scratch_dir
    from de_final_project_spark.sources.readers import read_testdata

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # Median event time as the batch cut: both halves non-trivial at any
    # SF, and a time split keeps per-user arrival ordered by event time.
    cut = ev.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("cut")
    ).collect()[0]["cut"]
    src = scratch_dir("transitions_replay")
    # Written a/ then b/ so file-source mtime order replays time order.
    ev.where(F.col("ts") <= F.lit(cut)).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    ev.where(F.col("ts") > F.lit(cut)).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    sink = "transitions_streamed_sink"
    spark.catalog.dropTempView(sink)
    # NOTE deliberately NOT volume-sized (session.stream_state_partitions):
    # this operator's per-partition cost is the Python state function
    # itself (a per-row loop), so fewer partitions = less parallelism —
    # measured 4.6 s at 32 state partitions vs 9.5 s volume-sized at
    # sf0.1. The JVM-stateful replays (window agg, interval join) have
    # the opposite profile and DO size from volume.
    q = (
        user_transitions_stateful(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


EVENT_TRANSITIONS_STREAMED_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
)
SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
"""
