"""Structured Streaming over the events table.

The reference is a scheduler-driven micro-batch pipeline (EventBridge
rate(20 min) -> watermark file -> incremental extract; SURVEY.md §2.10).
Spark's native expression of the same concepts:

- file-source ``readStream`` + ``Trigger.AvailableNow`` = incremental
  batch over whatever accumulated since the last checkpoint (the
  reference's 20-minute cycle without the hand-rolled watermark file);
- ``withWatermark`` + windowed aggregation = late-data handling the
  reference approximates by re-running keep-latest dedup each cycle;
- ``dropDuplicatesWithinWatermark`` = the keep-latest/idempotent-ingest
  semantics under true streaming;
- ``session_window`` = sessionization, unavailable in the reference.

All transformations are identical expressions to their batch twins in
plans/analytics.py, so streaming output can be verified against the batch
result on the same data (tests/test_streaming.py does exactly that).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts {ts_type}, user_id long, event_type string, "
    "value double, props string"
)
SESSION_GAP = "30 minutes"


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    File streams require a declared schema, and the producer's physical
    encoding for ``ts`` has varied between TIMESTAMP(NANOS) — which Spark
    can only surface as epoch-nanos long under the nanosAsLong conf — and
    plain TIMESTAMP(MICROS). Sniff the parquet footer (a metadata-only
    read of one file) and declare the matching schema, converting nanos
    to a micros timestamp exactly as the batch reader does, so the stream
    is correct under either encoding.
    """
    path = os.path.join(sf_dir, "events.parquet")
    ts_type = None
    try:
        import pyarrow.parquet as pq

        arrow_t = str(pq.read_schema(path).field("ts").type)
        # int64 here means the producer wrote raw epoch integers; every
        # producer of this table has meant epoch-NANOS by that (the same
        # assumption the batch reader makes), and timestamp[ns] always
        # surfaces as nanos-long under the conf set below.
        ts_type = "long" if (arrow_t.startswith("timestamp[ns") or arrow_t == "int64") else "timestamp"
    except Exception:
        # pyarrow missing, or an unreadable/corrupt footer (ArrowInvalid is
        # a ValueError, so a narrow except would let it escape raw).
        # Conf-aware batch probe instead — under a session that already has
        # nanosAsLong=true a NANOS column arrives as bigint, which the
        # fixed "timestamp" default would misdeclare.
        try:
            ts_type = "long" if dict(spark.read.parquet(path).dtypes).get("ts") == "bigint" else "timestamp"
        except Exception:
            ts_type = "timestamp"  # let the stream surface Spark's read error
    if ts_type == "long" and spark.conf.get(
        "spark.sql.legacy.parquet.nanosAsLong", "false"
    ) != "true":
        # Mirror read_testdata (sources/readers.py): the conf must be live
        # before the scan or a plain caller session fails with
        # "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))".
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA.format(ts_type=ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type == "long":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window rollup with a 1-hour watermark — the
    streaming twin of analytics.events_hourly."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("_sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            F.col("_sum_value").cast("double").alias("sum_value"),
        )
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", SESSION_GAP).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Exactly-once event stream by event_id within the watermark — the
    streaming form of the keep-latest/idempotent-ingest contract."""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(sdf: DataFrame, name: str, output_mode: str = "append"):
    """Materialize a streaming DataFrame with Trigger.AvailableNow into an
    in-memory table ``name``; returns after the stream drains."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def purchases_with_recent_views_stream(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's view events from the preceding hour. Both sides carry
    watermarks, so the join state is bounded — Spark retains only one
    hour of views per user and expires the rest (the unbounded-state
    trap of naive stream joins is exactly what the interval condition
    solves). Streaming twin of the batch as-of family (operators/asof.py
    keeps the nearest-one semantics; the interval join keeps ALL
    qualifying pairs)."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    return purchases.join(
        views,
        (purchases["user_id"] == views["view_user_id"])
        & (views["view_ts"] >= purchases["purchase_ts"] - F.expr("INTERVAL 1 HOUR"))
        & (views["view_ts"] <= purchases["purchase_ts"]),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "purchase_value", "view_id", "view_ts")


def events_hourly_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable streaming query: the tumbling-hour rollup run as
    a REAL watermarked stream, with exact batch parity.

    The events table is replayed as an AvailableNow file stream in two
    time-split micro-batches (cut at the median event time). The rollup
    runs in UPDATE mode — each trigger emits the refreshed row for every
    window a new event touched — and the memory-sink change stream is
    compacted to final values by taking, per (hour, event_type), the
    emission with the highest n_events (within one key the event count
    strictly increases across emissions, so that is the latest row; no
    ordering metadata is needed). The 1-hour watermark drops nothing:
    batch 2 holds only events strictly after batch 1's maximum, so no
    row ever arrives behind the watermark — the streamed aggregate must
    equal the batch groupBy exactly, and the oracle restates that batch
    form. Reference analog: the 20-minute scheduled re-aggregate
    (SURVEY.md §2.10), expressed as bounded keyed state instead of a
    full recompute."""
    from de_final_project_spark.session import scratch_dir
    from de_final_project_spark.sources.readers import read_testdata

    from de_final_project_spark.session import stream_state_partitions

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        # Watermarks require TIMESTAMP (with local zone); a plain session
        # may surface the parquet column as TIMESTAMP_NTZ.
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    # one action: the replay cut AND the row count that sizes the
    # stream's state partitions (session.stream_state_partitions)
    _agg = ev.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("cut"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    cut, n_rows = _agg["cut"], _agg["n"]
    # Fixed scratch path + fixed sink name: repeated invocations reuse
    # (and first wipe) one replay dir and replace one memory-sink view
    # instead of accumulating per-run orphans (ADVICE r5). Invocations
    # are sequential per session; the previous run's sink is consumed
    # before the next run starts.
    src = scratch_dir("hourly_replay")
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
    sink = "hourly_streamed_sink"
    spark.catalog.dropTempView(sink)
    with stream_state_partitions(spark, n_rows):
        q = (
            hourly_rollup_stream(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("hour", "event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
    )


EVENTS_HOURLY_STREAMED_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def purchase_view_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable streaming query: the stream-stream interval join
    run as a REAL two-batch AvailableNow replay, with exact batch parity.

    Inner stream-stream joins emit a pair the moment both sides have
    arrived — no watermark wait — so an append-mode memory sink holds
    exactly the join result when the replay drains. The watermarks only
    bound state, and the time-split replay cannot lose a cross-batch
    match: batch 2 purchases all sit after batch 1's max event time, so
    every view still inside the 1-hour interval of any future purchase
    is within the retention horizon when batch 1 closes. The oracle is
    the batch interval join, restated flat. Reference analog: the
    S3-event-notification chaining between stages (SURVEY.md §2.10),
    here as a first-class streaming join instead of a side-channel.
    """
    from de_final_project_spark.session import scratch_dir
    from de_final_project_spark.sources.readers import read_testdata

    from de_final_project_spark.session import stream_state_partitions

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    _agg = ev.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("cut"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    cut, n_rows = _agg["cut"], _agg["n"]
    src = scratch_dir("ssjoin_replay")
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
    sink = "ssjoin_streamed_sink"
    spark.catalog.dropTempView(sink)
    # The stream-stream interval join keeps FOUR state stores per
    # partition; volume-sized partitions cut its per-batch store-commit
    # tax (measured 13.4 -> 7.5 s at sf0.1, identical results).
    with stream_state_partitions(spark, n_rows):
        q = (
            purchases_with_recent_views_stream(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.round("purchase_value", 6).alias("purchase_value"),
        "view_id",
        "view_ts",
    )


PURCHASE_VIEW_JOIN_STREAMED_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       round(p.value, 6) AS purchase_value,
       v.event_id AS view_id,
       v.ts AS view_ts
FROM events p
JOIN events v
  ON p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 1 HOUR
 AND v.ts <= p.ts
"""
