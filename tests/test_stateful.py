"""applyInPandasWithState: state must carry across micro-batches, and the
final per-user profile must match the batch groupBy on the same rows."""

import os

import pyspark.sql.functions as F
from pyspark.sql import Window

from de_final_project_spark.sources.readers import read_testdata
from de_final_project_spark.streaming.stateful import user_profile_stateful

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_profile_matches_batch(spark, tmp_path):
    # Split the events into two parquet files so AvailableNow +
    # maxFilesPerTrigger=1 runs two micro-batches -> state must merge.
    ev = read_testdata(spark, SF_DIR, "events").where(F.col("user_id") < 40)
    src = str(tmp_path / "stream_src")
    half = ev.count() // 2
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        user_profile_stateful(stream)
        .writeStream.format("memory")
        .queryName("profiles_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert half > 0

    # Update mode emits one row per touched user per batch; the row with
    # the highest n_events per user is the final state.
    out = spark.table("profiles_out")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = out.withColumn("_r", F.row_number().over(w)).where(F.col("_r") == 1)

    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .collect()
    }
    got = {r["user_id"]: r for r in final.collect()}
    assert set(got) == set(want)
    for uid, g in got.items():
        wrow = want[uid]
        assert g["n_events"] == wrow["n_events"]
        assert abs(g["total_value"] - wrow["total_value"]) < 1e-6
        assert g["first_seen"] == wrow["first_seen"]
        assert g["last_seen"] == wrow["last_seen"]


def test_inactivity_detector_fires_on_silence(spark, tmp_path):
    """Users present only in batch 1 must get a went_inactive row once
    batch 2 advances the watermark past their last event + gap; users
    active near the end must not."""
    import pandas as pd

    from de_final_project_spark.streaming.stateful import (
        INACTIVITY_GAP_MIN,
        user_inactivity_stateful,
    )

    src = str(tmp_path / "gap_src")
    base = pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # batch 1: users 1 and 2 at t0; batch 2: user 2 again 3 hours later
    # (watermark advances to ~t0+3h-10m, far past user 1's deadline).
    b1 = [(1, base, 1, "view", 1.0, "{}"), (2, base, 2, "view", 1.0, "{}")]
    b2 = [(3, base + pd.Timedelta(hours=3), 2, "view", 1.0, "{}")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/a")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src + "/b")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        user_inactivity_stateful(stream)
        .writeStream.format("memory")
        .queryName("gap_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from gap_out").collect()
    inactive = {r["user_id"] for r in rows if r["went_inactive"]}
    assert 1 in inactive       # silent past the gap -> flagged
    assert 2 not in inactive   # active at the end -> still live state
    # the terminal row preserves the user's profile
    term = [r for r in rows if r["went_inactive"] and r["user_id"] == 1][0]
    assert term["n_events"] == 1 and term["last_seen"] == base


def test_streaming_transitions_match_batch(spark, tmp_path):
    """Two time-split micro-batches of real events must reproduce the
    batch lag() transition counts exactly (state carries the last event
    across the batch boundary)."""
    from de_final_project_spark.plans.temporal import event_transition_matrix
    from de_final_project_spark.streaming.stateful import user_transitions_stateful

    ev = read_testdata(spark, SF_DIR, "events").where(F.col("user_id") < 30)
    src = str(tmp_path / "tr_src")
    cut = "2024-01-15"
    # time-split (not hash-split): within-key arrival stays time-ordered
    ev.where(F.col("ts") < cut).coalesce(1).write.parquet(os.path.join(src, "a"))
    ev.where(F.col("ts") >= cut).coalesce(1).write.parquet(os.path.join(src, "b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        user_transitions_stateful(stream)
        .writeStream.format("memory")
        .queryName("transitions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.sql(
            "select from_type, to_type, count(*) n from transitions_out group by 1,2"
        ).collect()
    }
    # batch twin restricted to the same users
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type")
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").asc(), F.col("event_id").asc()
                )
            )
            .alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .count()
    )
    want = {(r["from_type"], r["to_type"]): r["count"] for r in pairs.collect()}
    assert got == want
