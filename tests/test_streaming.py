"""Structured Streaming parity tests: each streaming operator's
AvailableNow output must equal its batch twin on the same data."""

import os

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


def test_stream_lake_to_gold_is_incremental(spark, sales_order_df, tmp_path):
    """foreachBatch bronze→gold: a second run with the same checkpoint
    processes only new batches; record ids continue densely."""
    from de_final_project_spark.plans.rebuild import INCREMENTAL_SALES_FACT
    from de_final_project_spark.sources.sinks import write_csv_batch
    from de_final_project_spark.streaming.pipeline import stream_sales_to_gold

    lake = str(tmp_path / "lake")
    gold = str(tmp_path / "gold")
    cp = str(tmp_path / "cp")
    gold_path = tmp_path / "gold" / INCREMENTAL_SALES_FACT

    b1 = sales_order_df.where(F.col("sales_order_id") == 1)
    write_csv_batch(b1, lake, "sales_order", "2024-01-05T0000")
    stream_sales_to_gold(spark, lake, gold, cp)
    assert spark.read.parquet(str(gold_path)).count() == 1

    b2 = sales_order_df.where(F.col("sales_order_id") == 2)
    write_csv_batch(b2, lake, "sales_order", "2024-08-02T0000")
    stream_sales_to_gold(spark, lake, gold, cp)

    out = spark.read.parquet(str(gold_path))
    ids = sorted(r["sales_record_id"] for r in out.collect())
    assert ids == [1, 2]  # batch 1 NOT reprocessed; ids continue
    assert out.where(F.col("sales_order_id") == 2).count() == 1  # keep-latest in batch


def test_stream_stream_interval_join_matches_batch(spark, events_stream):
    from de_final_project_spark.streaming.events import (
        purchases_with_recent_views_stream,
    )

    run_available_now(
        purchases_with_recent_views_stream(events_stream), "ss_join_out"
    )
    got = spark.table("ss_join_out")

    ev = read_testdata(spark, SF_DIR, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("view_ts"),
    )
    want = p.join(
        v,
        (p["user_id"] == v["vu"])
        & (v["view_ts"] >= p["purchase_ts"] - F.expr("INTERVAL 1 HOUR"))
        & (v["view_ts"] <= p["purchase_ts"]),
    ).select("purchase_id", "view_id")
    cols = ["purchase_id", "view_id"]
    assert _rows(got.select(*cols), cols) == _rows(want, cols)
    assert got.count() > 0


def test_events_hourly_streamed_exact_batch_parity(spark):
    """The two-batch update-mode replay, after latest-row compaction,
    equals the batch hour x type rollup exactly (no late drops: batch 2
    starts strictly after batch 1's max event time)."""
    from de_final_project_spark.streaming.events import events_hourly_streamed

    got = events_hourly_streamed(spark, SF_DIR)
    want = events_hourly(spark, SF_DIR).drop("n_users")
    cols = ["hour", "event_type", "n_events", "sum_value"]
    assert _rows(got.select(*cols), cols) == _rows(want.select(*cols), cols)
    assert got.count() > 0


def test_purchase_view_join_streamed_exact_batch_parity(spark):
    """The two-batch replay of the stream-stream interval join equals
    the flat batch interval join (inner joins emit eagerly; the replay
    cannot evict a view still joinable to a future purchase)."""
    from de_final_project_spark.streaming.events import (
        purchase_view_join_streamed,
    )

    got = purchase_view_join_streamed(spark, SF_DIR)
    ev = read_testdata(spark, SF_DIR, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("view_ts"),
    )
    want = p.join(
        v,
        (p["user_id"] == v["vu"])
        & (v["view_ts"] >= p["purchase_ts"] - F.expr("INTERVAL 1 HOUR"))
        & (v["view_ts"] <= p["purchase_ts"]),
    ).select("purchase_id", "view_id")
    cols = ["purchase_id", "view_id"]
    assert _rows(got.select(*cols), cols) == _rows(want, cols)
    assert got.count() > 0


def test_stream_lake_to_gold_offset_is_O1(spark, sales_order_df, tmp_path):
    """The per-batch offset comes from the checkpoint sidecar, not a
    gold re-scan: three incremental drains scan gold ZERO times; wiping
    only the sidecar (legacy gold, no state) costs exactly ONE bootstrap
    scan; ids stay dense throughout (VERDICT r6 item 3)."""
    from de_final_project_spark.plans.rebuild import INCREMENTAL_SALES_FACT
    from de_final_project_spark.sources.sinks import write_csv_batch
    from de_final_project_spark.streaming import pipeline

    lake, gold, cp = (str(tmp_path / d) for d in ("lake", "gold", "cp"))
    gold_path = tmp_path / "gold" / INCREMENTAL_SALES_FACT

    pipeline._bootstrap_scans = 0
    # each batch carries one surviving order row (keep-latest in batch)
    for oid, ts in [
        (1, "2024-01-05T0000"),
        (2, "2024-03-01T0000"),
        (1, "2024-08-02T0000"),
    ]:
        b = sales_order_df.where(F.col("sales_order_id") == oid)
        write_csv_batch(b, lake, "sales_order", ts)
        pipeline.stream_sales_to_gold(spark, lake, gold, cp)
    assert pipeline._bootstrap_scans == 0  # steady state never re-scans
    ids = sorted(
        r["sales_record_id"] for r in spark.read.parquet(str(gold_path)).collect()
    )
    assert ids == [1, 2, 3]

    # Legacy-gold bootstrap: sidecar gone, gold present -> one scan.
    os.remove(os.path.join(cp, "_gold_offset.json"))
    write_csv_batch(
        sales_order_df.where(F.col("sales_order_id") == 2),
        lake,
        "sales_order",
        "2024-09-01T0000",
    )
    pipeline.stream_sales_to_gold(spark, lake, gold, cp)
    assert pipeline._bootstrap_scans == 1
    ids = sorted(
        r["sales_record_id"] for r in spark.read.parquet(str(gold_path)).collect()
    )
    assert ids == [1, 2, 3, 4]


def test_streamed_ivf_index_matches_frozen_assignment(spark):
    """The streamed, MERGE-committed index must equal the direct batch
    assignment of the FULL corpus under centroids trained on the BASE
    half only (frozen-quantizer contract) — proving the training subset
    semantics, the per-batch assignment, and the partition-restoring
    txlog read all compose losslessly."""
    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.streaming.pipeline import streamed_ivf_index

    sf = "/root/testdata/sf0.001"
    got = {
        (r["vec_id"], r["cell"])
        for r in streamed_ivf_index(spark, sf).collect()
    }

    qdf = km._quantized(spark, sf).persist()
    lo, hi = qdf.agg(F.min("vec_id"), F.max("vec_id")).first()
    centroids = km.train_kmeans_frame(
        qdf.where(F.col("vec_id") <= (lo + hi) // 2)
    )
    want = {
        (r["vec_id"], int(r["cell"]))
        for r in km.assign_cells(qdf, centroids).collect()
    }
    assert got == want and len(got) == qdf.count()


def test_streamed_ivfpq_index_matches_frozen_batch_encoding(spark):
    """The streamed, MERGE-committed PQ index must equal the direct
    batch encoding of the FULL corpus under the quantizer AND residual
    codebooks trained on the BASE half only — the frozen-codebook
    contract one level below the frozen-cell one."""
    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.operators.similarity import (
        _pq_encode_residuals,
        _pq_residual_codebook,
        _residual_frame,
    )
    from de_final_project_spark.streaming.pipeline import streamed_ivfpq_index

    sf = "/root/testdata/sf0.001"
    got = {
        (r["vec_id"], r["cell"], r["sub_id"], r["code"])
        for r in streamed_ivfpq_index(spark, sf).collect()
    }

    qdf = km._quantized(spark, sf).persist()
    lo, hi = qdf.agg(F.min("vec_id"), F.max("vec_id")).first()
    base_q = qdf.where(F.col("vec_id") <= (lo + hi) // 2)
    centroids = km.train_kmeans_frame(base_q)
    cb = _pq_residual_codebook(base_q, centroids)
    want = {
        (r["vec_id"], int(r["cell"]), s, int(c))
        for r in _pq_encode_residuals(
            _residual_frame(qdf, centroids), cb
        ).collect()
        for s, c in enumerate(r["codes"])
    }
    assert got == want and len(got) == 4 * qdf.count()
    qdf.unpersist()


def test_streamed_ivfpq_index_serves_query_path_with_recall_parity(spark):
    """The brief's done-criterion: the IVFADC query path served FROM
    the streamed index's stored codes must match the batch-built
    IVF-PQ index on the clustered corpus — (a) exact result equality
    against the batch rerank under the same frozen state (the integer
    pipeline is deterministic, so served-from-store vs encoded-on-the-
    fly must be bit-identical), and (b) recall@k parity with the
    batch-built index of ann_recall_ivfpq (trained on the full corpus;
    both arms reach recall 1.0 here, so training on the base half
    costs nothing once the exact re-rank runs)."""
    from de_final_project_spark.operators.similarity import (
        _bruteforce_topk,
        _ivfpq_rerank_topk,
        _pq_residual_codebook,
        _recall_rows,
        clustered_corpus,
    )
    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.session import scratch_dir
    from de_final_project_spark.streaming.pipeline import _stream_pq_index

    sf = "/root/testdata/sf0.001"
    emb = clustered_corpus(spark, sf).persist()
    table, centroids, cb, _cut = _stream_pq_index(
        spark, emb, scratch_dir("stream_ivfpq_test")
    )
    stored = table.read(spark).select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "codes"
    )
    qdf = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * km.SCALE).cast("long"),
        ).alias("q"),
    ).persist()

    cols = ["query_id", "rank", "neighbor_id", "cosine_sim"]
    served = _ivfpq_rerank_topk(
        emb, qdf, centroids, cb, codes=stored
    )
    batch_same_state = _ivfpq_rerank_topk(emb, qdf, centroids, cb)
    assert _rows(served, cols) == _rows(batch_same_state, cols)

    # (b) recall parity vs the batch-BUILT index (full-corpus training,
    # the ann_recall_ivfpq arm).
    full_centroids = km.train_kmeans_frame(qdf)
    full_cb = _pq_residual_codebook(qdf, full_centroids)
    truth = (
        _bruteforce_topk(emb).select("query_id", "neighbor_id").persist()
    )
    recalls = {
        r["method"]: r["mean_recall"]
        for r in _recall_rows(
            truth,
            [
                ("streamed_served", served),
                ("batch_built", _ivfpq_rerank_topk(emb, qdf, full_centroids, full_cb)),
            ],
        )
        .groupBy("method")
        .agg(F.avg("recall_at_k").alias("mean_recall"))
        .collect()
    }
    assert recalls["streamed_served"] == recalls["batch_built"] == 1.0
    truth.unpersist()
    qdf.unpersist()
    emb.unpersist()


def test_streamed_neardup_index_equals_batch_recompute(spark):
    """Dedup-on-ingest: the verdicts accumulated across the streamed
    three-batch replay must equal the full-corpus batch MinHash-LSH
    recompute EXACTLY (insert-only feeds; each pair emitted once, when
    its later doc arrives) — streaming maintenance changes cost, not
    answers."""
    from de_final_project_spark.operators.neardup import (
        neardup_pairs_minhash,
    )
    from de_final_project_spark.streaming.pipeline import (
        streamed_neardup_index,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in streamed_neardup_index(spark, sf).collect()
    }
    want = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in neardup_pairs_minhash(spark, sf).collect()
    }
    assert got == want and len(got) > 0
