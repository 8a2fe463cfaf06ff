"""End-to-end incremental pipeline test: two ingest cycles through the
bronze CSV lake, watermark gating, change-driven rebuild, keep-latest
across batches — the reference's full three-stage semantics in one job."""

import datetime as dt
import os

import pytest

from de_final_project_spark.plans.rebuild import run_pipeline
from de_final_project_spark.sources.watermark import WatermarkStore


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake"), str(tmp_path / "gold"), str(tmp_path / "wm.json")


def _currency(spark, rows):
    return spark.createDataFrame(
        rows, "currency_id long, currency_code string, last_updated timestamp"
    )


def test_incremental_pipeline(spark, lake, department_df):
    lake_dir, gold_dir, wm_path = lake
    t1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    t2 = dt.datetime(2024, 2, 1, 10, 0, 0)

    # Cycle 1: initial load.
    store = WatermarkStore(wm_path)
    src = {"currency": _currency(spark, [(1, "GBP", t1), (2, "USD", t1)]),
           "department": department_df}
    written = run_pipeline(spark, src, lake_dir, gold_dir, store, "b1")
    assert "dim_currency" in written
    out = spark.read.parquet(os.path.join(gold_dir, "dim_currency"))
    assert {(r.currency_id, r.currency_code) for r in out.collect()} == {
        (1, "GBP"), (2, "USD")
    }

    # Cycle 2: currency 1 renamed + new currency 3; department unchanged.
    store2 = WatermarkStore(wm_path)  # reload from disk: state persisted
    src2 = {
        "currency": _currency(
            spark, [(1, "GBP", t1), (1, "GBX", t2), (2, "USD", t1), (3, "EUR", t2)]
        ),
        "department": department_df,
    }
    written2 = run_pipeline(spark, src2, lake_dir, gold_dir, store2, "b2")
    # department had no rows past the watermark -> not re-ingested
    assert written2 == ["dim_currency"]
    out2 = spark.read.parquet(os.path.join(gold_dir, "dim_currency"))
    assert {(r.currency_id, r.currency_code) for r in out2.collect()} == {
        (1, "GBX"), (2, "USD"), (3, "EUR")
    }
    # bronze lake retains both batches (immutable, append-only)
    batches = os.listdir(os.path.join(lake_dir, "currency"))
    assert sorted(b for b in batches if b.startswith("batch_ts=")) == [
        "batch_ts=b1", "batch_ts=b2"
    ]


def test_no_change_cycle_is_noop(spark, lake):
    lake_dir, gold_dir, wm_path = lake
    t1 = dt.datetime(2024, 1, 1)
    store = WatermarkStore(wm_path)
    src = {"currency": _currency(spark, [(1, "GBP", t1)])}
    assert run_pipeline(spark, src, lake_dir, gold_dir, store, "b1") == ["dim_currency"]
    # identical second cycle: watermark gates everything out
    store2 = WatermarkStore(wm_path)
    assert run_pipeline(spark, src, lake_dir, gold_dir, store2, "b2") == []


def test_fact_sources_trigger_all_facts(
    spark, lake, payment_df, purchase_order_df, sales_order_df
):
    lake_dir, gold_dir, wm_path = lake
    store = WatermarkStore(wm_path)
    src = {
        "payment": payment_df,
        "purchase_order": purchase_order_df,
        "sales_order": sales_order_df,
    }
    written = run_pipeline(spark, src, lake_dir, gold_dir, store, "b1")
    assert set(written) == {
        "dim_date", "fact_payment", "fact_purchase_order", "fact_sales_order"
    }
    fp = spark.read.parquet(os.path.join(gold_dir, "fact_payment"))
    assert fp.count() == 3  # keep-latest applied through the CSV round-trip


def test_incremental_fact_append_matches_full_history(spark, sales_order_df, tmp_path):
    """Two ingest cycles appended incrementally == one stable-key build
    over the whole lake (business columns), with dense continuing ids."""
    import pyspark.sql.functions as F

    from de_final_project_spark.plans.facts import make_fact_sales_order_stable
    from de_final_project_spark.plans.rebuild import (
        INCREMENTAL_SALES_FACT,
        append_sales_fact_increment,
    )
    from de_final_project_spark.sources.readers import read_ingest_table
    from de_final_project_spark.sources.sinks import write_csv_batch

    lake = str(tmp_path / "lake")
    gold = str(tmp_path / "gold")

    batch1 = sales_order_df.where(F.col("sales_order_id") == 1)
    batch2 = sales_order_df.where(F.col("sales_order_id") == 2)
    write_csv_batch(batch1, lake, "sales_order", "2024-01-05 00:00")
    n1 = append_sales_fact_increment(spark, lake, gold, "2024-01-05 00:00")
    write_csv_batch(batch2, lake, "sales_order", "2024-08-02 00:00")
    n2 = append_sales_fact_increment(spark, lake, gold, "2024-08-02 00:00")
    assert (n1, n2) == (1, 1)  # keep-latest collapses the order-2 versions

    got = spark.read.parquet(str(tmp_path / "gold" / INCREMENTAL_SALES_FACT))
    ids = sorted(r["sales_record_id"] for r in got.collect())
    assert ids == [1, 2]  # dense, continuing across appends

    full = make_fact_sales_order_stable(read_ingest_table(spark, lake, "sales_order"))
    biz = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.drop("sales_record_id").collect()
    )
    assert biz(got) == biz(full)
    # stable functional date keys: yyyymmdd ints
    row = {r["sales_order_id"]: r for r in got.collect()}
    assert row[1]["created_date"] == 20240103
    assert row[2]["agreed_payment_date"] == 20240730


def test_incremental_rollup_merges_partials_losslessly(spark):
    """The partial-merge result equals a flat one-shot aggregate."""
    from pyspark.sql import functions as F

    from de_final_project_spark.plans.rebuild import incremental_hourly_rollup
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    got = incremental_hourly_rollup(spark, sf)
    ev = read_testdata(spark, sf, "events")
    want = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
            F.min(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("min_value"),
            F.max(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("max_value"),
        )
    )
    cols = ["hour", "event_type", "n_events", "sum_value", "min_value", "max_value"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_read_testdata_schema_memo(spark):
    """r12 optimization pin: read_testdata's schema memo returns the
    same frame on a memo hit as on first inference — including the
    events NANOS->timestamp conversion, which depends on a session conf
    that is part of the memo key."""
    from de_final_project_spark.sources import readers

    sf = "/root/testdata/sf0.001"
    readers._TESTDATA_SCHEMAS.clear()
    a = readers.read_testdata(spark, sf, "events")
    n0 = len(readers._TESTDATA_SCHEMAS)
    assert n0 >= 1
    b = readers.read_testdata(spark, sf, "events")  # memo hit
    assert len(readers._TESTDATA_SCHEMAS) == n0
    assert a.schema == b.schema
    assert dict(b.dtypes)["ts"].startswith("timestamp")
    assert a.count() == b.count() > 0
