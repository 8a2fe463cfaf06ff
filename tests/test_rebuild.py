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
