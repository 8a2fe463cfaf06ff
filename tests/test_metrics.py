"""QueryMetricsRecorder: per-query rows/wall/shuffle metrics parquet."""

from __future__ import annotations

import pyspark.sql.functions as F

from de_final_project_spark.sources.metrics import QueryMetricsRecorder


def test_metrics_rows_for_sampled_queries(spark, tmp_path):
    from de_final_project_spark.plans.star_testdata import dim_customer

    rec = QueryMetricsRecorder(spark, str(tmp_path / "metrics"))
    # a shuffling query (hash aggregate over lineitem)
    shuffling = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    m1 = rec.measure("lineitem_rollup", shuffling)
    m2 = rec.measure("dim_customer", dim_customer(spark, "/root/testdata/sf0.001"))

    assert m1["rows"] > 0 and m1["wall_ms"] >= 0
    assert m2["rows"] == 150
    # REST metrics are live in the test session (UI on): the aggregate
    # must have moved shuffle bytes and read parquet input bytes.
    assert m1["n_stages"] and m1["n_stages"] >= 2
    assert m1["shuffle_write_bytes"] > 0 and m1["shuffle_read_bytes"] > 0
    assert m1["input_bytes"] > 0

    tbl = rec.table()
    got = {r["query"]: r["rows"] for r in tbl.collect()}
    assert got == {"lineitem_rollup": m1["rows"], "dim_customer": 150}
    # schema is stable for downstream dashboards
    assert set(tbl.columns) == {
        "query", "measured_at", "rows", "wall_ms", "n_stages",
        "shuffle_read_bytes", "shuffle_write_bytes", "input_bytes",
    }


def test_observe_is_passive_zero_extra_jobs(spark, tmp_path):
    """The passive recorder (VERDICT r7 item 6): observe() attributes
    the CALLER's action and launches no Spark job of its own — an
    observation window with an empty body records ZERO new stages, and
    a window around a noop write records exactly that write's stages
    (no second execution of the query)."""
    from de_final_project_spark.sources.metrics import (
        QueryMetricsRecorder,
        _stage_snapshot,
    )

    rec = QueryMetricsRecorder(spark, str(tmp_path / "metrics"))

    # 1. empty body -> the recorder itself ran nothing
    with rec.observe("idle") as h:
        pass
    assert h["metrics"]["n_stages"] == 0
    assert h["metrics"]["rows"] is None

    # 2. a real action: the observed stage count equals the total new
    # stages the session ran during the window — nothing extra.
    shuffling = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    outer_before = _stage_snapshot(spark)
    with rec.observe("rollup_noop") as h:
        shuffling.write.format("noop").mode("overwrite").save()
    outer_after = _stage_snapshot(spark)
    session_new = len([k for k in outer_after if k not in outer_before])
    m = h["metrics"]
    assert m["n_stages"] == session_new >= 2  # the noop write's stages only
    assert m["input_bytes"] > 0 and m["shuffle_write_bytes"] > 0

    # 3. rows buffer until flush: no table yet, then one batched append
    import pytest as _pytest

    with _pytest.raises(Exception):
        rec.table().collect()  # nothing written during observation
    assert rec.flush() == 2
    got = {r["query"]: r["n_stages"] for r in rec.table().collect()}
    assert got == {"idle": 0, "rollup_noop": m["n_stages"]}
