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
