"""Catalog/preview/export tests (S8/K4/K5 parity)."""

import os

from de_final_project_spark.sources.catalog import (
    export_csv,
    list_tables,
    preview_all,
    register_gold,
)
from de_final_project_spark.sources.sinks import write_parquet_overwrite


def test_register_list_preview_export(spark, currency_df, tmp_path):
    gold = str(tmp_path / "gold")
    write_parquet_overwrite(currency_df.select("currency_id", "currency_code"),
                            gold, "dim_currency_cat")
    names = register_gold(spark, gold)
    assert names == ["dim_currency_cat"]
    assert "dim_currency_cat" in list_tables(spark)
    previews = preview_all(spark, n=2)
    assert len(previews["dim_currency_cat"]) == 2
    out = str(tmp_path / "extracts")
    export_csv(spark.table("dim_currency_cat"), out, "dim_currency_cat")
    files = os.listdir(os.path.join(out, "dim_currency_cat"))
    assert any(f.endswith(".csv") for f in files)
    spark.catalog.dropTempView("dim_currency_cat")


def test_compact_parquet_reduces_files(spark, tmp_path):
    from de_final_project_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "many")
    spark.range(20000).repartition(40).write.parquet(src)
    import os as _os

    n_src = len([f for f in _os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 40
    dst = str(tmp_path / "compacted")
    n_dst = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert n_dst == 1
    assert spark.read.parquet(dst).count() == 20000


def test_partitioned_write_prunes(spark, tmp_path):
    import contextlib
    import io

    import pyspark.sql.functions as F

    from de_final_project_spark.sources.sinks import write_parquet_partitioned

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    gold = str(tmp_path / "gold")
    write_parquet_partitioned(df, gold, "t", ["bucket"])
    import os as _os

    parts = sorted(
        d for d in _os.listdir(_os.path.join(gold, "t")) if d.startswith("bucket=")
    )
    assert parts == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    back = spark.read.parquet(_os.path.join(gold, "t")).where(F.col("bucket") == 2)
    assert back.count() == 250
    # partition filter must appear as PartitionFilters, not a data filter
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    pf_lines = [
        line for line in buf.getvalue().splitlines() if "PartitionFilters" in line
    ]
    assert pf_lines and any("bucket" in line for line in pf_lines)


def test_jdbc_pushdown_query_construction():
    from de_final_project_spark.sources.readers import jdbc_pushdown_query

    assert jdbc_pushdown_query("staff") == "SELECT * FROM staff"
    assert (
        jdbc_pushdown_query("staff", ["staff_id", "first_name"])
        == "SELECT staff_id, first_name FROM staff"
    )
    assert (
        jdbc_pushdown_query(
            "staff", ["staff_id"], "last_updated > '2024-01-01'"
        )
        == "SELECT staff_id FROM staff WHERE last_updated > '2024-01-01'"
    )


def test_read_jsonl_robust_roundtrip_and_quarantine(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructType

    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        "this is not json\n"
        '{"id": "not a number", "name": "type error"}\n'
    )
    schema = (
        StructType()
        .add("id", LongType(), True)
        .add("name", StringType(), True)
    )
    from de_final_project_spark.sources.readers import read_jsonl_robust

    clean, corrupt = read_jsonl_robust(spark, str(p), schema)
    rows = {r.id: r.name for r in clean.collect()}
    assert rows == {1: "ok", 2: "also ok"}
    bad = [r[0] for r in corrupt.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from de_final_project_spark.sources.readers import read_orc_table
    from de_final_project_spark.sources.sinks import write_orc_overwrite

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, s string, v double"
    )
    write_orc_overwrite(df, str(tmp_path), "t")
    back = read_orc_table(spark, str(tmp_path / "t"))
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    # filter pushdown reaches the ORC scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.where(back.id > 1).select("id").explain("formatted")
    p = buf.getvalue()
    assert "GreaterThan(id,1)" in p and "ReadSchema: struct<id:bigint>" in p


def test_read_parquet_evolving_merges_and_renames(spark, tmp_path):
    from de_final_project_spark.sources.readers import read_parquet_evolving

    base = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, "a")], "id long, old_name string"
    ).write.parquet(base + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, old_name string, score double"
    ).write.parquet(base + "/batch=2")

    out = read_parquet_evolving(spark, base, renames={"old_name": "name"})
    assert set(out.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] is None  # old batch: evolved column nullable
    assert rows[2]["score"] == 9.5
    assert rows[1]["name"] == "a"


def test_fk_candidates_discriminates(spark):
    """All seven genuine FK edges report full containment; the negative
    control (orders.o_orderkey -> customer.c_custkey) does not."""
    from de_final_project_spark.sources.catalog import fk_candidates

    rows = {
        r.child_key: r
        for r in fk_candidates(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(rows) == 8
    control = rows["orders.o_orderkey"]
    assert not control.is_fk_shape and control.containment < 0.5
    for key, r in rows.items():
        if key != "orders.o_orderkey":
            assert r.is_fk_shape and r.containment == 1.0, key
        assert r.n_contained <= min(r.n_child_distinct, r.n_parent_distinct)


def test_props_schema_discovery_shapes(spark):
    """Coverage and type-census invariants over a synthetic JSON column
    with mixed shapes, not just the testdata's single key."""
    from pyspark.sql import functions as F

    from de_final_project_spark.plans.analytics import props_schema_discovery
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    rep = props_schema_discovery(spark, sf).collect()
    total = read_testdata(spark, sf, "events").count()
    assert len(rep) >= 1
    for r in rep:
        assert r.n_integer + r.n_numeric + r.n_other == r.n_present
        assert 0 < r.coverage <= 1
        assert r.n_present <= total
    # testdata ships {"k": <int>} on every event
    k = {r.key: r for r in rep}["k"]
    assert k.coverage == 1.0 and k.n_integer == k.n_present
