"""Prove the sort-clustered layout claim from parquet footers: row-group
ts ranges are near-disjoint after the clustered write, and a time-slice
read returns exactly the rows the raw table holds for that slice."""

from __future__ import annotations

import pyspark.sql.functions as F

from de_final_project_spark.plans import clustering
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"


def test_row_groups_disjoint_and_slice_correct(spark, tmp_path):
    out_dir = clustering.write_time_clustered(spark, SF_DIR, str(tmp_path / "ev"))
    ranges = clustering.row_group_ts_ranges(out_dir)
    assert len(ranges) >= 4  # enough groups for pruning to mean anything
    # within each file, consecutive groups must not interleave: group i's
    # max <= group i+1's min (sorted within partition)
    by_file: dict = {}
    for name, n, lo, hi in ranges:
        assert lo <= hi
        by_file.setdefault(name, []).append((lo, hi))
    for spans in by_file.values():
        for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
            assert hi_a <= lo_b
    # across files, ranges are disjoint too (repartitionByRange)
    file_spans = sorted(
        (min(lo for lo, _ in s), max(hi for _, hi in s)) for s in by_file.values()
    )
    for (_, hi_a), (lo_b, _) in zip(file_spans, file_spans[1:]):
        assert hi_a <= lo_b

    # slice correctness vs the raw table
    lo, hi = "2024-01-10", "2024-01-12"
    got = clustering.read_time_slice(spark, out_dir, lo, hi).count()
    want = (
        read_testdata(spark, SF_DIR, "events")
        .where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .count()
    )
    assert got == want > 0


def test_zorder_buckets_bound_both_dimensions(spark):
    """Each z bucket pins the top 4 grid bits of BOTH keys, so per-
    bucket spans must be a small fraction of the global spans — the
    property a single-key sort cannot give the second key."""
    from pyspark.sql import functions as F

    from de_final_project_spark.plans.clustering import zorder_locality_stats
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    rep = zorder_locality_stats(spark, sf).cache()
    orders = read_testdata(spark, sf, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    g = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max(day) - F.min(day)).alias("dy"),
    ).first()
    # rows conserved
    assert rep.agg(F.sum("n_rows")).first()[0] == orders.count()
    # every bucket bounds both dimensions to ~1/16 of the global span
    # (4 fixed grid bits per dim; allow 2x slack for grid-cell rounding)
    bad = rep.where(
        (F.col("custkey_span") > g.ck / 8) | (F.col("day_span") > g.dy / 8)
    )
    assert bad.count() == 0
    assert rep.count() > 100  # the curve actually spreads buckets
    rep.unpersist()
