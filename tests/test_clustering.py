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
