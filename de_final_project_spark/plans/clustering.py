"""Sort-clustered parquet layout for scan pruning (the sibling of
plans/bucketing.py: bucketing pre-pays the JOIN shuffle, clustering
pre-pays the FILTER scan).

Parquet row-group statistics (min/max per column chunk) are what the
reader's predicate pushdown prunes against. Over an unsorted write,
every row group's ts range spans the whole table and a time-range filter
prunes NOTHING; after `sortWithinPartitions` on a range-partitioned
layout, row-group ranges are narrow and disjoint, so the same filter
skips most of the file without reading data pages. At 100 TB this is the
difference between scanning 100 TB and scanning the one-day slice a
dashboard query wants — paid once at write time, amortized over every
later scan (the Z-order/liquid-clustering idea, 1-D form).

tests/test_clustering.py proves the claim from the parquet FOOTERS:
after the clustered write the per-row-group [min(ts), max(ts)] intervals
are pairwise non-overlapping (modulo boundary rows), so any ts predicate
touches a bounded number of groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

ROWS_PER_GROUP = 4096


def write_time_clustered(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Rewrite the events table range-partitioned + sorted on ts with
    small row groups, so parquet statistics become an effective coarse
    index on time.

    ``repartitionByRange`` gives globally disjoint per-file ranges (one
    exchange with range sampling); ``sortWithinPartitions`` orders inside
    each file so consecutive row groups cover consecutive ts slices. The
    row-group size is forced small here so the sf0.01 fixture has enough
    groups to demonstrate pruning; at scale the default 128 MB groups
    play the same role.
    """
    ev = read_testdata(spark, sf_dir, "events")
    (
        ev.repartitionByRange(n_files, F.col("ts"))
        .sortWithinPartitions("ts")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def read_time_slice(spark: SparkSession, clustered_dir: str, lo: str, hi: str) -> DataFrame:
    """Time-slice scan over the clustered layout; the range predicate is
    expressed directly on ts so it reaches the parquet reader as a
    row-group min/max filter."""
    return (
        spark.read.parquet(clustered_dir)
        .where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    )


def row_group_ts_ranges(clustered_dir: str) -> list[tuple]:
    """(path, n_rows, ts_min, ts_max) per row group, straight from the
    parquet footers — metadata only, no data pages read. This is exactly
    the information the reader's predicate pushdown consults."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(clustered_dir)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(clustered_dir, name))
        idx = md.schema.names.index("ts")
        for g in range(md.num_row_groups):
            col = md.row_group(g).column(idx)
            st = col.statistics
            out.append((name, md.row_group(g).num_rows, st.min, st.max))
    return out
