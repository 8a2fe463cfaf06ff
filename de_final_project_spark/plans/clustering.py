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


# ----------------------------------------------------------------------
# Z-order (Morton) multi-dimensional clustering (round 5)
# ----------------------------------------------------------------------

Z_BITS = 8           # grid resolution per dimension (256 cells)
Z_BUCKETS_SHIFT = 8  # z is 2*Z_BITS wide; >> 8 leaves 256 file buckets


def _morton2(x, y):
    """Bit-interleave two Z_BITS-wide nonneg ints: x in even positions,
    y in odd — the Morton/Z-curve index, identical integer ops in any
    engine."""
    terms = None
    for k in range(Z_BITS):
        xb = F.shiftleft(F.shiftright(x, k).bitwiseAND(F.lit(1)), 2 * k)
        yb = F.shiftleft(F.shiftright(y, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        t = xb.bitwiseOR(yb)
        terms = t if terms is None else terms.bitwiseOR(t)
    return terms


def morton_n(cols):
    """N-column Morton interleave: bit ``k`` of column ``i`` lands at
    position ``k * n + i``. With n=2 this reproduces :func:`_morton2`'s
    layout up to bit order; each column contributes Z_BITS bits, so n
    must satisfy n * Z_BITS <= 63 (long). Inputs are [0, 2^Z_BITS)
    grid-scaled nonneg ints (see :func:`grid_scale`)."""
    n = len(cols)
    if n * Z_BITS > 63:
        raise ValueError(f"{n} columns x {Z_BITS} bits exceeds a long")
    terms = None
    for i, c in enumerate(cols):
        for k in range(Z_BITS):
            t = F.shiftleft(
                F.shiftright(c, k).bitwiseAND(F.lit(1)), k * n + i
            )
            terms = t if terms is None else terms.bitwiseOR(t)
    return terms


def grid_scale(col, lo: float, hi: float):
    """Scale a numeric column onto the [0, 2^Z_BITS) grid (the layout
    variant of :func:`_grid`: doubles allowed — layout placement needs
    no cross-engine exactness, unlike the oracle-paired report below)."""
    span = hi - lo if hi > lo else 1.0
    return F.least(
        F.lit((1 << Z_BITS) - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (col.cast("double") - F.lit(float(lo)))
                * F.lit(float((1 << Z_BITS) - 1))
                / F.lit(float(span))
            ).cast("long"),
        ),
    )


def _grid(col, lo: int, hi: int):
    """Scale an integer key into the [0, 2^Z_BITS) grid by exact integer
    arithmetic: (x - lo) * (2^B - 1) // max(1, hi - lo)."""
    span = max(1, hi - lo)
    # floor of the double quotient: both engines divide exactly-
    # representable integers, so floor() agrees with integer division
    # (an explicit floor because CAST truncates in Spark but ROUNDS in
    # DuckDB — the one place the two engines' casts disagree).
    return F.floor(
        (col - F.lit(lo)) * F.lit((1 << Z_BITS) - 1) / F.lit(span)
    ).cast("long")


def zorder_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering of orders on (customer, order day) with the
    locality it buys measured per file bucket: both keys scale onto a
    2^Z_BITS grid (exact integer arithmetic off min/max control-plane
    scalars, the same class as the watermark probes), the Morton index
    interleaves their bits, fixed-width z-ranges become file buckets,
    and the report shows each bucket's row count plus its customer-key
    span and day span. The point of Z-ORDER (Delta OPTIMIZE / liquid
    clustering; the multi-D form of the 1-D sort layout above): BOTH
    dimensions stay bounded per bucket, so a predicate on EITHER key
    prunes most buckets — a single-key sort bounds only its own key and
    a filter on the other key scans everything.

    Shape: pure per-row integer expressions (codegen'd) plus one hash
    aggregate on the bucket id; at scale the same z expression feeds
    ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` to lay files
    out — this report is the measurement half. Oracle restates the
    scaling and interleave bit-for-bit.
    """
    orders = read_testdata(spark, sf_dir, "orders")
    day_expr = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    b = orders.agg(
        F.min("o_custkey"),
        F.max("o_custkey"),
        F.min(day_expr),
        F.max(day_expr),
    ).first()
    lo_c, hi_c, lo_d, hi_d = b[0], b[1], b[2], b[3]
    z = _morton2(
        _grid(F.col("o_custkey"), lo_c, hi_c), _grid(day_expr, lo_d, hi_d)
    )
    return (
        orders.select(
            "o_custkey",
            day_expr.cast("long").alias("_day"),
            F.shiftright(z, Z_BUCKETS_SHIFT).cast("long").alias("z_bucket"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("o_custkey") - F.min("o_custkey")).alias("custkey_span"),
            (F.max("_day") - F.min("_day")).alias("day_span"),
        )
    )


def _zorder_sql() -> str:
    gmax = (1 << Z_BITS) - 1
    xg = f"CAST(floor((o_custkey - m.lo_c) * {gmax} / greatest(1, m.hi_c - m.lo_c)) AS BIGINT)"
    day = "datediff('day', DATE '1970-01-01', o_orderdate::DATE)"
    yg = f"CAST(floor(({day} - m.lo_d) * {gmax} / greatest(1, m.hi_d - m.lo_d)) AS BIGINT)"
    xbits = " | ".join(f"(((xg >> {k}) & 1) << {2 * k})" for k in range(Z_BITS))
    ybits = " | ".join(
        f"(((yg >> {k}) & 1) << {2 * k + 1})" for k in range(Z_BITS)
    )
    return f"""
WITH m AS (
  SELECT min(o_custkey) AS lo_c, max(o_custkey) AS hi_c,
         min({day}) AS lo_d, max({day}) AS hi_d
  FROM orders
), gridded AS (
  SELECT o_custkey, {day} AS day, {xg} AS xg, {yg} AS yg
  FROM orders, m
), keyed AS (
  SELECT o_custkey, day, (({xbits}) | ({ybits})) >> {Z_BUCKETS_SHIFT} AS z_bucket
  FROM gridded
)
SELECT z_bucket::BIGINT AS z_bucket,
       count(*)::BIGINT AS n_rows,
       (max(o_custkey) - min(o_custkey))::BIGINT AS custkey_span,
       (max(day) - min(day))::BIGINT AS day_span
FROM keyed
GROUP BY 1
"""


ZORDER_LOCALITY_STATS_SQL = _zorder_sql()
