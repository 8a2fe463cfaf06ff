"""Deterministic surrogate / sequence keys.

The reference assigns 1-based dense sequence keys with
``df.insert(0, key, range(1, len(df)+1))`` (reference
src/process_lambda.py:240,298,365,433; SURVEY.md §2.7 W2). The Spark
equivalent is ``row_number`` over an explicit ordering.

Scale note: a global row_number needs a single ordered partition at the
window stage. For dimension-sized outputs (dim_date: thousands of rows)
that is fine. For fact tables the reference's record ids are per-run
sequence numbers with no semantic content beyond uniqueness+density, so
callers that don't need global density at 100 TB should prefer
``zip_with_index_key`` (two narrow passes, no single-partition funnel).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_sequence_key(
    df: DataFrame, key_name: str, order_cols: Sequence[str] | str
) -> DataFrame:
    """1-based dense sequence key ordered by ``order_cols``, as first column.

    The ordering must be a total order over the rows for the key to be
    deterministic; callers pass the business columns that define it
    (dates ascending for date_id, the business key for fact record ids).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
    return df.select(
        F.row_number().over(w).cast("long").alias(key_name), "*"
    )


def add_sequence_key_distributed(
    df: DataFrame,
    key_name: str,
    order_cols: Sequence[str] | str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based sequence key over a business ordering WITHOUT the
    single-partition sort of ``add_sequence_key``.

    Shape: range-partition by the ordering (so partition p holds a
    contiguous key range), rank locally per partition, then add each
    partition's cumulative row-count offset (a tiny broadcast join).
    Equal tuples land in one range partition, so ranks are a valid total
    ranking; among fully-duplicate rows assignment is interchangeable —
    the result multiset is deterministic.

    This is the fact-scale path: every stage is distributed; the only
    global structure is the O(partitions) offset table on the driver.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    order_exprs = [F.col(c).asc_nulls_last() for c in order_cols]
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_exprs)
    # Persist: the offset branch below re-reads this relation, and range
    # boundaries come from sampling — a recompute could repartition
    # differently and corrupt the offsets. One materialization pins them.
    local = ranged.withColumn("_lrank", F.row_number().over(w_local)).persist()
    w_cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(key_name, (F.col("_off") + F.col("_lrank")).cast("long"))
        .select(key_name, *df.columns)
    )


def zip_with_index_key(df: DataFrame, key_name: str, start: int = 1) -> DataFrame:
    """Dense sequence key without a single-partition window.

    Two-pass scheme: count rows per partition (cheap scan), then offset
    each partition's local index by the cumulative count — the classic
    distributed zipWithIndex. Row order follows the current partitioning,
    so use only where the caller doesn't require a business ordering.
    """
    spark = df.sparkSession
    schema = df.schema

    def attach(partition_index: int, rows):
        # local import keeps the closure picklable and worker-cheap
        for i, row in enumerate(rows):
            yield (partition_index, i, row)

    counts = df.rdd.mapPartitionsWithIndex(
        lambda idx, it: [(idx, sum(1 for _ in it))]
    ).collectAsMap()
    offsets = {}
    running = start
    for idx in sorted(counts):
        offsets[idx] = running
        running += counts[idx]
    b_offsets = spark.sparkContext.broadcast(offsets)

    def assign(idx, it):
        base = b_offsets.value.get(idx, 0)
        for i, row in enumerate(it):
            yield (base + i, *row)

    out_schema = (
        f"{key_name} long, " + ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    )
    rdd = df.rdd.mapPartitionsWithIndex(assign)
    return spark.createDataFrame(rdd, schema=out_schema)
