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
    """Dense sequence key without a single-partition window OR a sort.

    Classic distributed zipWithIndex, kept entirely JVM-side (an earlier
    RDD ``mapPartitionsWithIndex`` version measured ~4× slower at sf0.1 —
    every row paid Python serde twice): ``monotonically_increasing_id``
    encodes (partition id << 33) + local row index, so the local index is
    the low 33 bits; per-partition counts (one cheap aggregate, O(parts)
    rows to the driver) turn into cumulative offsets broadcast back.

    Row order follows the current partitioning, so use only where the
    caller doesn't require a business ordering. The input is persisted
    for the two passes — a recompute between count and assign could
    repartition and corrupt the offsets.
    """
    spark = df.sparkSession
    local_idx_mask = (1 << 33) - 1
    pinned = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    ).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in pinned.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, running = [], start
    for pid in sorted(counts):
        offsets.append((pid, running))
        running += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, start)], "_pid int, _off long")
    return (
        pinned.join(F.broadcast(off_df), "_pid")
        .withColumn(
            key_name,
            (F.col("_off") + F.col("_mid").bitwiseAND(F.lit(local_idx_mask))).cast(
                "long"
            ),
        )
        .select(key_name, *df.columns)
    )


def add_global_rank_distributed(
    df: DataFrame,
    order_exprs: Sequence,
    rank_name: str = "_grank",
    n_name: str = "_gn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based rank over a TOTAL ordering, plus the total row
    count, without a single-partition sort — the primitive behind the
    de-funneled order statistics (ntile/percent_rank/cume_dist all have
    closed forms in (rank, n) when the ordering has a tie-break).

    Same shape as ``add_sequence_key_distributed``: range-partition on
    the ordering, rank locally, broadcast the O(partitions) cumulative
    offsets back — here the offset table also carries the grand total so
    no extra scalar pin (and no extra BNLJ) is needed downstream.

    ``order_exprs`` are Column sort expressions (e.g.
    ``[F.col("v").desc(), F.col("k").asc()]``) so descending metrics
    work; the caller must include a unique tie-break column for the
    rank to be deterministic.
    """
    order_exprs = list(order_exprs)
    spark = df.sparkSession
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n_parts, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_exprs)
    # Persist: range boundaries come from sampling; the offset branch
    # must see the same partitioning as the rank branch.
    local = ranged.withColumn("_lrank", F.row_number().over(w_local)).persist()
    w_cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)))
        .withColumn(n_name, F.sum("_cnt").over(w_all))
        .select("_pid", "_off", n_name)
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_name, (F.col("_off") + F.col("_lrank")).cast("long"))
        .select(*df.columns, rank_name, n_name)
    )


def ntile_from_rank(rank, n, k: int):
    """SQL-standard ``ntile(k)`` as a closed-form expression over a
    1-based total rank and row count: the first ``n mod k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k`` — exactly the tile
    boundaries ntile draws, so the result is bit-identical to the
    window form whenever the rank came from a total ordering."""
    q = F.floor(n / k)
    rem = n % k
    big = (q + F.lit(1)) * rem  # rows covered by the (q+1)-sized tiles
    return F.when(rank <= big, F.floor((rank - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((rank - big - 1) / q) + 1
    )
