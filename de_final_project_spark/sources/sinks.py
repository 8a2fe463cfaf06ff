"""Sinks — K1-K6 of SURVEY.md §2.2, Spark-first.

The reference writes one object per call (wr.s3.to_csv / put_object of
parquet bytes — src/ingestion_lambda.py:171-175, src/process_lambda.py:59-66).
Spark writes a directory of part-files per table; at scale that IS the
correct shape (parallel writers, no single-object bottleneck).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_csv_batch(df: DataFrame, lake_dir: str, table: str, batch_ts: str) -> None:
    """CSV sink, one batch directory per ingest cycle (K1 equivalent).

    Bronze path ``{lake}/{table}/batch_ts=<ts>/`` mirrors the reference's
    ``{table}/{timestamp}.csv`` key scheme (src/ingestion_lambda.py:173) as
    a Hive partition, making the batch id a prunable column on re-read.

    Prefer URI-safe batch ids (no spaces, e.g. ``2024-01-05T0000``): the
    batch reader tolerates spaces, but the streaming file source
    (streaming/pipeline.py) globs the partition path as a URI.
    """
    path = os.path.join(lake_dir, table, f"batch_ts={batch_ts}")
    df.write.mode("errorifexists").option("header", "true").csv(path)


def write_parquet_overwrite(df: DataFrame, out_dir: str, name: str) -> None:
    """Parquet overwrite sink for silver/gold tables (K2 equivalent)."""
    df.write.mode("overwrite").parquet(os.path.join(out_dir, name))


def write_jdbc_overwrite(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 1000,
) -> None:
    """JDBC overwrite sink (K3 equivalent).

    batchsize=1000 mirrors the reference's chunked insert
    (src/warehousing_lambda.py:64-71); Spark executes it per-partition in
    parallel instead of a single driver loop.
    """
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    df.write.jdbc(url, table, mode="overwrite", properties=props)


def preview(df: DataFrame, n: int = 10) -> str:
    """LIMIT-n preview string (K5 equivalent of the reference's logged
    ``to_string`` preview, src/warehousing_lambda.py:98-108)."""
    return df._jdf.showString(n, 20, False)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    output file count.

    The bronze lake accretes one small file set per ingest batch (the
    reference writes one object per table per 20-minute cycle —
    src/ingestion_lambda.py:171-175). At scale, scan cost and driver
    listing both degrade with file count, so periodic compaction is part
    of the table lifecycle. Partition count is sized from actual input
    bytes; the rewrite is a round-robin repartition (no skew, parallel
    writers), and reads keep working against dst_dir.
    """
    import math

    df = spark.read.parquet(src_dir)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dst_dir)
    return len(
        [
            f
            for root, _, files in os.walk(dst_dir)
            for f in files
            if f.endswith(".parquet")
        ]
    )


def write_parquet_partitioned(
    df: DataFrame, out_dir: str, name: str, partition_cols: list[str]
) -> None:
    """Parquet overwrite partitioned by the given columns — the gold
    layout that turns date/tenant predicates into directory pruning (a
    metadata operation) instead of data scans. At 100 TB a fact
    partitioned by order month answers one-month queries reading ~1/12 of
    the files before any row-group filtering happens."""
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(os.path.join(out_dir, name))
    )


def write_orc_overwrite(df: DataFrame, out_dir: str, name: str) -> None:
    """ORC overwrite sink — same contract as the parquet sink for stacks
    standardized on ORC (both are JVM-native columnar formats with
    predicate pushdown; no extra packages needed)."""
    df.write.mode("overwrite").orc(os.path.join(out_dir, name))
