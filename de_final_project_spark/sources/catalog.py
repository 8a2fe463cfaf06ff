"""Catalog introspection over the gold zone (S8/K5 equivalents).

The reference lists warehouse tables via information_schema and logs a
10-row preview of each (src/warehousing_lambda.py:79-121). Spark-side the
gold directory registers into the session catalog and the same listing /
preview become catalog calls.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def register_gold(spark: SparkSession, gold_dir: str) -> list[str]:
    """Register every gold parquet table as a temp view; returns names."""
    names = []
    for entry in sorted(os.listdir(gold_dir)):
        path = os.path.join(gold_dir, entry)
        if os.path.isdir(path):
            spark.read.parquet(path).createOrReplaceTempView(entry)
            names.append(entry)
    return names


def list_tables(spark: SparkSession) -> list[str]:
    """SHOW TABLES — the information_schema scan of the reference."""
    return sorted(t.name for t in spark.catalog.listTables())


def preview_all(spark: SparkSession, n: int = 10) -> dict[str, list]:
    """First-n preview of every registered table (K5)."""
    return {
        name: spark.table(name).limit(n).collect()
        for name in list_tables(spark)
    }


def export_csv(df: DataFrame, out_dir: str, name: str) -> None:
    """Full-table CSV extract (K4, src/warehousing_lambda.py:112-115)."""
    df.write.mode("overwrite").option("header", "true").csv(
        os.path.join(out_dir, name)
    )
