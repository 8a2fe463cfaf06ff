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


# ----------------------------------------------------------------------
# Join-key discovery: FK containment profiling (round 5)
# ----------------------------------------------------------------------

# (child_table, child_col, parent_table, parent_col) — the candidate FK
# edges a catalog crawler would test. The last row is a deliberate
# negative control (an id pair that is NOT an FK) so the report's
# discrimination is itself checked.
FK_CANDIDATES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),
]


def fk_candidates(spark, sf_dir: str):
    """Foreign-key discovery report: for each candidate (child column,
    parent column) edge, the distinct cardinalities on both sides, how
    many distinct child values the parent contains, and the containment
    ratio — the inclusion-dependency profiling a catalog crawler runs to
    infer join keys on an undocumented lake (containment 1.0 + parent
    uniqueness = FK shape). The reference hard-codes its star joins
    (src/process_lambda.py); this is the discovery step that would
    recover them from data alone, and the fixture list carries a
    deliberate non-FK control edge to prove the report discriminates.

    Shape per edge: two distinct aggregates and a broadcast-able
    left-semi-style join on the distinct sets — cost is bounded by key
    cardinality, never row count, so at 100 TB the profiler touches the
    distinct key sets only. One union of fixed-width report rows.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    from de_final_project_spark.sources.readers import read_testdata

    reports = []
    for child_t, child_c, parent_t, parent_c in FK_CANDIDATES:
        child = (
            read_testdata(spark, sf_dir, child_t)
            .select(F.col(child_c).alias("k"))
            .where(F.col("k").isNotNull())
            .distinct()
        )
        parent = (
            read_testdata(spark, sf_dir, parent_t)
            .select(F.col(parent_c).alias("k"))
            .where(F.col("k").isNotNull())
            .distinct()
        )
        # FULL OUTER of the two distinct key sets: one join + one
        # aggregate yields all three counts (no 1-row cross join, so the
        # whole report stays inside the no-BNLJ plan contract).
        both = child.withColumn("_c", F.lit(1)).join(
            parent.withColumn("_p", F.lit(1)), "k", "full_outer"
        )
        rep = both.agg(
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_child_distinct"),
            F.sum(F.coalesce(F.col("_p"), F.lit(0))).alias("n_parent_distinct"),
            F.sum(
                (F.col("_c").isNotNull() & F.col("_p").isNotNull()).cast("long")
            ).alias("n_contained"),
        ).select(
            F.lit(f"{child_t}.{child_c}").alias("child_key"),
            F.lit(f"{parent_t}.{parent_c}").alias("parent_key"),
            F.col("n_child_distinct").cast("long").alias("n_child_distinct"),
            F.col("n_parent_distinct").cast("long").alias("n_parent_distinct"),
            F.col("n_contained").cast("long").alias("n_contained"),
            F.round(
                F.col("n_contained").cast("double") / F.col("n_child_distinct"),
                6,
            ).alias("containment"),
            (F.col("n_contained") == F.col("n_child_distinct")).alias(
                "is_fk_shape"
            ),
        )
        reports.append(rep)
    return reduce(lambda a, b: a.unionByName(b), reports)


def _fk_candidates_sql() -> str:
    parts = []
    for child_t, child_c, parent_t, parent_c in FK_CANDIDATES:
        parts.append(f"""SELECT '{child_t}.{child_c}' AS child_key,
       '{parent_t}.{parent_c}' AS parent_key,
       (SELECT count(DISTINCT {child_c}) FROM {child_t}
        WHERE {child_c} IS NOT NULL)::BIGINT AS n_child_distinct,
       (SELECT count(DISTINCT {parent_c}) FROM {parent_t}
        WHERE {parent_c} IS NOT NULL)::BIGINT AS n_parent_distinct,
       (SELECT count(*) FROM
         (SELECT DISTINCT {child_c} AS k FROM {child_t}
          WHERE {child_c} IS NOT NULL) c
        WHERE c.k IN (SELECT {parent_c} FROM {parent_t}))::BIGINT
         AS n_contained,
       round((SELECT count(*) FROM
               (SELECT DISTINCT {child_c} AS k FROM {child_t}
                WHERE {child_c} IS NOT NULL) c
              WHERE c.k IN (SELECT {parent_c} FROM {parent_t}))::DOUBLE
             / (SELECT count(DISTINCT {child_c}) FROM {child_t}
                WHERE {child_c} IS NOT NULL), 6) AS containment,
       ((SELECT count(*) FROM
          (SELECT DISTINCT {child_c} AS k FROM {child_t}
           WHERE {child_c} IS NOT NULL) c
         WHERE c.k IN (SELECT {parent_c} FROM {parent_t}))
        = (SELECT count(DISTINCT {child_c}) FROM {child_t}
           WHERE {child_c} IS NOT NULL)) AS is_fk_shape""")
    return "\nUNION ALL\n".join(parts)


FK_CANDIDATES_SQL = _fk_candidates_sql()
