"""Data-quality gate — declarative expectations evaluated in ONE pass.

The reference enforces nothing: no nullability, no key uniqueness, no FK
containment anywhere (SURVEY.md §1.3 "No constraint / nullability
enforcement"). At 100 TB, a silent bad batch poisons every downstream
rebuild, so the engine adds a check stage the pipeline can run on each
bronze batch before it becomes visible.

Design for scale: all row-level expectations for a table are folded into
a single aggregate projection (one scan, map-side partials, O(checks)
result row — never one job per check). Set-level checks (unique key, FK
containment) are expressed as aggregates/joins that also reduce to
per-check counts. The report is a tiny DataFrame of
(check, violations, total) — collect-safe at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(*cols: str) -> dict[str, Column]:
    """Violation counters: rows where the column is null."""
    return {
        f"not_null:{c}": F.sum(F.col(c).isNull().cast("long")) for c in cols
    }


def in_range(col: str, lo, hi) -> dict[str, Column]:
    return {
        f"in_range:{col}": F.sum(
            (~F.col(col).between(F.lit(lo), F.lit(hi))).cast("long")
        )
    }


def accepted_values(col: str, values: Sequence) -> dict[str, Column]:
    return {
        f"accepted_values:{col}": F.sum(
            (~F.col(col).isin(list(values))).cast("long")
        )
    }


def matches(col: str, regex: str) -> dict[str, Column]:
    return {
        f"matches:{col}": F.sum((~F.col(col).rlike(regex)).cast("long"))
    }


def run_row_checks(df: DataFrame, *check_groups: dict[str, Column]) -> DataFrame:
    """Evaluate every row-level expectation in one aggregate over one scan.
    Returns (check, violations, total)."""
    checks: dict[str, Column] = {}
    for g in check_groups:
        checks.update(g)
    agg = df.agg(
        F.count(F.lit(1)).alias("_total"),
        *[expr.alias(name) for name, expr in checks.items()],
    )
    names = F.array(*[F.lit(n) for n in checks])
    viols = F.array(*[F.coalesce(F.col(f"`{n}`"), F.lit(0)) for n in checks])
    return (
        agg.select(
            F.explode(F.arrays_zip(names.alias("check"), viols.alias("violations"))).alias("z"),
            F.col("_total").alias("total"),
        )
        .select(
            F.col("z.check").alias("check"),
            F.col("z.violations").alias("violations"),
            "total",
        )
    )


def check_unique_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(check, violations, total): rows beyond the first per key value."""
    keys = list(keys)
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("violations"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("total"),
        )
    )
    return dup.select(
        F.lit(f"unique_key:{','.join(keys)}").alias("check"), "violations", "total"
    )


def check_fk(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """(check, violations, total): non-null FK values with no parent row.
    Left anti join on the (broadcastable, deduped) parent key set."""
    parents = parent.select(F.col(pk).alias(fk)).distinct()
    orphans = (
        child.where(F.col(fk).isNotNull())
        .join(F.broadcast(parents), fk, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    total = child.agg(F.count(F.lit(1)).alias("total"))
    return orphans.crossJoin(total).select(
        F.lit(f"fk:{fk}").alias("check"), "violations", "total"
    )


def quality_report(frames: Sequence[DataFrame]) -> DataFrame:
    """Union the per-check frames into one report."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
