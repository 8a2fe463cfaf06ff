"""Materialized-view QUERY REWRITE: answer an aggregate query from a
registered finer-grained MV instead of the base table.

The IVM family (operators/ivm.py) keeps an MV *fresh*; this module makes
it *useful* beyond its literal shape — the classic warehouse optimization
(Oracle/Calcite "aggregate roll-up" rewrite): a query grouping by a
function of the MV's group keys, asking for re-aggregable aggregates, is
answered by scanning the MV (|groups| rows) instead of the base table
(|rows|). At 100 TB a daily-grain MV is ~5 orders of magnitude smaller
than the fact table, so a month-grain dashboard query over it is the
difference between a metadata-sized scan and a full-table pass.

Soundness rules enforced here (each rejected loudly, never silently):

- **Group compatibility**: every requested output key must be an
  expression over the MV's group columns ONLY. Checked structurally by
  resolving the expression against a projection of the MV restricted to
  its group keys — a reference to any other column cannot resolve.
- **Aggregate derivability** (second-stage aggregation must compose):
  sum(x) ⇐ stored sum(x); count(*) / count(x) ⇐ stored count (counts
  re-aggregate by SUM, not COUNT); min/max(x) ⇐ stored min/max(x);
  avg(x) ⇐ stored sum(x) AND count(x) — the non-null count, never
  count(*), and never avg-of-avg (wrong under uneven group sizes).
  Non-decomposable kinds (count_distinct, median, …) raise
  ``RewriteError``: correctness over convenience.

The reference engine (BernadinePierre/de-final-project,
src/process_lambda.py) recomputes every mart from bronze on each run —
no MV, no rewrite; this is the Spark-first replacement for that
recompute-the-world shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata


class RewriteError(ValueError):
    """The requested query is NOT answerable from the MV."""


# kind -> how a stored partial re-aggregates in the second stage
_REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts fold by summing
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class MVDef:
    """What the MV stores: its group grain and its aggregate columns.

    ``aggs`` maps stored column name -> (kind, source column or None for
    count(*)). The frame passed to :func:`rewrite_aggregate` must carry
    exactly ``group_by + list(aggs)`` columns.
    """

    group_by: tuple[str, ...]
    aggs: dict[str, tuple[str, str | None]] = field(default_factory=dict)

    def stored(self, kind: str, col: str | None) -> str | None:
        for name, (k, c) in self.aggs.items():
            if k == kind and c == col:
                return name
        return None


@dataclass(frozen=True)
class AggRequest:
    """The query to answer: output keys as SQL exprs over MV group
    columns, aggregates as (kind, source column or None, output alias)."""

    group_exprs: dict[str, str]
    aggs: tuple[tuple[str, str | None, str], ...]


def _check_group_exprs(mv: DataFrame, mvdef: MVDef, req: AggRequest) -> None:
    keys_only = mv.select(*mvdef.group_by)
    for out_name, expr in req.group_exprs.items():
        try:
            keys_only.select(F.expr(expr).alias(out_name))
        except Exception as e:  # unresolved column / bad expr
            raise RewriteError(
                f"group expression {out_name!r} = {expr!r} is not a "
                f"function of the MV's group keys {mvdef.group_by}: {e}"
            ) from None


def _derive(mvdef: MVDef, kind: str, col: str | None, alias: str) -> list[Column]:
    if kind in ("sum", "min", "max", "count"):
        name = mvdef.stored(kind, col)
        if name is None:
            raise RewriteError(
                f"{alias}: {kind}({col or '*'}) needs a stored "
                f"{kind}({col or '*'}) partial; MV stores {mvdef.aggs}"
            )
        return [_REAGG[kind](F.col(name)).alias(alias)]
    if kind == "avg":
        s = mvdef.stored("sum", col)
        n = mvdef.stored("count", col)  # non-null count of THE SAME col
        if s is None or n is None:
            raise RewriteError(
                f"{alias}: avg({col}) decomposes as sum({col})/count({col}) "
                f"— both partials must be stored; MV stores {mvdef.aggs} "
                "(avg-of-avg is rejected: wrong under uneven group sizes)"
            )
        # emitted as a pair; rewrite_aggregate divides after the re-agg
        return [
            F.sum(F.col(s)).alias(f"__rw_s_{alias}"),
            F.sum(F.col(n)).alias(f"__rw_n_{alias}"),
        ]
    raise RewriteError(
        f"{alias}: {kind} is not decomposable from stored partials "
        "(count_distinct/median/percentile need the base table)"
    )


def rewrite_aggregate(mv: DataFrame, mvdef: MVDef, req: AggRequest) -> DataFrame:
    """Answer ``req`` from ``mv`` — or raise :class:`RewriteError`.

    The produced plan scans ONLY the MV: group by the requested key
    expressions, second-stage-fold the stored partials, then finish
    derived forms (avg = folded sum / folded non-null count, rounded to
    6dp for cross-engine stability).
    """
    _check_group_exprs(mv, mvdef, req)
    keys = [F.expr(e).alias(n) for n, e in req.group_exprs.items()]
    cols: list[Column] = []
    for kind, col, alias in req.aggs:
        cols.extend(_derive(mvdef, kind, col, alias))
    out = mv.groupBy(*keys).agg(*cols)
    for kind, col, alias in req.aggs:
        if kind == "avg":
            out = out.withColumn(
                alias,
                F.round(
                    F.col(f"__rw_s_{alias}").cast("string").cast("double")
                    / F.col(f"__rw_n_{alias}"),
                    6,
                ),
            ).drop(f"__rw_s_{alias}", f"__rw_n_{alias}")
    return out.select(*req.group_exprs, *[a for _, _, a in req.aggs])


# ---------------------------------------------------------------- query

_DEC = "decimal(12,2)"


def _daily_orders_mv(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, MVDef]:
    """The registered MV: day-grain order stats. Day grain ≈ |dates|
    rows regardless of fact-table size — the asymmetry the rewrite
    exploits."""
    orders = read_testdata(spark, sf_dir, "orders")
    mv = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("sum_price"),
        F.count("o_totalprice").alias("n_price"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.col("o_totalprice").cast(_DEC)).alias("min_price"),
        F.max(F.col("o_totalprice").cast(_DEC)).alias("max_price"),
    )
    mvdef = MVDef(
        group_by=("order_date",),
        aggs={
            "sum_price": ("sum", "o_totalprice"),
            "n_price": ("count", "o_totalprice"),
            "n_orders": ("count", None),
            "min_price": ("min", "o_totalprice"),
            "max_price": ("max", "o_totalprice"),
        },
    )
    return mv, mvdef


def mv_rewrite_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain revenue dashboard answered FROM the day-grain MV via
    the roll-up rewrite — the base orders table is never rescanned at
    query time. The oracle aggregates the base table directly at month
    grain, so the driver check IS the semantics-preservation proof for
    the rewrite."""
    mv, mvdef = _daily_orders_mv(spark, sf_dir)
    req = AggRequest(
        group_exprs={"order_month": "date_trunc('month', order_date)"},
        aggs=(
            ("sum", "o_totalprice", "revenue_dec"),
            ("count", None, "n_orders"),
            ("avg", "o_totalprice", "avg_price"),
            ("min", "o_totalprice", "min_price_dec"),
            ("max", "o_totalprice", "max_price_dec"),
        ),
    )
    out = rewrite_aggregate(mv, mvdef, req)
    return out.select(
        F.col("order_month").cast("date").alias("order_month"),
        F.col("revenue_dec").cast("string").cast("double").alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
        "avg_price",
        F.col("min_price_dec").cast("double").alias("min_price"),
        F.col("max_price_dec").cast("double").alias("max_price"),
    )


MV_REWRITE_ROLLUP_SQL = """
-- the oracle answers at month grain from the BASE table; the engine
-- answers from the day-grain MV — equality proves the rewrite sound
SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
         AS order_month,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       count(*) AS n_orders,
       round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
                  AS DOUBLE) / count(o_totalprice), 6) AS avg_price,
       CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
       CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1
"""
