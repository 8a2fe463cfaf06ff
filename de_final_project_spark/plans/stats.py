"""Statistical aggregates with engine-exact arithmetic: time-weighted
averages (the hypertable ``time_weight``/LOCF integral) and per-group
Pearson correlation computed from exact decimal moments.

Both operators exist because the naive float formulation is
NON-DETERMINISTIC across engines and partitionings: a float sum's value
depends on accumulation order, so ``F.corr``/``corr()`` and a
double-weighted integral can differ in the last ulps between Spark and
DuckDB (and between two runs with different partition counts). The fix is
the same in both: accumulate every moment (Σw, Σwx, Σx, Σy, Σxy, Σx²,
Σy²) as EXACT decimals/integers — associative, order-free — and only form
the final ratio in floating point, rounded to 6 places. One hash
aggregate per operator; nothing here shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata


def user_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value`` under LOCF: each
    observation holds until the next one, so the average is
    Σ value_i·Δt_i / Σ Δt_i over the user's observation span — the
    hypertable ``time_weight('locf', ...)`` aggregate, for users with at
    least 2 events.

    Shape: one window pass (lead over the per-user time order) to get
    each observation's holding interval, then one hash aggregate. The
    weighted sum is decimal(18,6)·µs-BIGINT — exact — and divides as a
    double only at the end.
    """
    ev = read_testdata(spark, sf_dir, "events")
    anchor = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2000-01-01 00:00:00', ts)"
    w = Window.partitionBy("user_id").orderBy(F.expr(anchor), F.col("event_id"))
    us = F.expr(anchor)
    nxt = F.lead(us).over(w)
    stepped = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("_v"),
        (nxt - us).alias("_dt_us"),
    ).where(F.col("_dt_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(F.col("_v") * F.col("_dt_us")).alias("_wsum"),
            F.sum("_dt_us").alias("_span_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            "user_id",
            "n_intervals",
            (F.col("_span_us").cast("double") / 1e6).alias("span_s"),
            F.round(
                F.col("_wsum").cast("double") / F.col("_span_us").cast("double"), 6
            ).alias("tw_avg_value"),
        )
    )


USER_TIME_WEIGHTED_VALUE_SQL = """
WITH stepped AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,6)) AS _v,
         datediff('microsecond', ts,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           ::BIGINT AS _dt_us
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_intervals,
       CAST(sum(_dt_us) AS DOUBLE) / 1e6 AS span_s,
       round(CAST(sum(_v * _dt_us) AS DOUBLE) / CAST(sum(_dt_us) AS DOUBLE), 6)
         AS tw_avg_value
FROM stepped
WHERE _dt_us IS NOT NULL
GROUP BY user_id
"""


def brand_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between line quantity and extended
    price, from exact integer/decimal moments.

    quantity and price are 2-dp decimals, so every moment (Σx, Σy, Σxy,
    Σx², Σy², n) accumulates exactly in wide decimals; the correlation
    r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is formed in floating
    point only from those exact totals — identical on any engine,
    partitioning, or row order, unlike built-in ``corr`` which folds
    doubles in arrival order. One broadcast dim join + one hash
    aggregate.
    """
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(20,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(20,2)").alias("y"),
    )
    p = read_testdata(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select("brand", "n", F.round(r, 6).alias("corr_qty_price"))


BRAND_PRICE_QUANTITY_CORR_SQL = """
WITH m AS (
  SELECT p_brand AS brand,
         count(*)::BIGINT AS n,
         sum(CAST(l_quantity AS DECIMAL(20,2))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS sy,
         sum(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2))) AS sxy,
         sum(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_quantity AS DECIMAL(20,2))) AS sxx,
         sum(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2))) AS syy
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT brand, n,
       round((n::DOUBLE * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((n::DOUBLE * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n::DOUBLE * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS corr_qty_price
FROM m
"""
