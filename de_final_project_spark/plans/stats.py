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


# ----------------------------------------------------------------------
# Column-level table profiling (round 5)
# ----------------------------------------------------------------------

# (column, kind) — kind picks the min/max canonicalization: numeric
# floats pin to DECIMAL(18,2) before stringifying so the two engines
# print identically; ints/dates/strings stringify natively.
PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the orders table — null count, exact
    distinct count, min and max per column — the dbt/Deequ-style
    profiling report that gates a dataset before it enters a pipeline.

    Shape: exactly TWO passes regardless of column count (the test pins
    the scan count). Pass 1 is a single 1-row aggregate carrying every
    column's null count and native-order min/max, unpivoted via
    ``stack``. Pass 2 computes every column's exact distinct count at
    once: unpivot rows to (col_name, value), one distinct, one count
    aggregate — the shape that holds when N columns would otherwise
    mean N distinct-scans (which is what Catalyst's multi-distinct
    rewrite degenerates to). The two 6-row results broadcast-join.
    min/max stringify AFTER aggregating in the native type, so numeric
    order (not lexicographic) decides them; floats canonicalize through
    DECIMAL(18,2) to print engine-identically (distinctness is also at
    that canonical precision, mirrored in the oracle).
    """
    orders = read_testdata(spark, sf_dir, "orders")

    def _native(c: str, kind: str):
        col = F.col(c)
        return col.cast("decimal(18,2)") if kind == "num" else col

    aggs = []
    for c, kind in PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(_native(c, kind)).cast("string").alias(f"{c}__min"),
            F.max(_native(c, kind)).cast("string").alias(f"{c}__max"),
        ]
    row = orders.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__min, {c}__max" for c, _ in PROFILE_COLS
    )
    basic = row.selectExpr(
        "__n AS n_rows",
        f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, min_value, max_value)",
    )

    unpivot_args = ", ".join(
        f"'{c}', CAST({f'CAST({c} AS DECIMAL(18,2))' if kind == 'num' else c}"
        " AS STRING)"
        for c, kind in PROFILE_COLS
    )
    distincts = (
        orders.selectExpr(
            f"stack({len(PROFILE_COLS)}, {unpivot_args}) AS (col_name, _v)"
        )
        .where(F.col("_v").isNotNull())
        .distinct()
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return basic.join(F.broadcast(distincts), "col_name").select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def _profile_sql() -> str:
    parts = []
    for c, kind in PROFILE_COLS:
        inner = f"CAST({c} AS DECIMAL(18,2))" if kind == "num" else c
        parts.append(f"""SELECT '{c}' AS col_name,
       count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_nulls,
       count(DISTINCT {inner})::BIGINT AS n_distinct,
       CAST(min({inner}) AS VARCHAR) AS min_value,
       CAST(max({inner}) AS VARCHAR) AS max_value
FROM orders""")
    return "\nUNION ALL\n".join(parts)


TABLE_PROFILE_SQL = _profile_sql()


def segment_nation_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for market segment x nation over
    customers: observed count, expected count under independence
    (row_total x col_total / N), and the cell's chi-square contribution
    — the association test a feature-engineering pass runs before
    trusting a categorical cross. Per-cell output keeps every float op
    a fixed expression tree (no accumulation-order dependence); the
    caller sums contributions for the statistic.

    Shape: one hash aggregate to cell counts, then window totals OVER
    THE AGGREGATED FRAME (at most |segments| x |nations| rows — the
    unpartitioned grand-total window runs on an aggregate-sized frame,
    not the raw table, so the single-partition stage is bounded by
    category cardinality, never row count).
    """
    cust = read_testdata(spark, sf_dir, "customer")
    sparse = cust.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation_key"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    # Chi-square needs the DENSE grid: absent combinations carry
    # expected mass (their term is E itself), so densify with an
    # explicit cross of the tiny category dims (|segments| x |nations|
    # rows; allowlisted in the BNLJ sweep as a bounded intentional
    # cross product) and left-join the sparse counts back.
    segs = sparse.select("segment").distinct()
    nats = sparse.select("nation_key").distinct()
    cells = (
        segs.crossJoin(nats)
        .join(sparse, ["segment", "nation_key"], "left")
        .select(
            "segment",
            "nation_key",
            F.coalesce("observed", F.lit(0)).cast("long").alias("observed"),
        )
    )
    from pyspark.sql import Window

    row_w = Window.partitionBy("segment")
    col_w = Window.partitionBy("nation_key")
    all_w = Window.partitionBy()
    expected = (
        F.sum("observed").over(row_w)
        * F.sum("observed").over(col_w)
        / F.sum("observed").over(all_w)
    ).cast("double")
    return cells.select(
        "segment",
        "nation_key",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(
            (F.col("observed").cast("double") - expected) ** 2 / expected, 6
        ).alias("chi2_term"),
    )


SEGMENT_NATION_CONTINGENCY_SQL = """
WITH sparse AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nation_key,
         count(*)::BIGINT AS observed
  FROM customer GROUP BY 1, 2
), cells AS (
  SELECT s.segment, n.nation_key, coalesce(sp.observed, 0)::BIGINT AS observed
  FROM (SELECT DISTINCT segment FROM sparse) s
  CROSS JOIN (SELECT DISTINCT nation_key FROM sparse) n
  LEFT JOIN sparse sp USING (segment, nation_key)
), tot AS (
  SELECT segment, nation_key, observed,
         CAST(sum(observed) OVER (PARTITION BY segment)
              * sum(observed) OVER (PARTITION BY nation_key)
              / sum(observed) OVER () AS DOUBLE) AS expected
  FROM cells
)
SELECT segment, nation_key, observed,
       round(expected, 6) AS expected,
       round(pow(observed::DOUBLE - expected, 2) / expected, 6) AS chi2_term
FROM tot
"""
