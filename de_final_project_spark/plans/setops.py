"""Set operations, grouping sets (rollup/cube), and order-statistic
aggregates — operators the reference lacks entirely (SURVEY.md §2.8 "No
INTERSECT/EXCEPT anywhere", §2.6 "no group-by aggregation") but that any
warehouse engine must expose. All Catalyst built-ins; each query has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (the EXCEPT/NOT EXISTS shape): customers with no urgent
    order. Physical plan: hash anti join with the priority filter pushed
    to the orders scan — one pass, no materialized distinct."""
    cust = read_testdata(spark, sf_dir, "customer")
    orders = read_testdata(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey AS customer_id, c_name AS customer_name,
       c_mktsegment AS market_segment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def parts_both_ordered_and_stocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: part keys appearing in both part and lineitem."""
    part = read_testdata(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id")
    )
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part_id")
    )
    return part.intersect(li)


PARTS_INTERSECT_SQL = """
SELECT p_partkey AS part_id FROM part
INTERSECT
SELECT l_partkey FROM lineitem
"""


def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region -> nation hierarchy: order revenue at
    (region, nation), (region), and grand-total levels, with grouping
    flags. Aggregation is hierarchical on already-partial aggregates —
    Catalyst expands the grouping sets into one shuffle."""
    orders = read_testdata(spark, sf_dir, "orders")
    cust = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation")
    region = read_testdata(spark, sf_dir, "region")
    enriched = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        )
    )
    return (
        enriched.rollup("region_name", "nation_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").alias("_rev"),
            F.grouping("region_name").cast("long").alias("g_region"),
            F.grouping("nation_name").cast("long").alias("g_nation"),
        )
        .select(
            "region_name", "nation_name", "n_orders",
            F.col("_rev").cast("double").alias("total_revenue"),
            "g_region", "g_nation",
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT region_name, nation_name, count(*) AS n_orders,
       CAST(sum(price) AS DOUBLE) AS total_revenue,
       grouping(region_name)::BIGINT AS g_region,
       grouping(nation_name)::BIGINT AS g_nation
FROM (
  SELECT r_name AS region_name, n_name AS nation_name,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
)
GROUP BY ROLLUP(region_name, nation_name)
"""


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday): all 4 grouping combinations in one
    pass."""
    events = read_testdata(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        (((F.dayofweek("ts") + 5) % 7)).cast("long").alias("weekday"),
    )
    return (
        base.cube("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.grouping("event_type").cast("long").alias("g_type"),
            F.grouping("weekday").cast("long").alias("g_weekday"),
        )
    )


EVENTS_CUBE_SQL = """
SELECT event_type, weekday, count(*) AS n_events,
       grouping(event_type)::BIGINT AS g_type,
       grouping(weekday)::BIGINT AS g_weekday
FROM (SELECT event_type, (isodow(ts) - 1)::BIGINT AS weekday FROM events)
GROUP BY CUBE(event_type, weekday)
"""


def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (exact order statistics — engine-portable,
    unlike interpolated quantiles) of quantity per return flag."""
    li = read_testdata(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_pct")
    return spark.sql(
        """
        SELECT l_returnflag AS return_flag,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM _li_pct
        GROUP BY l_returnflag
        """
    )


QUANTITY_PERCENTILES_SQL = """
SELECT l_returnflag AS return_flag,
       quantile_disc(l_quantity, 0.25) AS p25,
       quantile_disc(l_quantity, 0.5)  AS p50,
       quantile_disc(l_quantity, 0.75) AS p75,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty
FROM lineitem
GROUP BY 1
"""


# HLL accuracy contract: tolerance is derived from the configured rsd with
# 4x headroom (4 sigma), so an engine HLL change or an unlucky group shows
# up as a sketch-accuracy signal, not an arbitrary-constant mismatch.
HLL_RSD = 0.02
HLL_REL_TOL = 4 * HLL_RSD


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per event type, checked against the
    exact count. The raw HLL estimate is engine-specific, so the output
    carries it as a bounded-error assertion (within 4x the configured
    rsd of exact) rather than a raw number; that makes the query fully
    oracle-checkable while still exercising the sketch, which at 100 TB
    is the only affordable distinct-count. The oracle necessarily states
    the bound as TRUE (DuckDB cannot reproduce Spark's HLL estimate);
    the 4-sigma headroom makes a spurious flip vanishingly unlikely
    while a real sketch regression still trips it."""
    events = read_testdata(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", HLL_RSD).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= HLL_REL_TOL * F.col("exact_users")
            ).alias("approx_within_tol"),
        )
    )


APPROX_DISTINCT_USERS_SQL = """
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS approx_within_tol
FROM events
GROUP BY 1
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers with above-average account balance and
    no RECENT orders (none since 2000), counted per nation. Two
    independent sub-plans composed without any big shuffle: the global
    average is a 1-row scalar (broadcast into the filter), the
    time-scoped existential is a LEFT ANTI hash join on custkey against
    the date-filtered (scan-pruned) orders, and the final count groups by
    the small nation key."""
    c = read_testdata(spark, sf_dir, "customer")
    o = read_testdata(spark, sf_dir, "orders")
    n = read_testdata(spark, sf_dir, "nation")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg((F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
              / F.count(F.lit(1))).alias("avg_bal"))
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.where(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey"),
            c["c_custkey"] == F.col("o_custkey"),
            "left_anti",
        )
    )
    return (
        rich.join(F.broadcast(n), rich["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_balance"),
        )
    )


IDLE_RICH_CUSTOMERS_SQL = """
SELECT n_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-quality gate (operators/quality.py) run over the source
    star: null checks folded into ONE aggregate per table, key-uniqueness
    and FK-containment as count aggregates. Output is the tiny
    (check, violations, total) report a pipeline would gate a batch on."""
    from de_final_project_spark.operators.quality import (
        check_fk,
        check_unique_key,
        not_null,
        quality_report,
        run_row_checks,
    )

    cust = read_testdata(spark, sf_dir, "customer")
    orders = read_testdata(spark, sf_dir, "orders")
    nation = read_testdata(spark, sf_dir, "nation")
    return quality_report(
        [
            run_row_checks(cust, not_null("c_custkey", "c_name", "c_nationkey")),
            run_row_checks(orders, not_null("o_orderkey", "o_custkey", "o_orderdate")),
            check_unique_key(cust, ["c_custkey"]),
            check_unique_key(orders, ["o_orderkey"]),
            check_fk(cust, "c_nationkey", nation, "n_nationkey"),
            check_fk(orders, "o_custkey", cust, "c_custkey"),
        ]
    )


SOURCE_QUALITY_REPORT_SQL = """
SELECT 'not_null:c_custkey' AS check,
       count(*) FILTER (WHERE c_custkey IS NULL) AS violations,
       count(*) AS total FROM customer
UNION ALL
SELECT 'not_null:c_name', count(*) FILTER (WHERE c_name IS NULL), count(*) FROM customer
UNION ALL
SELECT 'not_null:c_nationkey', count(*) FILTER (WHERE c_nationkey IS NULL), count(*) FROM customer
UNION ALL
SELECT 'not_null:o_orderkey', count(*) FILTER (WHERE o_orderkey IS NULL), count(*) FROM orders
UNION ALL
SELECT 'not_null:o_custkey', count(*) FILTER (WHERE o_custkey IS NULL), count(*) FROM orders
UNION ALL
SELECT 'not_null:o_orderdate', count(*) FILTER (WHERE o_orderdate IS NULL), count(*) FROM orders
UNION ALL
SELECT 'unique_key:c_custkey',
       coalesce(sum(n - 1), 0)::BIGINT, coalesce(sum(n), 0)::BIGINT
FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey)
UNION ALL
SELECT 'unique_key:o_orderkey',
       coalesce(sum(n - 1), 0)::BIGINT, coalesce(sum(n), 0)::BIGINT
FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'fk:c_nationkey',
       (SELECT count(*) FROM customer c
        WHERE c_nationkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c.c_nationkey)),
       (SELECT count(*) FROM customer)
UNION ALL
SELECT 'fk:o_custkey',
       (SELECT count(*) FROM orders o
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)),
       (SELECT count(*) FROM orders)
"""


def user_value_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event rollup computed through the salted two-phase
    aggregation (operators/skew.py) — the oracle is the plain GROUP BY,
    so this query PROVES the skew path is result-identical while its
    shuffle spreads any hot user across 8 reducers. Decimal partial sums
    keep the two-phase re-aggregation exact."""
    from de_final_project_spark.operators.skew import salted_agg

    ev = read_testdata(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["user_id"],
        partial_aggs={
            "n_events": F.count(F.lit(1)),
            "_sum": F.sum(F.col("value").cast("decimal(18,6)")),
        },
        merge_aggs={"n_events": F.sum("n_events"), "_sum": F.sum("_sum")},
        salt_from=["event_id"],
        n_salts=8,
    )
    return out.select(
        "user_id", "n_events", F.col("_sum").cast("double").alias("total_value")
    )


USER_VALUE_SALTED_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
"""


LEVENSHTEIN_MAX = 2


def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: part pairs whose names are
    within Levenshtein distance ``LEVENSHTEIN_MAX``, BLOCKED on p_brand
    so the candidate set is Σ per-brand-count² instead of n² — the
    standard blocking-key discipline of record linkage (an unblocked
    fuzzy join is the canonical accidental-cartesian at scale; at 10⁹
    rows the blocking key would be sharper, e.g. name length ± 1 and a
    first-character band, but the plan shape is identical: equi-join on
    the block key, expensive distance only on in-block pairs).

    The distance runs JVM-side (``F.levenshtein``), never in Python.
    The probe side is repartitioned first: the part table is a few MB,
    so Spark packs the whole scan into ONE split regardless of row
    groups, and the Σ block² Levenshtein stage (≈800M pairs at sf1)
    would grind on a single core (sf1 proof finding — the hazard is
    compute-per-byte, which maxPartitionBytes can't see).
    """
    p = read_testdata(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    p = p.repartition(spark.sparkContext.defaultParallelism)
    a = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
    )
    b = p.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
    )
    return (
        a.join(b, (a["brand"] == b["b_brand"]) & (a["a_key"] < b["b_key"]))
        .withColumn("name_dist", F.levenshtein("a_name", "b_name").cast("long"))
        .where(F.col("name_dist") <= LEVENSHTEIN_MAX)
        .select("brand", "a_key", "b_key", "a_name", "b_name", "name_dist")
    )


SIMILAR_PART_NAMES_SQL = f"""
SELECT a.p_brand AS brand,
       a.p_partkey AS a_key, b.p_partkey AS b_key,
       a.p_name AS a_name, b.p_name AS b_name,
       levenshtein(a.p_name, b.p_name)::BIGINT AS name_dist
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {LEVENSHTEIN_MAX}
"""
