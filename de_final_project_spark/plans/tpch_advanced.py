"""The remaining TPC-H query shapes: correlated/scalar subqueries, EXISTS
semi-joins, NOT-EXISTS anti-joins, ratio aggregates, and HAVING-over-global
scalars (Q2/Q4/Q8/Q11/Q15/Q20/Q21/Q22 analogues).

The reference has no subquery machinery at all (its pipeline is straight
extract→conform→load; SURVEY.md §2.6), so like plans/analytics.py this is
extension surface — but these eight exercise operator classes the earlier
queries don't: left-semi and left-anti joins driven by correlated
predicates, scalar aggregates broadcast back over the fact table, and
keep-all-ties max selection.

Schema adaptations (the driver testdata has no partsupp table and no
commit/receipt dates):
- part-supplier bridge = distinct (l_partkey, l_suppkey) pairs from
  lineitem; "supply cost" = the minimum observed unit price
  min(l_extendedprice / l_quantity) for the pair.
- "late" = l_shipdate more than N days after o_orderdate.
- Q22's phone country-code prefix = c_nationkey membership.

Scale notes: every semi/anti join here keys on a fact-table key
(orderkey/partkey/custkey) and shuffles at most once on it; scalar
aggregates reduce to one row and re-enter the plan as a broadcast
(crossJoin of a 1-row DataFrame — Spark plans BroadcastNestedLoopJoin
with a 1-row build side, i.e. a free scalar pin). Monetary aggregation is
exact decimal so results are partitioning- and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

_DEC = "decimal(12,2)"


def _dec(col: str) -> Column:
    return F.col(col).cast(_DEC)


def _revenue() -> Column:
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier per part (correlated MIN subquery)
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for each EUROPE-supplied part of size >= 40, the
    supplier(s) achieving the minimum unit cost.

    Plan shape: the part-supplier bridge aggregates once on
    (partkey, suppkey); the correlated `cost = (SELECT min...)` becomes a
    per-part MIN re-joined on (partkey, cost) — two hash aggregates and
    one equi-join, all keyed on partkey, so the whole query shuffles on a
    single key family and co-partitions. supplier/nation/region are
    broadcast. At 100 TB the bridge agg is the only large shuffle.
    """
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    p = read_testdata(spark, sf_dir, "part").where(F.col("p_size") >= 40).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    s = read_testdata(spark, sf_dir, "supplier")
    n = read_testdata(spark, sf_dir, "nation")
    r = read_testdata(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    europe_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    unit_cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu_cost = unit_cost.join(
        F.broadcast(europe_supp),
        unit_cost["l_suppkey"] == europe_supp["s_suppkey"],
    )
    min_cost = eu_cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eu_cost.join(
            min_cost,
            (eu_cost["l_partkey"] == min_cost["mc_partkey"])
            & (eu_cost["unit_cost"] == min_cost["min_cost"]),
        )
        .join(F.broadcast(p), eu_cost["l_partkey"] == p["p_partkey"])
        .select(
            F.col("s_acctbal").alias("supp_acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
            F.col("p_partkey").alias("part_key"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("unit_cost").alias("supply_cost"),
        )
    )


Q2_SQL = """
WITH bridge AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT b.*, s.s_name, s.s_acctbal, n.n_name
  FROM bridge b
  JOIN supplier s ON b.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT e.s_acctbal AS supp_acctbal,
       e.s_name   AS supp_name,
       e.n_name   AS supp_nation,
       p.p_partkey AS part_key,
       p.p_brand  AS brand,
       p.p_type   AS part_type,
       e.unit_cost AS supply_cost
FROM eu e
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_size >= 40
  AND e.unit_cost = (SELECT min(e2.unit_cost) FROM eu e2
                     WHERE e2.l_partkey = e.l_partkey)
"""


# --------------------------------------------------------------------------
# Q4: order-priority count gated on EXISTS (left-semi join)
# --------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders in one quarter that had at least one line
    shipped >60 days after the order date, counted by priority.

    The EXISTS becomes a LEFT SEMI join on orderkey — Spark's semi join
    short-circuits per key and carries no payload columns from the right
    side, so shuffle volume is keys only. The date filter sits on the
    orders scan (row-group pruning).
    """
    o = read_testdata(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1997-07-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-10-01"))
    )
    li = read_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    ).where(F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60))
    return (
        o.join(late.select("l_orderkey"), o["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority AS order_priority, count(*)::BIGINT AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q8: national market share (conditional-sum ratio)
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: NATION_3's share of ECONOMY-part revenue sold to
    ASIA customers, per order year.

    One wide join pipeline (lineitem ⋈ orders on orderkey is the only
    big shuffle; part/customer/supplier/nation all broadcast after their
    filters), then a 2-group conditional aggregate. The ratio is
    decimal/decimal at the end — exact and engine-stable.
    """
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    p = read_testdata(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    n = read_testdata(spark, sf_dir, "nation")
    r = read_testdata(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_cust = (
        read_testdata(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    supp_nation = (
        read_testdata(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    rev = _revenue()
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(asia_cust), o["o_custkey"] == asia_cust["c_custkey"], "left_semi")
        .join(F.broadcast(supp_nation), li["l_suppkey"] == supp_nation["s_suppkey"])
        .groupBy(F.year(F.to_date("o_orderdate")).alias("order_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast(_DEC))).alias("_nation_rev"),
            F.sum(rev).alias("_total_rev"),
        )
        .select(
            "order_year",
            # divide as doubles, not decimals: Spark's decimal division
            # truncates to the result scale while DuckDB returns a full
            # double — double/double is bit-identical in both engines
            (F.col("_nation_rev").cast("double") / F.col("_total_rev").cast("double")).alias("market_share"),
            F.col("_total_rev").cast("double").alias("total_revenue"),
        )
    )


Q8_SQL = """
SELECT year(CAST(o_orderdate AS DATE))::INT AS order_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS market_share,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q11: important stock (HAVING over a global scalar)
# --------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose traded value through NATION_5
    suppliers exceeds 1.5× the mean per-part value (the spec's absolute
    0.0001-of-total fraction degenerates as row counts grow — at sf0.1
    every part's share converges below it and the query goes empty; a
    mean-relative threshold keeps the HAVING-over-global-scalar shape
    scale-invariant).

    The HAVING-against-global-aggregate becomes: aggregate per part,
    aggregate the per-part result to one scalar row, crossJoin the
    scalar back (1-row broadcast), filter. The per-part agg is the only
    real shuffle; the scalar pass reuses its output (Spark reuses the
    exchange).
    """
    li = read_testdata(spark, sf_dir, "lineitem")
    s = (
        read_testdata(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 5)
        .select("s_suppkey")
    )
    value = _dec("l_extendedprice") * _dec("l_quantity")
    per_part = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"], "left_semi")
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.sum(value).alias("_value"))
    )
    # The 1.5×mean comparison is cross-multiplied into exact decimal/
    # integer arithmetic (2·n·value > 3·total) — a float mean would make
    # the threshold depend on summation order near the boundary.
    totals = per_part.agg(
        F.sum("_value").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .where(
            F.col("_value") * F.col("_n") * F.lit(2)
            > F.col("_total") * F.lit(3)
        )
        .select("part_key", F.col("_value").cast("double").alias("traded_value"))
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS part_key,
         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS _value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 5)
  GROUP BY 1
)
SELECT part_key, CAST(_value AS DOUBLE) AS traded_value
FROM per_part
WHERE _value * (SELECT count(*) FROM per_part) * 2
      > (SELECT sum(_value) FROM per_part) * 3
"""


# --------------------------------------------------------------------------
# Q15: top supplier (keep-all-ties max against a derived view)
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) with maximum revenue in 1997-Q1,
    ties kept (the spec's correlated `= (SELECT max(...))`).

    revenue0 (the Q15 view) is one filtered aggregate on suppkey; the max
    is a 1-row scalar crossJoined back; decimal equality keeps ties
    exactly. No window needed — the scalar join avoids a total sort.
    """
    li = read_testdata(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue0 = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("_total_rev"))
    )
    max_rev = revenue0.agg(F.max("_total_rev").alias("_max_rev"))
    s = read_testdata(spark, sf_dir, "supplier")
    return (
        revenue0.crossJoin(F.broadcast(max_rev))
        .where(F.col("_total_rev") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("_total_rev").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS _total_rev
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey AS supp_key, s_name AS supp_name,
       CAST(_total_rev AS DOUBLE) AS total_revenue
FROM revenue0 JOIN supplier ON supplier_no = s_suppkey
WHERE _total_rev = (SELECT max(_total_rev) FROM revenue0)
"""


# --------------------------------------------------------------------------
# Q20: dominant suppliers of a brand (nested aggregate threshold)
# --------------------------------------------------------------------------

def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: suppliers who shipped more than 30% of the 1997
    volume of some Brand#1 part.

    Two aggregates over the same filtered scan — per (part, supplier) and
    per part — joined on partkey, thresholded, then distinct suppliers
    decorated via broadcast. Both aggregates key on partkey so AQE
    co-partitions them; the distinct is on suppkey (small output).
    """
    li = read_testdata(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    p = read_testdata(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li_b = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
    per_ps = li_b.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("_supp_qty")
    )
    per_p = li_b.groupBy(F.col("l_partkey").alias("tp_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("_total_qty")
    )
    s = read_testdata(spark, sf_dir, "supplier")
    n = read_testdata(spark, sf_dir, "nation")
    return (
        per_ps.join(per_p, per_ps["l_partkey"] == per_p["tp_partkey"])
        # 30% threshold cross-multiplied into exact integer-scaled decimal
        # form (supp*10 > total*3) so Spark and the DuckDB oracle agree at
        # the boundary — decimal*0.3 would evaluate in double on the Spark
        # side but exact decimal in DuckDB (same rule Q11 follows).
        .where(F.col("_supp_qty") * F.lit(10) > F.col("_total_qty") * F.lit(3))
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
        )
    )


Q20_SQL = """
WITH li_b AS (
  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
), per_ps AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS _supp_qty
  FROM li_b GROUP BY 1, 2
), per_p AS (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS _total_qty
  FROM li_b GROUP BY 1
)
SELECT DISTINCT s_suppkey AS supp_key, s_name AS supp_name, n_name AS supp_nation
FROM per_ps
JOIN per_p USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE _supp_qty * 10 > _total_qty * 3
"""


# --------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting (semi + anti double correlation)
# --------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers who were the SOLE late shipper on a
    multi-supplier order (late = shipped >30 days after order date).

    The EXISTS(other supplier) / NOT EXISTS(other late supplier) pair
    becomes two aggregates per (orderkey): distinct-supplier count and
    distinct-LATE-supplier count, computed in ONE groupBy pass; a line
    qualifies when its supplier is late, the order has >1 supplier, and
    exactly 1 late supplier. One shuffle on orderkey replaces two
    correlated subqueries — the classic decorrelation, expressed directly.
    """
    li = (
        read_testdata(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    o = read_testdata(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).withColumn(
        "is_late",
        (F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30)).cast("int"),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    s = read_testdata(spark, sf_dir, "supplier")
    return (
        lo.where(F.col("is_late") == 1)
        .join(per_order, F.col("l_orderkey") == per_order["po_orderkey"])
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(F.col("s_name").alias("supp_name"), "numwait")
    )


Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         (CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)::INT AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY 1
)
SELECT s_name AS supp_name, count(*)::BIGINT AS numwait
FROM (
  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
  FROM lo JOIN per_order USING (l_orderkey)
  WHERE lo.is_late = 1 AND per_order.n_supp > 1 AND per_order.n_late_supp = 1
)
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q22: global sales opportunity (anti-join + scalar-avg subquery)
# --------------------------------------------------------------------------

def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: per selected nation, the count and total balance
    of above-average-balance customers with no orders since 2000-01-01.

    Nation membership stands in for the phone-prefix substring, and
    "lapsed since 2000" for "never ordered" (the synthetic data gives
    every customer at least one order, which would make the spec's
    predicate degenerate). The scalar AVG over the filtered population
    crossJoins back as a 1-row broadcast; the NOT EXISTS is a LEFT ANTI
    join on custkey with the date filter pushed onto the orders scan
    (keys-only shuffle). Aggregation is exact decimal.
    """
    nations = [3, 7, 11, 15, 19]
    c = read_testdata(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(nations)
    )
    # The scalar pin is rounded to 6 places on both sides (repo float-pin
    # convention): Spark's partition-order-dependent double accumulation and
    # DuckDB's sequential sum can differ in the last ulp, which would flip a
    # customer sitting exactly at the mean.
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("_avg_bal")
    )
    o = read_testdata(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).alias("_totacctbal"),
        )
        .select(
            "nation_key",
            "numcust",
            F.col("_totacctbal").cast("double").alias("total_acctbal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey::BIGINT AS nation_key,
       count(*)::BIGINT AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_nationkey IN (3, 7, 11, 15, 19)
  AND c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
                   WHERE c_nationkey IN (3, 7, 11, 15, 19) AND c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q12: shipping-mode priority mix (big-big join + conditional counts)
# --------------------------------------------------------------------------

def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: for each shipping mode, how many SLOW lines
    (shipped >30 days after the order date) in 1997 belonged to
    critical-priority orders vs everything else.

    Schema adaptation (module docstring): the testdata carries no
    l_shipmode / commit / receipt dates, so ship mode derives
    deterministically from the line number (``l_linenumber % 3`` ->
    MAIL/SHIP/RAIL) and "slow" is the module's late rule
    (shipdate > orderdate + 30).

    Plan shape — the one Q12 exists to exercise: lineitem ⋈ orders is
    the big-big equi-join on orderkey that CANNOT broadcast; both sides
    shuffle once on the join key and the conditional priority counts
    fold map-side into a 3-row hash aggregate. The 1997 filter sits on
    the lineitem scan (row-group pruning); orders is projected to two
    columns before the shuffle, so exchanged bytes are keys + one short
    string. Reference analog: none (SURVEY §2.6 — no subquery/join
    machinery); completes the 22-shape TPC-H sweep with Q16.
    """
    li = (
        read_testdata(spark, sf_dir, "lineitem")
        .where(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(
            "l_orderkey",
            "l_shipdate",
            F.element_at(
                F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("RAIL")),
                (F.col("l_linenumber") % 3 + 1).cast("int"),
            ).alias("ship_mode"),
        )
    )
    o = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    slow = li.join(o, li["l_orderkey"] == o["o_orderkey"]).where(
        F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30)
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        slow.groupBy("ship_mode")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT
  ['MAIL', 'SHIP', 'RAIL'][(l_linenumber % 3) + 1] AS ship_mode,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
  AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q16: supplier variety per part profile (anti-join + COUNT DISTINCT)
# --------------------------------------------------------------------------

def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: how many DISTINCT suppliers can provide each
    (brand, type, size) part profile, excluding one brand, a size
    whitelist, and blacklisted suppliers (the 'complaints' NOT IN —
    adapted to negative account balance, the module's rule).

    Plan shape: the part-supplier bridge (distinct l_partkey/l_suppkey
    pairs, module docstring) aggregates lineitem once on the pair; the
    supplier blacklist is a ~100-row broadcast LEFT ANTI join (NOT IN
    with no NULL trap — an anti join, not a nullable-subquery
    three-valued compare); part filters prune before the bridge join;
    the final COUNT(DISTINCT suppkey) hash-aggregates on the 3-column
    profile. Only the bridge build shuffles at scale.
    """
    bridge = (
        read_testdata(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        read_testdata(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    bridge = bridge.join(
        F.broadcast(bad), bridge["l_suppkey"] == bad["s_suppkey"], "left_anti"
    )
    p = read_testdata(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)
    )
    return (
        p.join(bridge, p["p_partkey"] == bridge["l_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM part
JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""
