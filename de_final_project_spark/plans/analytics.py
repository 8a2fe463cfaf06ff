"""Analytics extension queries over the driver testdata.

The reference has no group-by aggregation at all (SURVEY.md §2.6) — this
module is the extension surface a real warehouse engine needs: hash
aggregates, top-k windows, multi-way star joins, JSON scalar extraction,
and time-bucketed event rollups. Everything is built-in-function only
(whole-stage codegen end to end); aggregations of monetary doubles go
through exact decimal arithmetic so results are bit-stable and
oracle-comparable (doubles summed in different orders are not).

Scale notes per query are inline; the common rules: small sides broadcast,
aggregates are partial (map-side) before the shuffle because they are
plain hash aggregates on low-cardinality keys, and filters sit directly on
the scan so parquet row-group pruning and column pruning apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

# Exact-decimal versions of the monetary columns (2-dp doubles in the
# testdata). Decimal sums are associative -> identical across engines and
# partitionings; final results are cast back to double.
_DEC = "decimal(12,2)"


def _dec(col: str) -> Column:
    return F.col(col).cast(_DEC)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter -> hash aggregate on a
    2-value × 2-value key. The filter is on the scan (row-group pruning);
    the aggregate is map-side partial then a 6-group final — shuffle
    volume is O(partitions), not O(rows)."""
    li = read_testdata(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(_DEC) + _dec("l_tax"))
    out = (
        li.groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.sum(disc_price).alias("_sum_disc"),
            F.sum(charge).alias("_sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "return_flag",
            "line_status",
            # decimal -> string -> double: string parsing is correctly
            # rounded ONCE in every engine, while native decimal->double
            # may double-round (DuckDB divides (double)int128 by
            # (double)10^scale) — at sf1 the 17-significant-digit charge
            # sum diverged by 1 ulp (sf1 proof finding). The string hop
            # costs nothing on 6 aggregate rows and pins both engines to
            # the IEEE-nearest value.
            F.col("_sum_qty").cast("string").cast("double").alias("sum_qty"),
            F.col("_sum_base").cast("string").cast("double").alias("sum_base_price"),
            F.col("_sum_disc").cast("string").cast("double").alias("sum_disc_price"),
            F.col("_sum_charge").cast("string").cast("double").alias("sum_charge"),
            (F.col("_sum_qty").cast("string").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sum_base").cast("string").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
    )
    return out


Q1_SQL = """
SELECT return_flag, line_status,
       -- string hop = correctly-rounded-once decimal->double (see engine)
       CAST(CAST(_sum_qty AS STRING) AS DOUBLE)    AS sum_qty,
       CAST(CAST(_sum_base AS STRING) AS DOUBLE)   AS sum_base_price,
       CAST(CAST(_sum_disc AS STRING) AS DOUBLE)   AS sum_disc_price,
       CAST(CAST(_sum_charge AS STRING) AS DOUBLE) AS sum_charge,
       CAST(CAST(_sum_qty AS STRING) AS DOUBLE) / count_order  AS avg_qty,
       CAST(CAST(_sum_base AS STRING) AS DOUBLE) / count_order AS avg_price,
       count_order
FROM (
  SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
         sum(CAST(l_quantity AS DECIMAL(12,2)))      AS _sum_qty,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS _sum_base,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS _sum_disc,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
             * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS _sum_charge,
         count(*) AS count_order
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
  GROUP BY 1, 2
)
"""


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment filter -> 3-way join -> revenue aggregate
    -> deterministic top-10. customer is broadcast (small after filter);
    lineitem⋈orders shuffles on orderkey only."""
    cust = read_testdata(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_testdata(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < F.lit("1998-01-01")
    )
    li = read_testdata(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1998-01-01")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(F.sum(revenue).alias("_rev"))
        .select(
            "order_key",
            "order_date",
            "order_priority",
            F.col("_rev").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT order_key, order_date, order_priority, CAST(_rev AS DOUBLE) AS revenue
FROM (
  SELECT l_orderkey AS order_key,
         CAST(o_orderdate AS DATE) AS order_date,
         o_orderpriority AS order_priority,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS _rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
  GROUP BY 1, 2, 3
)
ORDER BY revenue DESC, order_key ASC
LIMIT 10
"""


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation where customer and supplier
    share the nation. nation/region broadcast; supplier broadcasts at
    test scale and stays the smallest shuffle side at 100 TB."""
    cust = read_testdata(spark, sf_dir, "customer")
    orders = read_testdata(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01"))
    )
    li = read_testdata(spark, sf_dir, "lineitem")
    supp = read_testdata(spark, sf_dir, "supplier")
    nation = read_testdata(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .where(cust["c_nationkey"] == supp["s_nationkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(revenue).alias("_rev"))
        .select("nation_name", F.col("_rev").cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name AS nation_name, CAST(sum(rev) AS DOUBLE) AS revenue
FROM (
  SELECT c_nationkey,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
  WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
)
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price — the per-key top-k window
    (the distributed generalization of the reference's keep-latest, W1/W3).
    One hash exchange on custkey feeding a rank window; no global sort."""
    from pyspark.sql import Window

    orders = read_testdata(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("order_rank", F.row_number().over(w).cast("long"))
        .where(F.col("order_rank") <= 3)
        .select(
            F.col("o_custkey").alias("customer_key"),
            "order_rank",
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.to_date("o_orderdate").alias("order_date"),
        )
    )


TOP_ORDERS_SQL = """
SELECT o_custkey AS customer_key,
       order_rank,
       o_orderkey AS order_key,
       o_totalprice AS total_price,
       CAST(o_orderdate AS DATE) AS order_date
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS order_rank
  FROM orders
)
WHERE order_rank <= 3
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event rollup (streaming-concept analog of the
    reference's 20-minute micro-batch cadence, SURVEY.md §2.10): hour
    bucket × event_type hash aggregate with exact-decimal value sums."""
    events = read_testdata(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).alias("_sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "hour",
            "event_type",
            "n_events",
            F.col("_sum_value").cast("double").alias("sum_value"),
            "n_users",
        )
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column (the data-plane analog
    of the reference's control-plane JSON handling, F12 — SURVEY.md §2.9)
    + aggregate per event_type."""
    events = read_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       count(*) AS n_events,
       sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY 1
"""


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap via
    ``session_window`` — the stateful windowed operator the reference has
    no analog for. One shuffle on user_id; state is per-user in-window.
    session_end follows Spark's definition: last event ts + gap."""
    events = read_testdata(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).alias("_sum_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            F.col("_sum_value").cast("double").alias("sum_value"),
        )
    )


EVENTS_SESSIONIZED_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to returned items per customer over
    one quarter, top 20. lineitem⋈orders shuffles on orderkey (the two
    big tables); customer and nation broadcast. The returnflag and
    order-date filters reach both parquet scans before the join."""
    li = read_testdata(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = read_testdata(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = read_testdata(spark, sf_dir, "customer")
    n = read_testdata(spark, sf_dir, "nation")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery: revenue from orders of
    a brand's parts in quantities below 50% of that part's average.
    Decorrelated Spark-first: the per-part average is a partial-pushed
    hash aggregate joined back on partkey — no per-row subquery execution,
    two scans of lineitem but each fully parallel."""
    li = read_testdata(spark, sf_dir, "lineitem")
    p = read_testdata(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(avg_qty, li["l_partkey"] == F.col("_pk"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("_avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l.l_quantity < 0.5 * (
        SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped conditional aggregation: promo-type parts' share
    of one month's revenue. CASE folds into the same map-side partial
    aggregate as the plain sum — one broadcast join (part is
    dimension-sized), one scalar result row."""
    li = read_testdata(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = read_testdata(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


Q14_SQL = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                  * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS promo_revenue_pct,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


def customer_value_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value distribution: total spend per customer,
    then quartile (ntile), percent_rank, and cume_dist over the spend
    ordering. The aggregate shuffles on custkey; the three order
    statistics come from ONE distributed global-rank pass
    (operators/surrogate.add_global_rank_distributed) — the custkey
    tie-break makes the ordering total, so ntile has its closed form in
    (rank, n), percent_rank = (rank-1)/(n-1), and cume_dist = rank/n,
    all bit-identical to the window forms with no single-partition sort
    at any customer cardinality."""
    from de_final_project_spark.operators.surrogate import (
        add_global_rank_distributed,
        ntile_from_rank,
    )

    o = read_testdata(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("_spend"), F.count(F.lit(1)).alias("n_orders")
    )
    ranked = add_global_rank_distributed(
        spend, [F.col("_spend").asc(), F.col("o_custkey").asc()]
    )
    r, n = F.col("_grank"), F.col("_gn")
    return ranked.select(
        "o_custkey",
        "n_orders",
        F.col("_spend").cast("double").alias("total_spend"),
        ntile_from_rank(r, n, 4).cast("int").alias("quartile"),
        F.round(
            F.when(n > 1, (r - 1).cast("double") / (n - 1).cast("double")).otherwise(
                F.lit(0.0)  # percent_rank of a single row is 0, not 0/0
            ),
            6,
        ).alias("pct_rank"),
        F.round(r.cast("double") / n.cast("double"), 6).alias("cume"),
    )


CUSTOMER_VALUE_TILES_SQL = """
SELECT o_custkey, n_orders,
       CAST(s AS DOUBLE) AS total_spend,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
WINDOW w AS (ORDER BY s ASC, o_custkey ASC)
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate join: revenue from three
    independent (brand, size-range, quantity-range) arms OR-ed together.
    The join is a plain broadcast hash join on partkey; the OR predicate
    stays a join residual. Catalyst extracts the common sub-predicates it
    can (size/quantity bounds per arm reach the scans as range filters
    where shared), and the disjunction never forces a cartesian plan."""
    li = read_testdata(spark, sf_dir, "lineitem")
    p = read_testdata(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    return joined.where(arm1 | arm2 | arm3).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


def copurchased_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often ordered
    together. The pair generation is a self-join WITHIN each order
    (shuffle on orderkey, then per-order pair fan-out) — pair volume is
    Σ items_per_order², bounded by small basket sizes, never a global
    cross join. Top-20 is a TakeOrdered over the pair counts."""
    li = read_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


COPURCHASED_PARTS_SQL = """
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
"""


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of document lengths in 50-char buckets — the profiling
    primitive behind length-based quality filters. Bucketing is a pure
    projection; one small hash aggregate on the bucket id."""
    docs = read_testdata(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 50) * 50).cast("long")
    return (
        docs.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


DOC_LENGTH_HISTOGRAM_SQL = """
SELECT CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket_lo,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY 1
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue delta: one scan, three range
    predicates all pushed to the parquet reader (row-group stats prune
    whole chunks), one global aggregate — the canonical scan-bound query
    whose cost at 100 TB is pure I/O after pruning."""
    li = read_testdata(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.03, 0.05))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part: the supplier with the lowest observed unit price across
    lineitem history — the min-by/arg-min aggregate family, planned as a
    single hash aggregate (map-side partial min_by, no window, no
    self-join). Ties break to the lowest supplier key via the struct
    ordering, keeping the answer deterministic at any scale."""
    li = read_testdata(spark, sf_dir, "lineitem")
    # raw IEEE division — identical doubles on both engines; round() is
    # NOT used because Spark rounds HALF_UP and DuckDB HALF_EVEN at .005
    unit_price = F.col("l_extendedprice") / F.col("l_quantity")
    return (
        li.select("l_partkey", "l_suppkey", unit_price.alias("_up"))
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(
            F.min_by(
                F.col("l_suppkey"), F.struct(F.col("_up"), F.col("l_suppkey"))
            ).alias("cheapest_supplier"),
            F.min("_up").alias("min_unit_price"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


CHEAPEST_SUPPLIER_SQL = """
SELECT part_key, cheapest_supplier, min_unit_price, n_lineitems
FROM (
  SELECT l_partkey AS part_key, l_suppkey AS cheapest_supplier,
         min(up) OVER (PARTITION BY l_partkey) AS min_unit_price,
         count(*) OVER (PARTITION BY l_partkey) AS n_lineitems,
         row_number() OVER (PARTITION BY l_partkey ORDER BY up, l_suppkey) AS rn
  FROM (SELECT l_partkey, l_suppkey,
               l_extendedprice / l_quantity AS up
        FROM lineitem)
)
WHERE rn = 1
"""


def customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer ordered purchase history as a CSV string — the
    list/string aggregation family done deterministically:
    ``collect_list`` carries NO ordering guarantee (it reflects partition
    arrival), so the values are collected as (sort-key, value) structs
    and ``array_sort``-ed before projection. One hash aggregate; the
    ordering cost is per-group, not a global sort.

    The output is scalar-only by design: the ordered keys are emitted as
    the CSV string, not an array column (array outputs break downstream
    pandas-based canonicalizers/hashers, which cannot hash lists)."""
    o = read_testdata(spark, sf_dir, "orders")
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("o_orderdate"), F.col("o_orderkey")))
    )
    return (
        o.groupBy(F.col("o_custkey").alias("customer_key"))
        .agg(pairs.alias("_p"))
        .select(
            "customer_key",
            F.concat_ws(
                ",",
                F.transform(
                    F.col("_p"), lambda s: s["o_orderkey"].cast("string")
                ),
            ).alias("order_keys_csv"),
            F.size("_p").cast("long").alias("n_orders"),
        )
    )


CUSTOMER_ORDER_HISTORY_SQL = """
SELECT o_custkey AS customer_key,
       string_agg(CAST(o_orderkey AS VARCHAR), ','
                  ORDER BY o_orderdate, o_orderkey) AS order_keys_csv,
       count(*) AS n_orders
FROM orders
GROUP BY 1
"""


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile summary of the lineitem measures: one output row
    per column with count / nulls / min / max / exact-decimal sum / mean.
    The reshape is Spark's native ``unpivot`` (the melt operator,
    SURVEY.md §2.8 O4) — a narrow 4× row fan-out feeding ONE hash
    aggregate keyed by column name, instead of four separate scans."""
    li = read_testdata(spark, sf_dir, "lineitem")
    long = li.unpivot([], _PROFILE_COLS, "col_name", "value")
    return (
        long.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_nulls"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("mean_value"),
        )
    )


LINEITEM_PROFILE_SQL = """
SELECT col_name, count(*) AS n_rows,
       count(*) FILTER (WHERE value IS NULL) AS n_nulls,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS mean_value
FROM (
  SELECT 'l_quantity' AS col_name, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
GROUP BY col_name
"""


def shipment_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation (shipmode is absent from
    the synthetic schema, so the group key is the ship-latency bucket):
    per latency bucket, how many lineitems belong to urgent/high-priority
    orders vs the rest. lineitem⋈orders shuffles on orderkey; the two
    priority counts are a single aggregate pass (CASE sums, map-side
    partial), never two scans."""
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders")
    lat = F.datediff(F.to_date(li["l_shipdate"]), F.to_date(o["o_orderdate"]))
    bucket = (
        F.when(lat <= 30, "0-30d").when(lat <= 60, "31-60d").otherwise("61d+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(bucket.alias("latency_bucket"), high.alias("_high"))
        .groupBy("latency_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("_high"), 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


SHIPMENT_LATENCY_BUCKETS_SQL = """
SELECT CASE WHEN lat <= 30 THEN '0-30d'
            WHEN lat <= 60 THEN '31-60d'
            ELSE '61d+' END AS latency_bucket,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM (
  SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS lat,
         o_orderpriority
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY 1
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped two-level aggregation: the distribution of
    per-customer order counts, customers with zero orders included (the
    LEFT join is the point — an inner join silently drops the zero
    bucket). First aggregate shuffles on custkey, second on the tiny
    count domain."""
    c = read_testdata(spark, sf_dir, "customer")
    o = read_testdata(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


LARGE_ORDER_MIN_QTY = 250


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds a
    threshold, with their customer. The HAVING runs on the lineitem-side
    aggregate FIRST (one shuffle on orderkey, output shrinks to the few
    qualifying orders), and only that small survivor set joins orders and
    broadcast-customer — never the other way around."""
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders")
    c = read_testdata(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date_str"),
            F.col("o_totalprice").alias("total_price"),
            "total_qty",
        )
    )


LARGE_VOLUME_ORDERS_SQL = f"""
SELECT c_custkey AS customer_key,
       c_name AS customer_name,
       o_orderkey AS order_key,
       o_orderdate AS order_date_str,
       o_totalprice AS total_price,
       total_qty
FROM (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         > {LARGE_ORDER_MIN_QTY}
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped multi-way join: profit per supplier nation per
    order year (the synthetic schema has no partsupp, so part retail
    price × quantity stands in for supply cost). Join order matters at
    scale and is explicit here: lineitem⋈orders is the one big shuffle
    (orderkey); part joins on the lineitem side's partkey (second
    shuffle — partsupp-sized in real TPC-H, bucketable); supplier and
    nation broadcast. Profit accumulates in exact decimal, cast to
    double only at the end."""
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = read_testdata(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = read_testdata(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_testdata(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
        - _dec("p_retailprice") * _dec("l_quantity")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).cast("long").alias("order_year"),
        )
        .agg(profit.cast("double").alias("profit"))
    )


NATION_YEAR_PROFIT_SQL = """
SELECT n_name AS nation,
       year(CAST(o_orderdate AS DATE))::BIGINT AS order_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: revenue shipped between DIFFERENT customer and
    supplier nations, per (supplier nation, customer nation, year).
    Both nation lookups broadcast (joined via supplier/customer keys that
    themselves broadcast at dim scale); the inequality is a residual on
    the already-joined row, never a join condition — so the only wide
    stage is lineitem⋈orders on orderkey plus the final group-by."""
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_testdata(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = read_testdata(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_testdata(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("o_orderdate")).cast("long").alias("trade_year"),
        )
        .agg(revenue.cast("double").alias("revenue"))
    )


NATION_PAIR_TRADE_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(CAST(o_orderdate AS DATE))::BIGINT AS trade_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE s_nationkey <> c_nationkey
GROUP BY 1, 2, 3
"""


def supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct suppliers per part class (brand, type,
    size), EXCLUDING flagged suppliers (negative account balance stands
    in for the complaints subquery). The exclusion is a broadcast LEFT
    ANTI join applied to the supplier side BEFORE the big join — the
    cheapest place to drop rows; the count-distinct shuffles once on the
    part-class key."""
    li = read_testdata(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = read_testdata(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    s = read_testdata(spark, sf_dir, "supplier")
    flagged = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    ok_li = li.join(
        F.broadcast(flagged), li["l_suppkey"] == flagged["s_suppkey"], "left_anti"
    )
    return (
        ok_li.join(p, ok_li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").cast("long").alias("part_size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SUPPLIER_DIVERSITY_SQL = """
SELECT p_brand AS brand,
       p_type AS part_type,
       p_size::BIGINT AS part_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def props_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read discovery over the semi-structured ``props``
    column: per JSON key, how many events carry it, its coverage
    fraction, and a value-shape census (integer-like / numeric-like /
    other by text pattern) — what a catalog crawler reports before
    anyone writes an extraction path against an undocumented JSON
    column. The reference touches JSON only in its control plane
    (secrets/watermark files, SURVEY.md §2.9 F12); this treats it as a
    first-class data-plane discovery operator.

    Shape: parse once to map<string,string> (keys and values surface
    without per-key extraction paths), explode, one hash aggregate per
    key plus a broadcast 1-row total. Explosion is bounded by total
    key instances, and nothing is key-name-specific — the operator
    works on any JSON-object column unchanged.
    """
    events = read_testdata(spark, sf_dir, "events")
    total = events.count()  # control-plane scalar for coverage
    kv = events.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val")
    )
    is_int = F.col("val").rlike(r"^-?[0-9]+$")
    is_num = F.col("val").rlike(r"^-?[0-9]+\.[0-9]+$")
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(is_int.cast("long")).alias("n_integer"),
            F.sum((is_num & ~is_int).cast("long")).alias("n_numeric"),
            F.sum((~is_int & ~is_num).cast("long")).alias("n_other"),
        )
        .select(
            "key",
            "n_present",
            F.round(F.col("n_present").cast("double") / F.lit(float(total)), 6).alias(
                "coverage"
            ),
            "n_integer",
            "n_numeric",
            "n_other",
        )
    )


PROPS_SCHEMA_DISCOVERY_SQL = """
WITH kv AS (
  -- The extraction path QUOTES the key (with \\ and " escaped) so keys
  -- containing '.', '[', or '"' address the literal member instead of
  -- being parsed as path syntax — keeping the oracle aligned with
  -- Spark's map-based parse, which never goes through a path grammar.
  SELECT k.key,
         json_extract_string(
           props,
           '$."' || replace(replace(k.key, '\\', '\\\\'), '"', '\\"') || '"'
         ) AS val
  FROM (SELECT props, unnest(json_keys(props)) AS key FROM events)
    AS k(props, key)
), n AS (SELECT count(*) AS total FROM events)
SELECT key,
       count(*)::BIGINT AS n_present,
       round(count(*)::DOUBLE / n.total, 6) AS coverage,
       sum(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 1 ELSE 0 END)::BIGINT
         AS n_integer,
       sum(CASE WHEN regexp_matches(val, '^-?[0-9]+\\.[0-9]+$')
                 AND NOT regexp_matches(val, '^-?[0-9]+$')
            THEN 1 ELSE 0 END)::BIGINT AS n_numeric,
       sum(CASE WHEN NOT regexp_matches(val, '^-?[0-9]+$')
                 AND NOT regexp_matches(val, '^-?[0-9]+\\.[0-9]+$')
            THEN 1 ELSE 0 END)::BIGINT AS n_other
FROM kv, n
GROUP BY key, n.total
"""
