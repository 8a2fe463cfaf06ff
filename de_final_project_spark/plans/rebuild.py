"""Incremental ingest + change-driven rebuild DAG.

The reference's three Lambda hops (SURVEY.md §3): ingest extracts only
rows past each table's high watermark into the CSV lake, the transform
stage rebuilds exactly the dims/facts whose sources changed, facts always
recompute over the FULL accumulated lake (reference
src/ingestion_lambda.py:203-246, src/process_lambda.py:439-490). Here the
three process boundaries collapse into one Spark job; the rebuild rules
are preserved:

- a dim rebuilds when any of its source tables changed
  (dim_staff on staff OR department, src/process_lambda.py:459);
- dim_date and the three facts rebuild when ANY fact source changed
  (src/process_lambda.py:464-474);
- unchanged tables are skipped entirely (src/ingestion_lambda.py:218-225).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.plans import dims as D
from de_final_project_spark.plans import facts as Ft
from de_final_project_spark.sources.readers import read_ingest_table
from de_final_project_spark.sources.sinks import write_csv_batch, write_parquet_overwrite
from de_final_project_spark.sources.watermark import WatermarkStore

# dim -> source tables (reference src/process_lambda.py:449-462)
DIM_SOURCES: dict[str, list[str]] = {
    "dim_location": ["address"],
    "dim_counterparty": ["counterparty", "address"],
    "dim_currency": ["currency"],
    "dim_design": ["design"],
    "dim_payment_type": ["payment_type"],
    "dim_staff": ["staff", "department"],
    "dim_transaction": ["transaction"],
}

FACT_SOURCES = ("payment", "purchase_order", "sales_order")


def ingest_cycle(
    source_tables: dict[str, DataFrame],
    lake_dir: str,
    store: WatermarkStore,
    batch_ts: str,
) -> list[str]:
    """One ingest cycle: per table, extract rows past the watermark into a
    new bronze batch and advance the watermark. Returns changed tables.

    The watermark probe and delta filter both push down to the source
    (max aggregate + timestamp predicate — S2/P3)."""
    changed: list[str] = []
    for table, df in source_tables.items():
        cutoff = store.get(table)
        delta = df.filter(F.col("last_updated") > F.lit(cutoff).cast("timestamp"))
        probe = delta.agg(F.max("last_updated").alias("mx")).collect()[0].mx
        if probe is None:
            continue  # update-gating predicate P4: nothing new, skip
        write_csv_batch(delta, lake_dir, table, batch_ts)
        store.advance(table, probe.strftime("%Y-%m-%d %H:%M:%S.%f"))
        changed.append(table)
    store.persist()
    return changed


def rebuild(
    spark: SparkSession,
    lake_dir: str,
    gold_dir: str,
    updates: Iterable[str],
) -> list[str]:
    """Change-driven star rebuild over the full accumulated lake.

    Returns the list of gold tables written."""
    updates = set(updates)
    read = lambda t: read_ingest_table(spark, lake_dir, t)  # noqa: E731
    written: list[str] = []

    def emit(name: str, df: DataFrame) -> None:
        write_parquet_overwrite(df, gold_dir, name)
        written.append(name)

    if "address" in updates:
        emit("dim_location", D.make_dim_location(read("address")))
    if updates & {"counterparty", "address"}:
        emit(
            "dim_counterparty",
            D.make_dim_counterparty(read("counterparty"), read("address")),
        )
    if "currency" in updates:
        emit("dim_currency", D.make_dim_currency(read("currency")))
    if "design" in updates:
        emit("dim_design", D.make_dim_design(read("design")))
    if "payment_type" in updates:
        emit("dim_payment_type", D.make_dim_payment_type(read("payment_type")))
    if updates & {"staff", "department"}:
        emit("dim_staff", D.make_dim_staff(read("staff"), read("department")))
    if "transaction" in updates:
        emit("dim_transaction", D.make_dim_transaction(read("transaction")))

    if updates & set(FACT_SOURCES):
        payment, purchase, sales = (read(t) for t in FACT_SOURCES)
        dim_date = D.make_dim_date(payment, purchase, sales, keep_date=True)
        emit("dim_date", dim_date.drop("date"))
        emit("fact_payment", Ft.make_fact_payment(payment, dim_date))
        emit("fact_purchase_order", Ft.make_fact_purchase_order(purchase, dim_date))
        emit("fact_sales_order", Ft.make_fact_sales_order(sales, dim_date))
    return written


def run_pipeline(
    spark: SparkSession,
    source_tables: dict[str, DataFrame],
    lake_dir: str,
    gold_dir: str,
    store: WatermarkStore,
    batch_ts: str,
) -> list[str]:
    """Full cycle: incremental ingest -> conditional rebuild -> gold."""
    changed = ingest_cycle(source_tables, lake_dir, store, batch_ts)
    if not changed:
        return []
    return rebuild(spark, lake_dir, gold_dir, changed)


# ----------------------------------------------------------------------
# Extension: append-only incremental fact processing.
#
# The reference recomputes every fact over the FULL accumulated lake on
# each cycle (src/process_lambda.py:464-474) — O(history) work per
# 20-minute batch, the single worst scaling property it has. With stable
# functional date keys (facts.stable_date_key) a fact batch depends only
# on its own rows, so the engine can build just the delta and append:
# O(batch) work per cycle regardless of history size.
# ----------------------------------------------------------------------

INCREMENTAL_SALES_FACT = "fact_sales_order_incremental"


def append_sales_fact_increment(
    spark: SparkSession, lake_dir: str, gold_dir: str, batch_ts: str
) -> int:
    """Build fact rows for ONE bronze batch and append them to the
    incremental gold fact with record ids continuing from the current
    maximum. Returns rows appended.

    The bronze read prunes to the batch partition (a metadata operation
    under the ``batch_ts=`` layout); the build is join-free; the id
    offset probe is an O(1) max over the gold footer stats. Keep-latest
    applies within the batch — cross-batch supersedes are a warehouse
    MERGE concern, out of scope for the reference's append-only lake.
    """
    import os as _os

    from de_final_project_spark.plans.facts import make_fact_sales_order_stable

    delta = read_ingest_table(spark, lake_dir, "sales_order").where(
        F.col("_batch_ts") == batch_ts
    )
    fact = make_fact_sales_order_stable(delta)

    gold_path = _os.path.join(gold_dir, INCREMENTAL_SALES_FACT)
    if _os.path.exists(gold_path):
        offset = (
            spark.read.parquet(gold_path)
            .agg(F.max("sales_record_id").alias("mx"))
            .collect()[0]
            .mx
            or 0
        )
    else:
        offset = 0

    from de_final_project_spark.operators.surrogate import add_sequence_key

    keyed = add_sequence_key(fact, "sales_record_id", fact.columns).withColumn(
        "sales_record_id", (F.col("sales_record_id") + F.lit(offset)).cast("long")
    )
    keyed.write.mode("append").parquet(gold_path)
    return keyed.count()


def incremental_hourly_rollup(spark, sf_dir: str):
    """Incremental aggregate maintenance: the hour x event_type rollup
    maintained as MERGEABLE PARTIAL AGGREGATES instead of a full
    recompute. The base partial (events at or below the id-midpoint
    cut) and the delta partial (the rest) each aggregate independently;
    merging is a second aggregate over the union of partials — sum of
    counts, sum of exact-decimal sums, min of mins, max of maxes. This
    is the algebraic-aggregate contract that makes 20-minute incremental
    refreshes (the reference's cadence, SURVEY.md §2.10) O(delta) plus
    O(groups) instead of O(history): only the partial state, never the
    raw history, is touched at merge time. The oracle aggregates the
    whole table flat — equality IS the claim that partial-merge loses
    nothing. (Non-algebraic stats like exact distinct users are
    deliberately absent: they do not merge; the KMV sketch twin is the
    bounded-state alternative.)

    Shape: two filtered scans -> two hash aggregates -> a union whose
    second aggregate sees at most 2x|groups| rows. No joins, no windows.
    """
    from de_final_project_spark.sources.readers import read_testdata

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id",
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("_v"),
    )
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    cut = (lo + hi) // 2

    def partial(df):
        return df.groupBy("hour", "event_type").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_v").alias("_s"),
            F.min("_v").alias("_mn"),
            F.max("_v").alias("_mx"),
        )

    base = partial(ev.where(F.col("event_id") <= cut))
    delta = partial(ev.where(F.col("event_id") > cut))
    return (
        base.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_s").alias("_sum"),
            F.min("_mn").alias("_min"),
            F.max("_mx").alias("_max"),
        )
        .select(
            "hour",
            "event_type",
            "n_events",
            F.col("_sum").cast("double").alias("sum_value"),
            F.col("_min").cast("double").alias("min_value"),
            F.col("_max").cast("double").alias("max_value"),
        )
    )


INCREMENTAL_HOURLY_ROLLUP_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       CAST(min(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS min_value,
       CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY 1, 2
"""
