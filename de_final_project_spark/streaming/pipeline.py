"""Event-driven bronze→gold hop as a checkpointed stream.

The reference chains its stages with an S3 ObjectCreated notification
(terraform/warehouse_role.tf:51-62 → warehousing lambda) and tracks
progress in a hand-rolled watermark JSON. Spark's native form of the same
contract: a file-source ``readStream`` over the bronze lake (new batch
directories are discovered automatically), ``foreachBatch`` building and
appending the incremental fact, and the streaming checkpoint providing
exactly-once file-level progress — the watermark file, for free, with
recovery semantics the reference lacks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.plans.facts import make_fact_sales_order_stable
from de_final_project_spark.plans.rebuild import INCREMENTAL_SALES_FACT
from de_final_project_spark.schemas import SOURCE_SCHEMAS


def _append_batch(gold_dir: str):
    gold_path = os.path.join(gold_dir, INCREMENTAL_SALES_FACT)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if "batch_ts" in batch_df.columns:
            batch_df = batch_df.withColumn("_batch_ts", F.col("batch_ts").cast("string"))
        fact = make_fact_sales_order_stable(batch_df)
        if os.path.exists(gold_path):
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

    return process


def stream_sales_to_gold(
    spark: SparkSession, lake_dir: str, gold_dir: str, checkpoint_dir: str
) -> None:
    """Drain every unprocessed bronze sales_order batch into the
    incremental gold fact (Trigger.AvailableNow). Re-running with the
    same checkpoint processes only batches ingested since the last run —
    the reference's 20-minute cycle without the hand-rolled state file."""
    src = os.path.join(lake_dir, "sales_order")
    raw = (
        spark.readStream.schema(SOURCE_SCHEMAS["sales_order"])
        .option("header", "true")
        .option("basePath", src)
        .csv(os.path.join(src, "batch_ts=*"))
    )
    q = (
        raw.writeStream.foreachBatch(_append_batch(gold_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
