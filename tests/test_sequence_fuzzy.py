"""event_transition_matrix and similar_part_names invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from de_final_project_spark.plans.setops import LEVENSHTEIN_MAX, similar_part_names
from de_final_project_spark.plans.temporal import event_transition_matrix

SF_DIR = "/root/testdata/sf0.001"


def test_transition_rows_normalize(spark):
    out = event_transition_matrix(spark, SF_DIR)
    rows = out.groupBy("from_type").agg(
        F.sum("p_transition").alias("p"), F.sum("n_transitions").alias("n")
    )
    # probabilities per source state sum to 1 (rounding slack 1e-4)
    assert rows.where(F.abs(F.col("p") - 1.0) > 1e-4).count() == 0
    # transition count conservation: total transitions = events - users
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events, n_users = ev.count(), ev.select("user_id").distinct().count()
    assert out.agg(F.sum("n_transitions")).first()[0] == n_events - n_users


def test_similar_names_blocked_and_bounded(spark):
    out = similar_part_names(spark, SF_DIR).cache()
    assert out.where(F.col("a_key") >= F.col("b_key")).count() == 0
    assert out.where(F.col("name_dist") > LEVENSHTEIN_MAX).count() == 0
    # block discipline: every pair shares the brand
    p = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_partkey", "p_brand")
    joined = (
        out.join(p, out["a_key"] == p["p_partkey"])
        .withColumnRenamed("p_brand", "a_brand")
        .drop("p_partkey")
        .join(p, F.col("b_key") == p["p_partkey"])
    )
    assert joined.where(F.col("a_brand") != F.col("p_brand")).count() == 0
    assert joined.where(F.col("a_brand") != F.col("brand")).count() == 0


def test_scd2_intervals_partition_timeline(spark):
    from de_final_project_spark.plans.temporal import user_value_scd2

    out = user_value_scd2(spark, SF_DIR).cache()
    # exactly one open (current) version per user
    opens = out.where("is_current").groupBy("user_id").count()
    assert opens.where("count <> 1").count() == 0
    # intervals are non-overlapping and contiguous: valid_to of version v
    # equals valid_from of version v+1
    a = out.select("user_id", "version", "valid_to")
    b = out.select(
        F.col("user_id").alias("u2"),
        (F.col("version") - 1).alias("v2"),
        F.col("valid_from").alias("next_from"),
    )
    j = a.join(b, (a["user_id"] == b["u2"]) & (a["version"] == b["v2"]))
    assert j.where(F.col("valid_to") != F.col("next_from")).count() == 0


def test_fulfillment_snapshot_invariants(spark):
    from de_final_project_spark.plans.temporal import order_fulfillment_snapshot

    out = order_fulfillment_snapshot(spark, SF_DIR).cache()
    assert out.where("first_ship_date > last_ship_date").count() == 0
    assert out.where("n_late_lines > n_lines").count() == 0
    assert out.where("late_fraction < 0 OR late_fraction > 1").count() == 0
    # one snapshot row per order that has lines
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert out.count() == li.select("l_orderkey").distinct().count()


def test_ltv_cumulative_monotone(spark):
    from de_final_project_spark.plans.temporal import customer_ltv_cohort

    out = customer_ltv_cohort(spark, SF_DIR).orderBy("cohort_month", "months_since")
    last = {}
    for r in out.collect():
        k = r["cohort_month"]
        if k in last:
            assert r["cum_ltv_per_customer"] >= last[k] - 1e-9
        last[k] = r["cum_ltv_per_customer"]
        assert r["months_since"] >= 0


def test_rfm_quartiles_balanced(spark):
    from de_final_project_spark.plans.temporal import customer_rfm_segments

    out = customer_rfm_segments(spark, SF_DIR).cache()
    n = out.count()
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = {r[col]: r["count"] for r in out.groupBy(col).count().collect()}
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
    assert out.where("length(segment) <> 3").count() == 0


def test_ntile_closed_form_matches_window(spark):
    """ntile_from_rank must reproduce F.ntile bit-for-bit for every
    (n, k) shape — including n < k, n divisible by k, and ragged
    remainders — since the de-funneled RFM/value-tiles plans rely on
    the closed form being exact."""
    from pyspark.sql import Window

    from de_final_project_spark.operators.surrogate import ntile_from_rank

    for n, k in [(1, 4), (3, 4), (4, 4), (5, 4), (17, 4), (100, 7), (2, 10)]:
        df = spark.range(1, n + 1).withColumnRenamed("id", "r")
        w = Window.orderBy("r")
        got = (
            df.select(
                "r",
                F.ntile(k).over(w).cast("long").alias("want"),
                ntile_from_rank(F.col("r"), F.lit(n), k).cast("long").alias("got"),
            )
            .where(F.col("want") != F.col("got"))
            .count()
        )
        assert got == 0, f"ntile mismatch at n={n}, k={k}"
