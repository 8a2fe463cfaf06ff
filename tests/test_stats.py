"""plans/stats.py invariants: the exact-moment formulations agree with
the float built-ins to tolerance, and TWA stays inside the value hull."""

from __future__ import annotations

import pyspark.sql.functions as F

from de_final_project_spark.plans import stats
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"


def test_twa_within_value_hull(spark):
    out = stats.user_time_weighted_value(spark, SF_DIR)
    ev = read_testdata(spark, SF_DIR, "events")
    hull = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    # LOCF weighting can't leave the convex hull of observed values
    # (the last observation carries no weight, hence >= min / <= max).
    bad = out.join(hull, "user_id").where(
        (F.col("tw_avg_value") < F.col("lo") - 1e-6)
        | (F.col("tw_avg_value") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0
    assert out.where("span_s <= 0").count() == 0


def test_corr_matches_builtin_and_bounded(spark):
    out = stats.brand_price_quantity_corr(spark, SF_DIR)
    assert out.where("corr_qty_price < -1 OR corr_qty_price > 1").count() == 0
    li = read_testdata(spark, SF_DIR, "lineitem")
    p = read_testdata(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    builtin = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
    )
    joined = out.join(builtin, "brand").where(
        F.abs(F.col("corr_qty_price") - F.col("c")) > 1e-6
    )
    assert joined.count() == 0


def test_bloom_semijoin_no_false_negatives(spark):
    """Bloom pass count dominates the true match count per priority
    (no false negatives), false positives are consistent, and the FP
    rate stays well under 1 at this filter load."""
    from pyspark.sql import functions as F

    from de_final_project_spark.operators.sketches import bloom_semijoin_prune

    rep = bloom_semijoin_prune(spark, "/root/testdata/sf0.001").cache()
    assert rep.count() == 5
    bad = rep.where(
        (F.col("n_bloom_pass") < F.col("n_true_match"))
        | (F.col("n_false_pos") != F.col("n_bloom_pass") - F.col("n_true_match"))
        | (F.col("fp_rate") < 0)
        | (F.col("fp_rate") >= 1)
    )
    assert bad.count() == 0
    rep.unpersist()


def test_table_profile_single_pass_and_sane(spark):
    """One row per profiled column; n_rows constant; nulls bounded by
    rows; the min string never exceeds the max in the native order."""
    from pyspark.sql import functions as F

    from de_final_project_spark.plans.stats import PROFILE_COLS, table_profile

    prof = table_profile(spark, "/root/testdata/sf0.001").cache()
    rows = {r.col_name: r for r in prof.collect()}
    assert set(rows) == {c for c, _ in PROFILE_COLS}
    n = next(iter(rows.values())).n_rows
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
    # o_orderkey is a unique key in the synthetic orders table
    assert rows["o_orderkey"].n_distinct == n
    # exactly two scans of orders (basic-stats pass + distinct pass),
    # independent of how many columns are profiled; use an uncached
    # instance so InMemoryRelation doesn't distort the plan string
    fresh = table_profile(spark, "/root/testdata/sf0.001")
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.split("== Initial Plan ==")[0].count("FileScan parquet") == 2
    prof.unpersist()


def test_contingency_marginals_and_expected_mass(spark):
    """Observed and expected both sum to N (the independence model
    preserves total mass); every chi2 term is non-negative."""
    from pyspark.sql import functions as F

    from de_final_project_spark.plans.stats import segment_nation_contingency
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    cells = segment_nation_contingency(spark, sf).cache()
    n = read_testdata(spark, sf, "customer").count()
    tot = cells.agg(F.sum("observed"), F.sum("expected")).first()
    assert tot[0] == n
    assert abs(tot[1] - n) < 0.01  # expected sums to N up to rounding
    assert cells.where(F.col("chi2_term") < 0).count() == 0
    cells.unpersist()


def test_degree_histogram_buckets_partition_degrees(spark):
    """Bucket boundaries hold (2^b <= min <= max < 2^(b+1)) and part
    counts sum to the number of graph nodes."""
    from pyspark.sql import functions as F

    from de_final_project_spark.operators.corpusops import (
        copurchase_degree_histogram,
        copurchase_edges,
    )

    sf = "/root/testdata/sf0.001"
    h = copurchase_degree_histogram(spark, sf).cache()
    bad = h.where(
        (F.col("min_degree") < F.col("bucket_lo"))
        | (F.col("max_degree") >= 2 * F.col("bucket_lo"))
    )
    assert bad.count() == 0
    n_nodes = (
        copurchase_edges(spark, sf).select("src").distinct().count()
    )
    assert h.agg(F.sum("n_parts")).first()[0] == n_nodes
    h.unpersist()
