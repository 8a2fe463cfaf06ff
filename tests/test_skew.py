"""Salted aggregation/join equivalence: skew mitigation must never change
results — only shuffle distribution."""

import pyspark.sql.functions as F

from de_final_project_spark.operators.skew import (
    SALT_COL,
    replicate_small_for_salted_join,
    salted_agg,
    with_salt,
)


def _skewed(spark):
    # 10k rows on one hot key + a tail of 100 cold keys.
    return spark.range(10100).select(
        F.when(F.col("id") < 10000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["cnt"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        r["k"]: (r["cnt"], r["total"])
        for r in salted_agg(
            df,
            keys=["k"],
            partial_aggs={"cnt": F.count(F.lit(1)), "total": F.sum("v")},
            merge_aggs={"cnt": F.sum("cnt"), "total": F.sum("total")},
            salt_from=["id"],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salt_is_deterministic_and_bounded(spark):
    df = with_salt(_skewed(spark), ["id"], 8)
    a = sorted(r[SALT_COL] for r in df.collect())
    b = sorted(r[SALT_COL] for r in df.collect())  # recompute -> same salts
    assert a == b
    assert set(a) <= set(range(8))
    # The hot key actually spreads across salts.
    spread = df.where(F.col("k") == "hot").select(SALT_COL).distinct().count()
    assert spread == 8


def test_salted_join_matches_plain_join(spark):
    big = with_salt(_skewed(spark), ["id"], 4)
    small = spark.createDataFrame(
        [("hot", 1.5), ("k3", 2.0)], "k string, factor double"
    )
    plain = (
        _skewed(spark).join(small, "k").groupBy("k")
        .agg(F.sum(F.col("v") * F.col("factor")).alias("s"))
    )
    salted = (
        big.join(F.broadcast(replicate_small_for_salted_join(small, 4)), ["k", SALT_COL])
        .groupBy("k")
        .agg(F.sum(F.col("v") * F.col("factor")).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
