"""MV query rewrite (operators/mvrewrite.py): the soundness rules.

The driver twin proves the happy path (month-from-day roll-up equals the
base-table answer); these pin the REJECTIONS — every unsound rewrite must
raise RewriteError, never return a wrong frame — plus avg's decomposition
(sum/count fold, not avg-of-avg).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators.mvrewrite import (
    AggRequest,
    MVDef,
    RewriteError,
    rewrite_aggregate,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def base(spark):
    # uneven group sizes + a null: the cases where naive rewrites break
    rows = [
        ("a", "x", 10.0),
        ("a", "x", 20.0),
        ("a", "y", 30.0),
        ("b", "x", None),
        ("b", "x", 5.0),
    ]
    return spark.createDataFrame(rows, "g string, h string, v double").cache()


@pytest.fixture(scope="module")
def mv(base):
    return base.groupBy("g", "h").agg(
        F.sum("v").alias("sum_v"),
        F.count("v").alias("n_v"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


MVDEF = MVDef(
    group_by=("g", "h"),
    aggs={
        "sum_v": ("sum", "v"),
        "n_v": ("count", "v"),
        "n_rows": ("count", None),
        "min_v": ("min", "v"),
        "max_v": ("max", "v"),
    },
)


def test_rollup_matches_base(base, mv):
    req = AggRequest(
        group_exprs={"g": "g"},
        aggs=(
            ("sum", "v", "s"),
            ("count", None, "n"),
            ("count", "v", "nv"),
            ("avg", "v", "a"),
            ("min", "v", "lo"),
            ("max", "v", "hi"),
        ),
    )
    got = {
        r.g: r.asDict() for r in rewrite_aggregate(mv, MVDEF, req).collect()
    }
    want = {
        r.g: r.asDict()
        for r in base.groupBy("g")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("nv"),
            F.round(F.avg("v"), 6).alias("a"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_avg_is_not_avg_of_avg(base, mv):
    """Group 'a' has sizes 2 and 1 at (g,h) grain — avg-of-avg would give
    (15+30)/2 = 22.5; the correct fold gives 60/3 = 20."""
    req = AggRequest(group_exprs={"g": "g"}, aggs=(("avg", "v", "a"),))
    rows = {r.g: r.a for r in rewrite_aggregate(mv, MVDEF, req).collect()}
    assert rows["a"] == 20.0
    assert rows["b"] == 5.0  # null excluded from both sum and count


def test_group_expr_outside_mv_keys_rejected(mv):
    req = AggRequest(
        group_exprs={"k": "substring(CAST(sum_v AS STRING), 1, 1)"},
        aggs=(("count", None, "n"),),
    )
    with pytest.raises(RewriteError, match="group keys"):
        rewrite_aggregate(mv, MVDEF, req)


def test_missing_partial_rejected(mv):
    mvdef = MVDef(group_by=("g", "h"), aggs={"sum_v": ("sum", "v")})
    with pytest.raises(RewriteError, match="needs a stored"):
        rewrite_aggregate(
            mv.select("g", "h", "sum_v"),
            mvdef,
            AggRequest(group_exprs={"g": "g"}, aggs=(("min", "v", "lo"),)),
        )


def test_avg_without_nonnull_count_rejected(mv):
    """count(*) stored but count(v) not: avg(v) must refuse — dividing by
    row count would be wrong with nulls present."""
    mvdef = MVDef(
        group_by=("g", "h"),
        aggs={"sum_v": ("sum", "v"), "n_rows": ("count", None)},
    )
    with pytest.raises(RewriteError, match="avg"):
        rewrite_aggregate(
            mv.select("g", "h", "sum_v", "n_rows"),
            mvdef,
            AggRequest(group_exprs={"g": "g"}, aggs=(("avg", "v", "a"),)),
        )


def test_non_decomposable_kind_rejected(mv):
    with pytest.raises(RewriteError, match="not decomposable"):
        rewrite_aggregate(
            mv,
            MVDEF,
            AggRequest(
                group_exprs={"g": "g"},
                aggs=(("count_distinct", "v", "d"),),
            ),
        )


def test_plan_scans_only_the_mv(spark):
    """The rewritten month query's physical plan reads the orders scan
    once (to build the MV in this self-contained query) and contains a
    single aggregate pair over it — no second base-table pass."""
    from de_final_project_spark.operators.mvrewrite import mv_rewrite_rollup

    import contextlib
    import io

    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mv_rewrite_rollup(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    # formatted plans print each node once in the tree and once in the
    # numbered detail section — count the detail nodes
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan
