"""SemDeDup cluster-then-prune: keep-rule semantics, coverage, and the
degenerate-cluster guard (the oracle twin pins exact values)."""

from __future__ import annotations

import math

import pytest
import pyspark.sql.functions as F

from de_final_project_spark.operators import semdedup as sd
from de_final_project_spark.operators.kmeans import _assign, train_kmeans
from de_final_project_spark.operators.similarity import unit_vectors
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"


def test_verdict_covers_corpus_once_and_keeps_canonical(spark):
    out = sd.semantic_dedup(spark, SF_DIR).cache()
    n = read_testdata(spark, SF_DIR, "embeddings").count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    # the smallest vec_id of every cluster can have no smaller-id
    # neighbor, so it is always kept
    firsts = out.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    assert (
        out.join(firsts, ["cluster", "vec_id"]).where(~F.col("kept")).count()
        == 0
    )
    assert out.where(~F.col("kept")).count() > 0  # threshold bites
    out.unpersist()


def test_keep_rule_matches_brute_force(spark):
    """Replay the rule driver-side: dropped iff a smaller-id
    same-cluster vector scores >= threshold."""
    qdf, centroids = train_kmeans(spark, SF_DIR)
    cl = {
        r["vec_id"]: r["cluster"]
        for r in _assign(qdf, centroids).collect()
    }
    uv = {
        r["vec_id"]: r["u"]
        for r in unit_vectors(
            read_testdata(spark, SF_DIR, "embeddings")
        ).collect()
    }
    got = {
        r["vec_id"]: r["kept"]
        for r in sd.semantic_dedup(spark, SF_DIR).collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for vid, c in cl.items():
        by_cluster.setdefault(c, []).append(vid)
    for c, vids in by_cluster.items():
        vids.sort()
        for i, b in enumerate(vids):
            dropped = any(
                round(sum(x * y for x, y in zip(uv[a], uv[b])), 6)
                >= sd.SEMDEDUP_COSINE_THRESHOLD
                for a in vids[:i]
            )
            assert got[b] == (not dropped), (c, b)


def test_report_consistent_with_verdict(spark):
    verdict = sd.semantic_dedup(spark, SF_DIR)
    rep = {r["cluster"]: r for r in sd.semantic_dedup_report(spark, SF_DIR).collect()}
    agg = {
        r["cluster"]: r
        for r in verdict.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
        .collect()
    }
    assert set(rep) == set(agg)
    for c, r in rep.items():
        assert (r["size"], r["n_kept"]) == (agg[c]["size"], agg[c]["n_kept"])
        assert math.isclose(
            r["drop_share"], (r["size"] - r["n_kept"]) / r["size"]
        )


def test_degenerate_cluster_guard(spark):
    spark.conf.set(sd.MAX_CLUSTER_CONF, "10")
    try:
        with pytest.raises(ValueError, match="quadratic"):
            sd.semantic_dedup(spark, SF_DIR)
    finally:
        spark.conf.unset(sd.MAX_CLUSTER_CONF)
