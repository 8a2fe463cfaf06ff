"""Filtered ANN (similarity.filtered_ann_knn): the pre-filter vs
post-filter trade, measured — and recall vs the filtered brute-force
truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators import similarity as sim
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    emb = read_testdata(spark, SF_DIR, "embeddings")
    keep = emb.where(F.expr(sim.FILTERED_ANN_PREDICATE)).select(
        "vec_id", "embedding"
    )
    pre = sim.filtered_ann_knn(spark, SF_DIR).collect()
    return emb, keep, pre


def test_results_satisfy_the_predicate(spark, frames):
    emb, keep, pre = frames
    allowed = {r.vec_id for r in keep.collect()}
    assert pre and all(r.neighbor_id in allowed for r in pre)


def test_prefilter_beats_postfilter(spark, frames):
    """Post-filtering an unfiltered IVF top-k under-fills k; the
    pre-filter path returns at least as many (and here strictly more)
    predicate-satisfying neighbors."""
    emb, keep, pre = frames
    unfiltered = sim.ivf_knn_trained(spark, SF_DIR)
    allowed = {r.vec_id for r in keep.collect()}
    post = [r for r in unfiltered.collect() if r.neighbor_id in allowed]
    assert len(pre) >= len(post)
    # the trade is real on this corpus, not vacuously equal
    assert len(pre) > len(post)


def test_recall_vs_filtered_bruteforce(spark, frames):
    """Recall@k against the exact top-k over the FILTERED corpus —
    queries drawn from the full corpus, as in the operator.

    Floor = parity with the UNFILTERED trained-IVF tier (measured 0.80
    mean recall@5 at nprobe 2/8 on this corpus, similarity.py): the
    selectivity-scaled probe budget makes the filter recall-neutral
    (fixed-nprobe measured 0.68 before the scaling). Raising recall
    further is the probe budget's job, not the filter's."""
    from pyspark.sql import Window

    emb, keep, pre = frames
    queries = emb.where(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from de_final_project_spark.functions.vector import cosine

    pairs = (
        keep.select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("query_vec"), F.col("embedding")), 6
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= sim.TOP_K)
        .collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in pre}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.78, recall
