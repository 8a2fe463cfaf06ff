"""Exact-baseline size guard: refuses oversized inputs, names the scale
path, and is raisable only by explicit conf."""

import pytest

from de_final_project_spark.operators.guards import (
    MAX_ROWS_CONF,
    ExactBaselineTooLarge,
    guard_exact_baseline,
)

SF_DIR = "/root/testdata/sf0.001"


def test_guard_passes_small_input(spark):
    df = spark.range(100)
    assert guard_exact_baseline(df, "op", "scale_op") is df


def test_guard_raises_over_threshold(spark):
    old = spark.conf.get(MAX_ROWS_CONF, None)
    spark.conf.set(MAX_ROWS_CONF, "50")
    try:
        with pytest.raises(ExactBaselineTooLarge) as e:
            guard_exact_baseline(spark.range(100), "knn_bruteforce", "ivf_knn")
        assert "ivf_knn" in str(e.value)
        assert MAX_ROWS_CONF in str(e.value)
    finally:
        spark.conf.unset(MAX_ROWS_CONF)
        if old is not None:
            spark.conf.set(MAX_ROWS_CONF, old)


def test_guarded_operators_refuse_when_limit_lowered(spark):
    from de_final_project_spark.operators.neardup import (
        simhash_neardup_pairs_allpairs,
    )
    from de_final_project_spark.operators.similarity import (
        embedding_neardup_exact,
        knn_bruteforce,
    )

    spark.conf.set(MAX_ROWS_CONF, "10")
    try:
        for op in (knn_bruteforce, embedding_neardup_exact,
                   simhash_neardup_pairs_allpairs):
            with pytest.raises(ExactBaselineTooLarge):
                op(spark, SF_DIR)
    finally:
        spark.conf.unset(MAX_ROWS_CONF)


def test_guarded_operators_run_at_default_limit(spark):
    from de_final_project_spark.operators.similarity import knn_bruteforce

    assert knn_bruteforce(spark, SF_DIR).count() > 0


def test_embedding_quantize_contract(spark):
    """Codes bounded by int8, reconstruction nearly angle-preserving, and
    sum_q matches an independent numpy recompute."""
    import numpy as np

    from de_final_project_spark.operators.similarity import embedding_quantize
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    out = {r.vec_id: r for r in embedding_quantize(spark, sf).collect()}
    src = read_testdata(spark, sf, "embeddings").collect()
    assert len(out) == len(src)
    for row in src[:50]:
        v = np.asarray(row.embedding, dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        q = np.zeros_like(v) if scale == 0 else np.floor(np.abs(v / scale) + 0.5) * np.sign(v)
        assert np.abs(q).max() <= 127
        got = out[row.vec_id]
        assert got.sum_q == int(q.sum())
        assert got.recon_cosine is None or got.recon_cosine > 0.99


def test_pq_codes_contract(spark):
    """Every vector yields exactly PQ_M rows; codes stay within the
    codebook; errors are non-negative; codebook-seed vectors (vec_id <
    PQ_K) reconstruct themselves exactly (their own subvector is a
    centroid, so the nearest distance is 0)."""
    from pyspark.sql import functions as F

    from de_final_project_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_codes,
    )

    codes = pq_codes(spark, "/root/testdata/sf0.001").cache()
    n_vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert codes.count() == n_vecs * PQ_M
    assert (
        codes.where(
            (F.col("code") < 0)
            | (F.col("code") >= PQ_K)
            | (F.col("sub_id") < 0)
            | (F.col("sub_id") >= PQ_M)
            | (F.col("sub_sq_err") < 0)
        ).count()
        == 0
    )
    seeds = codes.where(F.col("vec_id") < PQ_K)
    assert seeds.where(F.col("sub_sq_err") != 0.0).count() == 0
    codes.unpersist()
