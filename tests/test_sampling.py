"""Hash-based sampling: split assignment must be a pure function of the
id — invariant under repartitioning and corpus growth."""

import pyspark.sql.functions as F

from de_final_project_spark.operators.sampling import dataset_splits, hash_bucket

SF_DIR = "/root/testdata/sf0.001"


def test_split_stable_under_repartition(spark):
    df = spark.range(2000).select(F.col("id"))
    a = {r["id"]: r["b"] for r in df.select("id", hash_bucket("id").alias("b")).collect()}
    b = {
        r["id"]: r["b"]
        for r in df.repartition(17).select("id", hash_bucket("id").alias("b")).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(100))


def test_split_proportions_and_stability_on_growth(spark):
    out = {r["doc_id"]: r["split"] for r in dataset_splits(spark, SF_DIR).collect()}
    n = len(out)
    train = sum(1 for s in out.values() if s == "train")
    # hash buckets approximate 80/10/10; allow generous tolerance at n=50
    assert 0.6 * n <= train <= 0.95 * n
    # growing the corpus must not move existing docs between splits:
    # the split is id-derived, so recomputing on a subset agrees.
    sub = {
        r["doc_id"]: r["split"]
        for r in dataset_splits(spark, SF_DIR).where(F.col("doc_id") < 20).collect()
    }
    assert all(out[k] == v for k, v in sub.items())


def test_stratified_sample_exact_proportions(spark):
    import math

    import pyspark.sql.functions as F

    from de_final_project_spark.operators.sampling import (
        STRATIFIED_FRAC_PCT,
        stratified_sample,
    )
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    docs = read_testdata(spark, sf, "documents")
    sizes = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        (r["lang"], r["source"]): r["n"]
        for r in stratified_sample(spark, sf)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(sizes)  # every stratum represented
    for k, n in sizes.items():
        assert got[k] == math.ceil(n * STRATIFIED_FRAC_PCT / 100)

    # determinism: same membership on re-run
    a = {r["doc_id"] for r in stratified_sample(spark, sf).collect()}
    b = {r["doc_id"] for r in stratified_sample(spark, sf).collect()}
    assert a == b


def test_mixture_resample_hits_target_in_expectation(spark):
    """Copy counts are floor(w) or floor(w)+1; expected corpus share per
    language after resampling approximates TARGET_MIX (exact only in
    expectation, so allow generous tolerance at this corpus size); zero
    weight drops every doc of that language."""
    from pyspark.sql import functions as F

    from de_final_project_spark.operators.corpusops import TARGET_MIX
    from de_final_project_spark.operators.sampling import mixture_resample

    rs = mixture_resample(spark, "/root/testdata/sf0.001").cache()
    bad = rs.where(
        (F.col("n_copies") < F.floor("sample_weight"))
        | (F.col("n_copies") > F.floor("sample_weight") + 1)
        | ((F.col("sample_weight") == 0.0) & (F.col("n_copies") != 0))
    )
    assert bad.count() == 0
    out = {
        r.lang: r.n
        for r in rs.groupBy("lang").agg(F.sum("n_copies").alias("n")).collect()
    }
    total = sum(out.values())
    for lang, share in TARGET_MIX.items():
        got = out.get(lang, 0) / total
        assert abs(got - share) < 0.05, (lang, got, share)
    assert set(out) <= set(TARGET_MIX) | {
        lang for lang, n in out.items() if n == 0
    }
    rs.unpersist()


def test_weighted_doc_sample_prefers_heavy_docs(spark):
    """Exactly K rows; deterministic across invocations; the sampled
    docs' mean weight exceeds the corpus mean (pps pulls long docs)."""
    from pyspark.sql import functions as F

    from de_final_project_spark.operators.sampling import (
        SAMPLE_K,
        weighted_doc_sample,
    )

    sf = "/root/testdata/sf0.001"
    s1 = weighted_doc_sample(spark, sf).collect()
    s2 = weighted_doc_sample(spark, sf).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]
    assert len(s1) == SAMPLE_K
    corpus_mean = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .agg(F.avg(F.greatest("n_chars", F.lit(1))))
        .first()[0]
    )
    sample_mean = sum(r.weight for r in s1) / len(s1)
    assert sample_mean > corpus_mean
