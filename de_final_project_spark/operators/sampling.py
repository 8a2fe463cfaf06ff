"""Deterministic sampling & dataset splitting — training-data pipeline
surface.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG, so results
change under repartitioning, retries, and engine versions — unacceptable
for reproducible dataset curation. The scalable alternative used here:
**hash sampling**. A row's bucket is ``md5(stable id) mod 100`` — a pure
column expression, identical on every engine and every run, trivially
parallel, and stable when the corpus is re-partitioned or incrementally
extended (a document keeps its split forever, so train/test contamination
cannot creep in across refreshes).

md5 (not Spark's Murmur3 ``F.hash``) because it is bit-identical across
Spark, DuckDB, and any other engine that might own a pipeline stage.
Crypto strength is irrelevant; cross-engine determinism is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata


# Split boundaries over the 100 hash buckets: [0, TRAIN_UPPER) = train,
# [TRAIN_UPPER, TEST_LOWER) = val, [TEST_LOWER, 100) = test. Shared by
# dataset_splits, contamination_check (operators/trainprep.py) and both
# of their SQL oracles so a split change cannot desynchronize them.
TRAIN_UPPER = 80
TEST_LOWER = 90


def hash_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex digits of
    the stringified id, as an integer, mod n_buckets."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment for every document — stable
    across runs and corpus growth (a doc's split is a function of its id
    alone). Narrow projection; no shuffle, no RNG."""
    docs = read_testdata(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    split = (
        F.when(b < TRAIN_UPPER, "train")
        .when(b < TEST_LOWER, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", b.alias("bucket"), split.alias("split"))


DATASET_SPLITS_SQL = f"""
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < {TRAIN_UPPER} THEN 'train'
            WHEN bucket < {TEST_LOWER} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
              AS INT) AS bucket
  FROM documents
)
"""


def capped_per_language(spark: SparkSession, sf_dir: str, cap: int = 50) -> DataFrame:
    """Class rebalancing: keep at most ``cap`` documents per language,
    chosen by the deterministic hash order (not arrival order, which is
    partitioning-dependent). One hash shuffle on lang feeding a rank
    window — the same shape as keep-latest dedup."""
    docs = read_testdata(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash_bucket("doc_id", 1 << 30).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= cap)
        .select("doc_id", "lang", "pick_rank")
    )


CAPPED_PER_LANGUAGE_SQL = """
SELECT doc_id, lang, pick_rank
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824 ASC,
                    doc_id ASC) AS pick_rank
  FROM documents
)
WHERE pick_rank <= 50
"""


STRATIFIED_FRAC_PCT = 20  # keep 20% of every stratum


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional stratified sample: from every (lang, source)
    stratum keep ceil(frac·n) documents, chosen by the deterministic
    hash order — per-stratum proportions are EXACT (unlike Bernoulli
    ``df.sample``, whose stratum sizes fluctuate), and membership is
    reproducible under any partitioning.

    One hash shuffle on the stratum key feeding a rank window; the
    stratum size rides along as a window count over the same partition,
    so there is no second aggregate or join. This is the sampling shape
    corpus ablations need: shrink every (language, source) cell by the
    same factor without distorting the mixture.
    """
    docs = read_testdata(spark, sf_dir, "documents")
    part = Window.partitionBy("lang", "source")
    w = part.orderBy(hash_bucket("doc_id", 1 << 30).asc(), F.col("doc_id").asc())
    n = F.count(F.lit(1)).over(part)
    keep = F.ceil(n * STRATIFIED_FRAC_PCT / 100)
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).cast("long").alias("pick_rank"),
            keep.alias("stratum_keep"),
        )
        .where(F.col("pick_rank") <= F.col("stratum_keep"))
        .select("doc_id", "lang", "source", "pick_rank", "stratum_keep")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, pick_rank, stratum_keep
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824 ASC,
                    doc_id ASC)::BIGINT AS pick_rank,
         ceil(count(*) OVER (PARTITION BY lang, source) * {STRATIFIED_FRAC_PCT} / 100.0)::BIGINT
           AS stratum_keep
  FROM documents
)
WHERE pick_rank <= stratum_keep
"""


# Resolution of the deterministic uniform used by mixture_resample: a
# doc's u ~ U[0,1) is its md5 bucket over RESAMPLE_BUCKETS divided by
# RESAMPLE_BUCKETS — coarse enough to stay exactly representable in
# double on both engines, fine enough that acceptance error per doc is
# < 1e-6.
RESAMPLE_BUCKETS = 1_000_000


def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the language-mixture reweighting as an actual
    resampling plan: per document, how many copies enter the reshaped
    corpus. Downsampled languages (weight < 1) keep the doc with
    probability = weight; upsampled languages (weight > 1) repeat it
    floor(weight) times plus one more with probability frac(weight) —
    in expectation the corpus lands exactly on TARGET_MIX.

    The coin is not an RNG: u = hash_bucket(doc_id)/RESAMPLE_BUCKETS,
    the same stable-id hash convention as dataset_splits, so the
    resample is reproducible under repartitioning, retries, and engine
    swaps, and incrementally stable (a doc's copy count never changes
    when the corpus grows — only when the measured mixture does).
    Narrow projection over the broadcast per-lang weights; no shuffle
    beyond the tiny lang aggregate it inherits from
    source_mixture_weights."""
    from de_final_project_spark.operators.corpusops import (
        source_mixture_weights,
    )

    weights = source_mixture_weights(spark, sf_dir)
    u = hash_bucket("doc_id", RESAMPLE_BUCKETS).cast("double") / float(
        RESAMPLE_BUCKETS
    )
    n_copies = (
        F.floor(F.col("sample_weight"))
        + F.when(
            u < F.col("sample_weight") - F.floor(F.col("sample_weight")),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("long")
    return weights.select(
        "doc_id",
        "lang",
        "sample_weight",
        F.round(u, 6).alias("u"),
        n_copies.alias("n_copies"),
    )


def _mixture_resample_sql() -> str:
    from de_final_project_spark.operators.corpusops import (
        SOURCE_MIXTURE_WEIGHTS_SQL,
    )

    return f"""
WITH w AS ({SOURCE_MIXTURE_WEIGHTS_SQL}),
coin AS (
  SELECT doc_id, lang, sample_weight,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % {RESAMPLE_BUCKETS})::DOUBLE / {RESAMPLE_BUCKETS} AS u
  FROM w
)
SELECT doc_id, lang, sample_weight, round(u, 6) AS u,
       (floor(sample_weight)
        + CASE WHEN u < sample_weight - floor(sample_weight)
               THEN 1 ELSE 0 END)::BIGINT AS n_copies
FROM coin
"""


MIXTURE_RESAMPLE_SQL = _mixture_resample_sql()


SAMPLE_K = 100


def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement via PRIORITY SAMPLING
    (sequential Poisson, Duffield/Ohlsson): each doc draws a
    deterministic uniform u from its id hash and gets priority u/weight;
    the SAMPLE_K smallest priorities are the sample — inclusion
    probability approaches weight-proportional (pps) with none of the
    rejection loops or RNG state a naive weighted sampler needs. Weight
    here is document length in chars (sample long docs preferentially —
    the corpus-inspection shape).

    Determinism: u is the md5 bucket (integer), weight is an integer,
    and u/w is ONE correctly-rounded IEEE division — bit-identical in
    every engine, so the selected set is exactly reproducible and
    incrementally stable. Shape: narrow projection + global top-K
    (Spark's TakeOrdered — a per-partition heap then a K-row merge, no
    global sort). Ties break by doc_id.
    """
    docs = read_testdata(spark, sf_dir, "documents")
    u = hash_bucket("doc_id", 1 << 30).cast("long")
    w = F.greatest(F.col("n_chars").cast("long"), F.lit(1))
    pri = u.cast("double") / w.cast("double")
    return (
        docs.select(
            "doc_id",
            "lang",
            w.alias("weight"),
            pri.alias("_pri"),
        )
        .orderBy(F.col("_pri").asc(), F.col("doc_id").asc())
        .limit(SAMPLE_K)
        .select("doc_id", "lang", "weight", F.round("_pri", 6).alias("priority"))
    )


WEIGHTED_DOC_SAMPLE_SQL = f"""
SELECT doc_id, lang, weight, round(pri, 6) AS priority
FROM (
  SELECT doc_id, lang,
         greatest(n_chars, 1) AS weight,
         ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {1 << 30})::DOUBLE / greatest(n_chars, 1)) AS pri
  FROM documents
)
ORDER BY pri ASC, doc_id ASC
LIMIT {SAMPLE_K}
"""
