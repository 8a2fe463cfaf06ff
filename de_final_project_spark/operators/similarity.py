"""Similarity search over the embeddings table (array<float>, 64-dim).

Two tiers, per the training-data-pipeline surface:

- ``knn_bruteforce`` — exact top-k cosine neighbors by pairwise join.
  Correctness baseline; O(n·q) pairs. Used with a bounded query set.
- ``knn_lsh`` (operators/neardup.py has the MinHash analog for sets) —
  random-hyperplane LSH bucketing: each vector hashed to a signature of
  sign-bits from fixed pseudo-random hyperplanes; candidates share a
  bucket, so the join is equi on the bucket key instead of a cross join.
  At 100 TB this is the scale path: the cross join never materializes.

Similarities are rounded before ranking so that ordering is stable across
engines' floating-point summation (ranking ties broken by neighbor id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.vector import cosine
from de_final_project_spark.sources.readers import read_testdata

# Bounded query set + k for the oracle-checked query.
N_QUERIES = 10
TOP_K = 5


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N_QUERIES vectors.

    The query side is tiny -> broadcast; the corpus side streams through
    the broadcast nested-loop join without shuffling. Ranking: row_number
    per query over (rounded similarity desc, neighbor id asc)."""
    from pyspark.sql import Window

    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    sim = F.round(cosine(F.col("query_vec"), F.col("embedding")), 6)
    pairs = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


KNN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS query_vec
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT q.query_id,
         e.vec_id AS neighbor_id,
         round(
           list_dot_product(q.query_vec, CAST(e.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(q.query_vec, q.query_vec))
              * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))),
           6) AS cosine_sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM pairs
)
WHERE rank <= {TOP_K}
"""

# ----------------------------------------------------------------------
# Scale path: random-hyperplane (sign) LSH.
# ----------------------------------------------------------------------

N_PLANES = 16
_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407


def _plane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane via a 64-bit LCG mapped to
    [-1, 1] — reproducible with no RNG dependency, identical everywhere."""
    vals = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        x = (_LCG_A * x + _LCG_C) & 0xFFFFFFFFFFFFFFFF
        vals.append((x >> 11) / float(1 << 53) * 2.0 - 1.0)
    return vals


def simhash_bucket(vec_col, dim: int = 64, n_planes: int = N_PLANES):
    """Sign-bit signature of ``vec_col`` against n_planes fixed hyperplanes,
    packed into a long — the LSH bucket key."""
    from de_final_project_spark.functions.vector import dot as vdot

    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(i + 1, dim)])
        bit = (vdot(vec_col, plane) >= 0).cast("long")
        bucket = bucket * 2 + bit
    return bucket


NEARDUP_COSINE_THRESHOLD = 0.4


def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact O(n²) — correctness baseline
    for the LSH-bucketed variant below. Bounded input at test scale."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= NEARDUP_COSINE_THRESHOLD)
    )


EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            6) >= {NEARDUP_COSINE_THRESHOLD}
"""


def knn_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs that share an LSH bucket, with exact cosine computed
    only for candidates. The expensive pairwise step becomes an equi-join
    on bucket — shuffle O(n), compare O(sum of bucket sizes squared)."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    hashed = emb.select(
        "vec_id", "embedding", simhash_bucket(F.col("embedding")).alias("bucket")
    )
    left = hashed.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"), "bucket"
    )
    right = hashed.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            "bucket",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cosine_sim"),
        )
    )
