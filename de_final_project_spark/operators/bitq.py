"""Binary (sign-bit) quantization ANN — the 1-bit tier of the
quantization ladder (float32 → int8 ``embedding_quantize`` → PQ
``pq_codes`` → 1-bit here).

Each 64-dim embedding quantizes to its per-dimension sign bits, packed
into two 32-bit halves (``code_lo`` = dims 0..31, ``code_hi`` = dims
32..63) so all arithmetic stays inside non-negative 32-bits-in-a-BIGINT —
no sign/overflow edge in Spark or any oracle engine. Hamming distance
between two codes is ``bit_count(lo ^ lo') + bit_count(hi ^ hi')``:
two XORs and two popcounts per pair instead of 64 float multiplies, on
8 bytes instead of 256 — a 32× memory-bandwidth reduction, which is the
whole point at 100 TB: the candidate scan streams int codes, not float
vectors. For sign-quantized vectors the identity
``dot(sign(a), sign(b)) = DIM - 2·hamming`` ties the bit-plane to
geometry (the random-hyperplane LSH bound with the identity basis as
planes), so low Hamming ⇒ high cosine candidate.

Architecture = candidate generation + exact re-rank, the same shape as
the PQ tier (similarity.py ivf_pq_knn): Hamming ranks a top-CANDIDATES
pool per query (total order: hamming asc, neighbor_id asc), then the
exact cosine pass touches only that pool (rounded 6dp, neighbor-id
tie-break) — identical ranking rules to every other ANN tier here, so
cross-engine results match bit-for-bit. At cluster scale this composes
with the IVF router exactly like PQ does (probe cells, Hamming-scan the
cell's codes, re-rank the pool); the flat scan below is the sf-scale
form with the same operator shape.

The DuckDB oracle never touches packed codes: it computes Hamming as
``(DIM - list_dot_product(sign(a), sign(b))) / 2`` — the same quantity
by the identity above — which cross-checks the Spark side's packed-bit
arithmetic end to end rather than replaying it.

Reference parity: the reference engine (BernadinePierre/de-final-project)
has no similarity surface at all; this extends the training-data-pipeline
tier mandated by SURVEY.md §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.vector import cosine
from de_final_project_spark.operators.similarity import N_QUERIES, TOP_K
from de_final_project_spark.sources.readers import read_testdata

DIM = 64
# Hamming-ranked pool size per query before the exact re-rank pass.
# Measured recall@5 vs the brute-force truth on the testdata embeddings
# (500 vecs, both sf0.001 and sf0.01): pool 40 → 0.58-0.64, 100 → 0.84,
# 200 → 0.98, 400 → 1.0. One-bit codes rank coarsely (64 Hamming levels),
# so recall is bought with pool size; the exact re-rank pass stays
# N_QUERIES·CANDIDATES rows either way. At larger corpora hold the POOL
# FRACTION, not the constant — or route through IVF cells first so the
# Hamming scan competes within a cell, which is the cluster-scale form.
CANDIDATES = 200


def bit_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding) → (vec_id, code_lo, code_hi): sign-bit packing.

    Each 32-dim half folds big-endian via ``acc·2 + (x ≥ 0)`` — a pure
    JVM expression (no UDF), one pass over the array, max value 2³²−1 so
    the BIGINT accumulator never nears overflow.
    """

    def _pack(lo: int):
        return F.aggregate(
            F.slice(F.col("embedding"), lo, 32),
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(2)
            + F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )

    return emb.select(
        "vec_id",
        _pack(1).alias("code_lo"),
        _pack(33).alias("code_hi"),
    )


def _hamming(lo_a, lo_b, hi_a, hi_b):
    return (
        F.bit_count(lo_a.bitwiseXOR(lo_b)) + F.bit_count(hi_a.bitwiseXOR(hi_b))
    ).cast("long")


def _bitq_topk(emb: DataFrame) -> DataFrame:
    """Top-k per query: Hamming-pooled candidates, exact cosine re-rank."""
    from pyspark.sql import Window

    spark = emb.sparkSession
    codes = bit_codes(emb)
    # Corpus side streams; the query side (N_QUERIES rows of two longs)
    # broadcasts. Repartition the corpus so the scan parallelizes even
    # off a single row group (same sf1 finding as _bruteforce_topk).
    corpus = codes.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("code_lo").alias("n_lo"),
        F.col("code_hi").alias("n_hi"),
    )
    queries = codes.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("code_lo").alias("q_lo"),
        F.col("code_hi").alias("q_hi"),
    )
    pairs = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        _hamming(
            F.col("q_lo"), F.col("n_lo"), F.col("q_hi"), F.col("n_hi")
        ).alias("hamming"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    pool = (
        pairs.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= CANDIDATES)
        .drop("crank")
    )
    # Exact pass over the pool only: N_QUERIES·CANDIDATES rows, two
    # equi-joins back to the float vectors (no second broadcast-NL).
    qvec = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nvec = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    rer = (
        pool.join(F.broadcast(qvec), "query_id")
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "hamming", "cosine_sim")
    )


def bitq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine neighbors via 1-bit codes: Hamming candidate pool +
    exact re-rank. Flat Hamming scan here (int ops on 8-byte codes);
    composes with the IVF router at cluster scale."""
    emb = read_testdata(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return _bitq_topk(emb)


# ----------------------------------------------------------------------
# Matryoshka-style truncated-dimension candidate generation.
# ----------------------------------------------------------------------

# Prefix length for the cheap pass. With MRL-trained embeddings the
# leading dims carry most of the signal by construction; the testdata
# embeddings are generic (near-isotropic), so the prefix is a plain
# projection and recall is bought with prefix length x pool size —
# measured recall@5 vs brute force (sf0.01): dim 16/pool 100 0.68,
# 16/200 0.90, 24/200 0.96, 32/100 0.96, 32/200 1.0. Shipped point:
# 32 of 64 dims (2x less candidate-scan bandwidth), pool 200,
# recall 1.0 here; MRL-trained vectors move the whole curve up.
MRL_DIM = 32
MRL_CANDIDATES = 200


def _mrl_topk(emb: DataFrame) -> DataFrame:
    """Top-k: truncated-prefix cosine ranks a candidate pool, full-dim
    exact cosine re-ranks it (measured dim/pool recall curve in the
    constants' comment above)."""
    from pyspark.sql import Window

    spark = emb.sparkSession
    pre = emb.select(
        "vec_id", F.slice("embedding", 1, MRL_DIM).alias("prefix")
    )
    corpus = pre.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("neighbor_id"), F.col("prefix").alias("np")
    )
    queries = pre.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("prefix").alias("qp")
    )
    pairs = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qp"), F.col("np")), 6).alias("pre_sim"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("pre_sim").desc(), F.col("neighbor_id").asc()
    )
    pool = (
        pairs.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= MRL_CANDIDATES)
        .select("query_id", "neighbor_id", "pre_sim")
    )
    qvec = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nvec = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    )
    rer = (
        pool.join(F.broadcast(qvec), "query_id")
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "pre_sim",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "pre_sim", "cosine_sim")
    )


def mrl_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style ANN: rank candidates on the 32-dim embedding
    PREFIX (2x less bandwidth than full vectors — the dimension-
    truncation analog of bitq's bit-truncation), exact full-dim re-rank
    of the pool. Composes with IVF routing at cluster scale like every
    candidate-generation tier here."""
    emb = read_testdata(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return _mrl_topk(emb)


MRL_KNN_SQL = f"""
WITH s AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS emb,
         CAST(embedding[1:{MRL_DIM}] AS DOUBLE[]) AS pfx
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, pfx AS qp, emb AS qemb
  FROM s WHERE vec_id < {N_QUERIES}
),
pre AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         round(list_dot_product(q.qp, s.pfx)
               / (sqrt(list_dot_product(q.qp, q.qp))
                  * sqrt(list_dot_product(s.pfx, s.pfx))), 6) AS pre_sim,
         q.qemb, s.emb
  FROM s, q
  WHERE s.vec_id <> q.query_id
),
pool AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY pre_sim DESC, neighbor_id ASC)
              AS crank
    FROM pre
  ) WHERE crank <= {MRL_CANDIDATES}
),
rer AS (
  SELECT query_id, neighbor_id, pre_sim,
         round(list_dot_product(qemb, emb)
               / (sqrt(list_dot_product(qemb, qemb))
                  * sqrt(list_dot_product(emb, emb))), 6) AS cosine_sim
  FROM pool
)
SELECT query_id, rank, neighbor_id, pre_sim, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC)
            AS rank
  FROM rer
)
WHERE rank <= {TOP_K}
"""


BITQ_KNN_SQL = f"""
WITH s AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END) AS sgn,
         CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, sgn AS qsgn, emb AS qemb
  FROM s WHERE vec_id < {N_QUERIES}
),
ham AS (
  -- dot(sign(a), sign(b)) = DIM - 2*hamming  =>  the same Hamming the
  -- Spark side computes from packed codes, without bit ops
  SELECT q.query_id, s.vec_id AS neighbor_id,
         CAST(({DIM} - list_dot_product(q.qsgn, s.sgn)) / 2 AS BIGINT)
           AS hamming,
         q.qemb, s.emb
  FROM s, q
  WHERE s.vec_id <> q.query_id
),
pool AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, neighbor_id ASC)
              AS crank
    FROM ham
  ) WHERE crank <= {CANDIDATES}
),
rer AS (
  SELECT query_id, neighbor_id, hamming,
         round(list_dot_product(qemb, emb)
               / (sqrt(list_dot_product(qemb, qemb))
                  * sqrt(list_dot_product(emb, emb))), 6) AS cosine_sim
  FROM pool
)
SELECT query_id, rank, neighbor_id, hamming, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC)
            AS rank
  FROM rer
)
WHERE rank <= {TOP_K}
"""


# ----------------------------------------------------------------------
# IVF x 1-bit composition: the cluster-scale form (round 11).
# ----------------------------------------------------------------------

# Pool size for the CELL-RESTRICTED Hamming scan. The probed cells hold
# ~nprobe/K of the corpus, so the pool competes over fewer candidates
# than the flat tier's; recall vs the flat tier is pinned by test.
IVF_BITQ_CANDIDATES = 200


def ivf_bitq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed query the flat tiers point at: IVF-probe the
    trained cells, Hamming-scan ONLY the probed cells' 1-bit codes for
    a candidate pool, exact-cosine re-rank the pool. This is where the
    32x bandwidth cut actually matters at 100 TB: the scan fraction is
    nprobe/K of the corpus AND each scanned candidate is 8 bytes of
    code instead of 256 bytes of floats — the two reductions compose
    multiplicatively. Every join is an equi-join (cell, query_id); the
    only broadcast sides are the N_QUERIES-sized probe and query-code
    relations. Recall is bounded by the IVF-exact tier's (same probed
    cells, coarser in-cell ranking) and pinned against both it and the
    flat bitq tier in tests/test_bitq.py.

    Oracle: composes the trained-IVF CTE prefix (identical Lloyd
    iterations and probe ranking) with the sign-dot Hamming identity —
    the same cross-check discipline as bitq_knn."""
    from pyspark.sql import Window

    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.operators.similarity import N_PROBE

    qdf, centroids = km.train_kmeans(spark, sf_dir)
    emb = read_testdata(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cells = km.assign_cells(qdf, centroids)
    codes = bit_codes(emb)
    corpus = codes.join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        F.col("code_lo").alias("n_lo"),
        F.col("code_hi").alias("n_hi"),
    )
    probes = (
        km.with_centroids(qdf.where(F.col("vec_id") < N_QUERIES), centroids)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(km.cells_by_dist(), 1, N_PROBE)).alias("p"),
        )
        .select("query_id", F.col("p")["j"].alias("cell"))
    )
    qcodes = codes.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("code_lo").alias("q_lo"),
        F.col("code_hi").alias("q_hi"),
    )
    pairs = (
        corpus.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qcodes), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _hamming(
                F.col("q_lo"), F.col("n_lo"), F.col("q_hi"), F.col("n_hi")
            ).alias("hamming"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    pool = (
        pairs.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= IVF_BITQ_CANDIDATES)
        .select("query_id", "neighbor_id", "hamming")
    )
    qvec = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nvec = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    )
    rer = (
        pool.join(F.broadcast(qvec), "query_id")
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "hamming", "cosine_sim")
    )


def _ivf_bitq_sql() -> str:
    from de_final_project_spark.operators.similarity import _ivf_trained_cte

    return f"""{_ivf_trained_cte()},
ncode AS (
  SELECT neighbor_id, cell, v,
         list_transform(v, x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END)
           AS nsgn
  FROM corpus
),
qcode AS (
  SELECT query_id, qv,
         list_transform(qv, x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END)
           AS qsgn
  FROM qe
),
ham AS (
  SELECT p.query_id, n.neighbor_id,
         CAST(({DIM} - list_dot_product(q.qsgn, n.nsgn)) / 2 AS BIGINT)
           AS hamming,
         q.qv AS qemb, n.v AS emb
  FROM probes p
  JOIN ncode n USING (cell)
  JOIN qcode q ON q.query_id = p.query_id
  WHERE n.neighbor_id <> p.query_id
),
pool AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, neighbor_id ASC)
              AS crank
    FROM ham
  ) WHERE crank <= {IVF_BITQ_CANDIDATES}
),
rer AS (
  SELECT query_id, neighbor_id, hamming,
         round(list_dot_product(qemb, emb)
               / (sqrt(list_dot_product(qemb, qemb))
                  * sqrt(list_dot_product(emb, emb))), 6) AS cosine_sim
  FROM pool
)
SELECT query_id, rank, neighbor_id, hamming, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC)
            AS rank
  FROM rer
)
WHERE rank <= {TOP_K}
"""


IVF_BITQ_KNN_SQL = _ivf_bitq_sql()

# ----------------------------------------------------------------------
# IVF x Matryoshka-prefix composition: the cluster-scale form of the
# dimension-truncation tier (round 11, mirrors the IVF x 1-bit shape).
# ----------------------------------------------------------------------

IVF_MRL_CANDIDATES = 200


def ivf_mrl_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probe the trained cells, rank candidates INSIDE the probed
    cells on the MRL_DIM-dim embedding prefix, exact full-dim re-rank of
    the pool. The two scan reductions compose multiplicatively: the
    probe restricts the scan to ~nprobe/K of the corpus, and each
    scanned candidate reads MRL_DIM/DIM of the vector bytes (half, at
    the shipped 32-of-64 point; MRL-trained embeddings push the usable
    prefix shorter). All joins are equi-joins on (cell, query_id); only
    the N_QUERIES-sized probe/query relations broadcast. Recall is
    bounded by ivf_knn_trained's (same probed cells, prefix-coarsened
    in-cell ranking) and pinned against it and the flat mrl tier in
    tests/test_bitq.py.

    Oracle: the trained-IVF CTE prefix (identical Lloyd iterations and
    probe ranking) with list-slice prefix cosine — same cross-check
    discipline as ivf_bitq_knn."""
    from pyspark.sql import Window

    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.operators.similarity import N_PROBE

    qdf, centroids = km.train_kmeans(spark, sf_dir)
    emb = read_testdata(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cells = km.assign_cells(qdf, centroids)
    pre = emb.select(
        "vec_id", F.slice("embedding", 1, MRL_DIM).alias("prefix")
    )
    corpus = pre.join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        F.col("prefix").alias("np"),
    )
    probes = (
        km.with_centroids(qdf.where(F.col("vec_id") < N_QUERIES), centroids)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(km.cells_by_dist(), 1, N_PROBE)).alias("p"),
        )
        .select("query_id", F.col("p")["j"].alias("cell"))
    )
    qpre = pre.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("prefix").alias("qp")
    )
    pairs = (
        corpus.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qpre), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qp"), F.col("np")), 6).alias("pre_sim"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("pre_sim").desc(), F.col("neighbor_id").asc()
    )
    pool = (
        pairs.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= IVF_MRL_CANDIDATES)
        .select("query_id", "neighbor_id", "pre_sim")
    )
    qvec = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nvec = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    )
    rer = (
        pool.join(F.broadcast(qvec), "query_id")
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "pre_sim",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "pre_sim", "cosine_sim")
    )


def _ivf_mrl_sql() -> str:
    from de_final_project_spark.operators.similarity import _ivf_trained_cte

    return f"""{_ivf_trained_cte()},
npre AS (
  SELECT neighbor_id, cell, v,
         CAST(v[1:{MRL_DIM}] AS DOUBLE[]) AS np
  FROM corpus
),
qpre AS (
  SELECT query_id, qv,
         CAST(qv[1:{MRL_DIM}] AS DOUBLE[]) AS qp
  FROM qe
),
pre AS (
  SELECT p.query_id, n.neighbor_id,
         round(list_dot_product(q.qp, n.np)
               / (sqrt(list_dot_product(q.qp, q.qp))
                  * sqrt(list_dot_product(n.np, n.np))), 6) AS pre_sim,
         q.qv AS qemb, n.v AS emb
  FROM probes p
  JOIN npre n USING (cell)
  JOIN qpre q ON q.query_id = p.query_id
  WHERE n.neighbor_id <> p.query_id
),
pool AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY pre_sim DESC, neighbor_id ASC)
              AS crank
    FROM pre
  ) WHERE crank <= {IVF_MRL_CANDIDATES}
),
rer AS (
  SELECT query_id, neighbor_id, pre_sim,
         round(list_dot_product(qemb, emb)
               / (sqrt(list_dot_product(qemb, qemb))
                  * sqrt(list_dot_product(emb, emb))), 6) AS cosine_sim
  FROM pool
)
SELECT query_id, rank, neighbor_id, pre_sim, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC)
            AS rank
  FROM rer
)
WHERE rank <= {TOP_K}
"""


IVF_MRL_KNN_SQL = _ivf_mrl_sql()
