"""SemDeDup: semantic deduplication by cluster-then-prune.

The published recipe (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", 2023): k-means-cluster
the embedding space, then compare pairs ONLY within a cluster and drop
all but one of each near-identical set. Clustering is what makes the
problem tractable — pair cost falls from O(n²) to O(Σ cluster²), and
the cluster count K scales WITH the corpus so cluster sizes (and thus
per-cluster pair cost) stay bounded: at 100 TB you run K ~ n/10⁴, the
assignment is one broadcast-centroid projection per vector, and the
pair stage is an equi-join on cluster id — never an all-pairs shuffle.

This implementation composes two existing exact primitives so the
whole pipeline has a bit-exact cross-engine oracle:

- the fixed-point integer Lloyd trainer (operators/kmeans.py) — the
  oracle replays the identical iterations as generated CTEs;
- the normalize-then-dot cosine with round(..., 6) (operators/
  similarity.py) — the oracle restates the identical float arithmetic.

Keep rule (deterministic variant of the paper's one-per-group): a
vector is DROPPED iff some same-cluster vector with a SMALLER vec_id
scores >= the threshold against it — the smallest id in each semantic
neighborhood survives, the same canonical-winner discipline as the
MinHash cluster keep rule (operators/neardup.py).

Caveat inherited from the method itself: near-duplicates split across
two clusters are not compared (the paper accepts this recall loss;
raising K trades recall for cost). The exact baseline twin is
embedding_neardup_exact.

K is corpus-adaptive (operators/kmeans.py choose_k: clamp(ceil(n /
256), K_MIN, K_MAX) — since round 11 K_MAX is 4096 because centroids
are table-backed, so TARGET_CLUSTER_SIZE is the binding constraint at
every realistic corpus), which is what keeps the within-cluster pair
stage
~LINEAR in n (n·target pairs) instead of O(n²/const) — under the old
fixed K=8 this operator measured 8.6× wall at 10× data; with adaptive
K it measures 3.7×, and the residual is the K-RAMP itself (K grew
8→64 across that window, so the n·K assignment did 80× the work; past
K_MAX the assignment is O(n·K_MAX), linear). Training is SAMPLED
(train_kmeans_sampled: first min(n, 64·K) vectors) so the Lloyd
iterations cost O(K²) rather than KMEANS_ITERS extra O(n·K) passes.
The max-cluster guard below stays as the backstop against a
degenerate clustering, not as the scaling mechanism.

Reference analog: none — extension surface (training-data pipeline
ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.vector import dot
from de_final_project_spark.operators.kmeans import (
    K_MAX,
    K_MIN,
    TARGET_CLUSTER_SIZE,
    TRAIN_POINTS_PER_CENTROID,
    _assign,
    _kmeans_sql,
    train_kmeans_sampled,
)
from de_final_project_spark.operators.similarity import unit_vectors
from de_final_project_spark.session import scoped_persist
from de_final_project_spark.sources.readers import read_testdata

SEMDEDUP_COSINE_THRESHOLD = 0.4

# Per-cluster size bound: pair cost within a cluster is quadratic, so a
# degenerate clustering (everything in one cell) must refuse loudly
# rather than silently going O(n²). Conf-raisable like the exact
# baseline guard. At production K ~ n/10⁴ the bound holds by design.
MAX_CLUSTER_CONF = "spark.de_final_project.semdedupMaxCluster"
DEFAULT_MAX_CLUSTER = 100_000


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SemDeDup verdict: (vec_id, cluster, kept). Pipeline:
    train the fixed-point k-means, assign every vector, unit-normalize
    once, equi-join pairs WITHIN clusters, drop any vector with a
    smaller-id neighbor at >= threshold cosine."""
    qdf, centroids, _cap = train_kmeans_sampled(spark, sf_dir)
    assigned = _assign(qdf, centroids).select(
        "vec_id", F.col("cluster").cast("long").alias("cluster")
    )
    sizes = assigned.groupBy("cluster").count()
    limit = int(
        spark.conf.get(MAX_CLUSTER_CONF, str(DEFAULT_MAX_CLUSTER))
    )
    worst = sizes.agg(F.max("count")).first()[0]
    if worst and worst > limit:
        raise ValueError(
            f"semantic_dedup: largest cluster has {worst:,} vectors, over "
            f"the {limit:,} bound — the within-cluster pair stage is "
            f"quadratic. Raise K (retrain) or {MAX_CLUSTER_CONF}."
        )
    u = unit_vectors(read_testdata(spark, sf_dir, "embeddings"))
    clustered = scoped_persist(
        assigned.join(u, "vec_id").repartition(
            spark.sparkContext.defaultParallelism, "cluster"
        ),
        "semantic_dedup",
    )
    a = clustered.select(
        F.col("vec_id").alias("a_id"), F.col("u").alias("u_a"), "cluster"
    )
    b = clustered.select(
        F.col("vec_id").alias("b_id"), F.col("u").alias("u_b"), "cluster"
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            F.round(dot(F.col("u_a"), F.col("u_b")), 6)
            >= SEMDEDUP_COSINE_THRESHOLD
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return clustered.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.col("_dropped").isNull().alias("kept"),
    )


# The oracle replays the identical Lloyd iterations (generated CTEs),
# the identical normalize-then-dot cosine, and the identical keep rule.
# Training is SAMPLED (train_kmeans_sampled): K from the FULL corpus
# count (k_where=""), iterations over the first train_cap(n, k) =
# max(k, min(n, 64·k)) vectors — both stated below as the same scalar
# subqueries the Python side computes, so the oracle tracks every
# scale factor. At the driver's sf0.01 the cap equals the corpus and
# the results are identical to full training.
_KK_SQL = (
    f"least({K_MAX}, greatest({K_MIN}, "
    f"(count(*) + {TARGET_CLUSTER_SIZE - 1}) // {TARGET_CLUSTER_SIZE}))"
)
_CAP_SQL = (
    f"(SELECT greatest({_KK_SQL}, "
    f"least(count(*), {TRAIN_POINTS_PER_CENTROID} * {_KK_SQL}))::BIGINT "
    "FROM embeddings)"
)
SEMDEDUP_KMEANS_PREFIX = _kmeans_sql(
    train_where=f"v.vec_id < {_CAP_SQL}", k_where=""
)

SEMANTIC_DEDUP_SQL = f"""{SEMDEDUP_KMEANS_PREFIX},
un AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nn
  FROM embeddings
),
uu AS (SELECT vec_id, list_transform(v, x -> x / nn) AS u FROM un),
cl AS (
  SELECT f.vec_id, f.cluster, uu.u
  FROM final_assign f JOIN uu USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.u, b.u), 6) >= {SEMDEDUP_COSINE_THRESHOLD}
)
SELECT c.vec_id, c.cluster, d.vec_id IS NULL AS kept
FROM cl c LEFT JOIN dropped d ON c.vec_id = d.vec_id
"""


def semantic_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster curation report off the same verdict frame: cluster
    size, vectors kept, and the drop share — the number a data-mixture
    owner reads to decide whether a slice of the corpus is redundant.
    Exact integers plus one IEEE division (no rounding hazard)."""
    verdict = semantic_dedup(spark, sf_dir)
    return verdict.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("size"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        (
            F.sum((~F.col("kept")).cast("long")) / F.count(F.lit(1))
        ).alias("drop_share"),
    )


SEMANTIC_DEDUP_REPORT_SQL = f"""
WITH verdict AS ({SEMANTIC_DEDUP_SQL})
SELECT cluster, count(*) AS size,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN kept THEN 0 ELSE 1 END) / count(*) AS drop_share
FROM verdict GROUP BY cluster
"""
