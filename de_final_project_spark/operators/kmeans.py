"""Exact fixed-point distributed k-means over the embeddings corpus.

Lloyd's algorithm is the canonical embedding-clustering primitive
(corpus bucketing for IVF indexes, topic discovery, dataset mixture
analysis), but a float implementation cannot have a cross-engine-exact
oracle: distance sums and centroid means accumulate in engine- and
partition-dependent order. This implementation makes every step EXACT
integer arithmetic, so the iterated result is bit-identical under any
partitioning — the same discipline as the fixed-point PageRank
(operators/corpusops.py) and the iteration-exact BPE loop
(operators/bpe.py):

- vectors quantize to an integer grid: ``q_d = floor(x_d * 64)``.
  The *64 scale is a POWER OF TWO, so ``x*64`` is exact in IEEE
  doubles and ``floor`` is deterministic in every engine — no rounding
  boundary exists at all (contrast the round(double) divergence the
  sf1 proof caught in events_gapfill).
- centroids live on a 1/64 sub-grid, stored as integers scaled by 64:
  ``C_d = round_half_up(64 * S_d / n)`` computed as ``(128*S + n) div
  (2n)`` — exact rational rounding in int64.
- distances are exact int64: ``Σ_d (64*q_d - C_d)²``; argmin ties
  break to the smallest cluster id.

Scale shape: per iteration, the K×64 centroid state travels as a
broadcast-joined centroid RELATION — a single-row build side holding
``array<struct<j, c>>``, attached to every vector by a broadcast HASH
join on a constant bucket key (the streamed-side key is
``pmod(vec_id, 1)``, non-foldable, so Catalyst keeps a genuine
equi-join instead of folding the condition to true and degenerating to
a nested loop). The argmin is one ``array_min(transform(...))``
higher-order expression over that runtime array — the expression TREE
is O(1) regardless of K, so K scales to 10³–10⁴ cells (the 100 TB
design point, K ~ n/10⁴) with no analyzer blowup; per-row work is the
inherent O(K·dim) coarse scan. Then one explode + hash aggregate for
the per-(cluster, dim) sums — the classic map-side-combined
word-count shuffle, O(K·dim) final rows. The centroid state is a
control-plane scalar set (same class as the BPE argmax and watermark
probes). Empty clusters keep their previous centroid.

K is CORPUS-ADAPTIVE: ``K = clamp(ceil(n / TARGET_CLUSTER_SIZE),
K_MIN, K_MAX)`` from one cheap count, so expected cluster size — and
with it the quadratic within-cluster pair cost SemDeDup pays — stays
bounded as the corpus grows (the fixed K=8 of earlier rounds measured
8.6× wall at 10× data; adaptive K makes the pair stage ~linear:
n²/K = n·target). The SQL twin computes the identical K from the
identical count inside the generated CTE chain (``kparam``), so the
oracle stays bit-exact at EVERY scale factor without regenerating SQL
per corpus. K_MAX bounds only DRIVER-side state now (the
per-iteration K×64 sums collect and the ~2 MB broadcast payload at
K=4096), NOT the expression tree — through round 10 it was 64 because
centroids were inlined as literal expression trees; the relation join
removed that ceiling, so every clustering consumer (IVF cells,
SemDeDup cluster sizes, filtered-ANN probe caps) scales with the
corpus instead of flooring at n/64.

Reference analog: none — the reference has no ML-adjacent surface;
this completes the ANN/clustering family (IVF cells, PQ codebooks,
label centroids) with a trained partitioner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

K_CLUSTERS = 8  # the FLOOR: chosen K never drops below this
K_MIN = K_CLUSTERS
K_MAX = 4096         # driver-state bound, NOT an expression ceiling
                     # (table-backed centroids — see module docstring)
TARGET_CLUSTER_SIZE = 256
KMEANS_ITERS = 4
DIM = 64
SCALE = 64  # power of two: x*SCALE is exact in doubles


def choose_k(n: int) -> int:
    """Corpus-adaptive cluster count: ceil(n / TARGET_CLUSTER_SIZE)
    clamped to [K_MIN, K_MAX]. Mirrored bit-for-bit by the SQL twin's
    ``kparam`` CTE (least/greatest over the same integer ceiling)."""
    return min(K_MAX, max(K_MIN, -(-n // TARGET_CLUSTER_SIZE)))


# Sampled-training budget: Lloyd needs ~O(10²) points per centroid to
# place centroids well (FAISS's guideline is 39-256); training on the
# FULL corpus costs KMEANS_ITERS extra O(n·K) passes on top of the one
# final assignment the result needs anyway. Capping the training set
# at TRAIN_POINTS_PER_CENTROID·K points makes training O(K²) — the
# 4-iteration multiplier stops scaling with the corpus. Honest
# measurement (semantic_dedup, sf1): wall is UNCHANGED at this size
# because the final n·K assignment and the pair join dominate, not
# training; the cap matters where training would otherwise be the
# KMEANS_ITERS-fold dominant term. The residual scaling band is the
# K-RAMP: sf0.1→sf1 wall 3.7× at 10× data because K itself grew 8→64
# (n·K work 80×); past K_MAX the assignment is O(n·K_MAX) — linear —
# so the band is one-time and bounded by design. The cap is a
# deterministic vec_id PREFIX so the seeding contract (vec_ids 0..K-1
# present) holds and the oracle can state the same cap as a scalar
# subquery.
TRAIN_POINTS_PER_CENTROID = 64

# Driver-training size budget: frames whose per-iteration work n·K·DIM
# is at or under this run the Lloyd loop driver-side off ONE bounded
# collect (exact int64 NumPy — bit-identical; see train_kmeans_frame);
# larger frames run the distributed loop. Every sampled trainer call
# sits under this by construction until K ~ 1000 (cap·K·DIM =
# 64·K²·64); the full-corpus trainer crosses it as the corpus grows
# and stays distributed — scale-adaptive, not a local[32] constant.
DRIVER_TRAIN_BUDGET = int(
    __import__("os").environ.get("SPARK_GRAFT_DRIVER_TRAIN_BUDGET", str(1 << 28))
)


def train_cap(n: int, k: int) -> int:
    """Training-prefix size for sampled Lloyd: min(n, 64·k), never
    below k (the seed rows must exist)."""
    return max(k, min(n, TRAIN_POINTS_PER_CENTROID * k))


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    # single-row-group small table: repartition so per-iteration
    # assignment scans parallelize (sf1 proof lesson).
    return emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * SCALE).cast("long"),
        ).alias("q"),
    )


# ----------------------------------------------------------------------
# Table-backed centroid state (round 11): the centroids ride as DATA in
# a broadcast-joined single-row relation, not as literal expression
# trees — the expression tree stays O(1) as K grows to 10³–10⁴.
# ----------------------------------------------------------------------

CENT_KEY = "_ck"
CENT_COL = "_cents"
_CENT_SCHEMA = (
    f"{CENT_KEY} bigint, "
    f"{CENT_COL} array<struct<j: bigint, c: array<bigint>>>"
)


def centroid_relation(spark: SparkSession, centroids: list[list[int]]) -> DataFrame:
    """One-row DataFrame carrying the full centroid state as
    ``array<struct<j, c>>`` plus a constant join key — K×DIM longs,
    control-plane sized (≈2 MB at K_MAX)."""
    rows = [(j, [int(v) for v in c]) for j, c in enumerate(centroids)]
    return spark.createDataFrame([(0, rows)], _CENT_SCHEMA)


def with_centroids(
    df: DataFrame, centroids: list[list[int]], key_col: str = "vec_id"
) -> DataFrame:
    """Attach the centroid relation to every row via a broadcast HASH
    join on a constant bucket key. The streamed-side key is
    ``pmod(key_col, 1)`` — always 0, but NON-foldable (it references a
    real column), so Catalyst plans BroadcastHashJoin rather than
    folding the condition to true and degenerating to a nested loop."""
    cdf = centroid_relation(df.sparkSession, centroids)
    return (
        df.withColumn(
            CENT_KEY, F.pmod(F.col(key_col), F.lit(1)).cast("bigint")
        )
        .join(F.broadcast(cdf), CENT_KEY)
        .drop(CENT_KEY)
    )


def dist_to(c):
    """Exact int64 squared distance from 64*q to a centroid COLUMN (an
    ``array<bigint>`` expression — typically a lambda variable's ``c``
    field or an ``element_at`` over the attached relation)."""
    return F.aggregate(
        F.zip_with(
            F.col("q"), c, lambda a, b: (a * SCALE - b) * (a * SCALE - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def best_cell():
    """(dist, cluster) struct of the nearest centroid over the attached
    ``_cents`` relation, ties to smallest id: array_min over structs
    compares lexicographically — one O(1)-sized expression evaluating
    the O(K·dim) scan at runtime, no shuffle. Requires
    :func:`with_centroids` upstream (columns ``q`` and ``_cents``)."""
    return F.array_min(
        F.transform(
            F.col(CENT_COL),
            lambda s: F.struct(dist_to(s["c"]).alias("d"), s["j"].alias("j")),
        )
    )


def cells_by_dist():
    """All K (dist, cell) structs sorted ascending (ties to smallest
    id) — the probe-ranking twin of :func:`best_cell`; slice the first
    nprobe for an IVF probe list."""
    return F.array_sort(
        F.transform(
            F.col(CENT_COL),
            lambda s: F.struct(dist_to(s["c"]).alias("d"), s["j"].alias("j")),
        )
    )


def centroid_of(j_col):
    """The centroid vector (array<bigint>) for a cell-id COLUMN, read
    out of the attached ``_cents`` relation (positions are 1-based and
    the relation is ordered by j at construction)."""
    return F.element_at(F.col(CENT_COL), j_col.cast("int") + 1)["c"]


def assign_cells(qdf: DataFrame, centroids: list[list[int]], out: str = "cell") -> DataFrame:
    """(vec_id, <out>): nearest trained cell per quantized vector —
    the standard IVF corpus-assignment shape."""
    return with_centroids(qdf, centroids).select(
        "vec_id", best_cell()["j"].alias(out)
    )


def _assign(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    return with_centroids(qdf, centroids).select(
        "vec_id", "q", best_cell()["j"].alias("cluster")
    )


def train_kmeans(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[list[int]]]:
    """Run the Lloyd loop over the embeddings table; return (persisted
    quantized corpus, final centroids as K x DIM scaled ints). The
    centroid state is control-plane-sized, so returning it as plain
    lists is the same contract as the BPE merge table."""
    qdf = _quantized(spark, sf_dir).persist()
    return qdf, train_kmeans_frame(qdf)


def train_kmeans_sampled(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[list[int]], int]:
    """Scale-path trainer: K is chosen from the FULL corpus count (the
    cluster count must track the corpus), but the Lloyd iterations run
    over only the first :func:`train_cap` vectors — O(K²) training
    instead of O(n·K), with the full-corpus assignment left to the
    caller. Returns (full quantized corpus persisted, centroids, the
    cap actually used). The SQL twin states the identical K and cap as
    scalar subqueries (``_kmeans_sql(train_where=..., k_where="")``),
    so the oracle stays bit-exact at every scale factor."""
    qdf = _quantized(spark, sf_dir).persist()
    n = qdf.count()
    k = choose_k(n)
    cap = train_cap(n, k)
    centroids = train_kmeans_frame(qdf.where(F.col("vec_id") < cap), k=k)
    return qdf, centroids, cap


def train_kmeans_frame(qdf: DataFrame, k: int | None = None) -> list[list[int]]:
    """Lloyd loop over an arbitrary quantized frame (vec_id, q:
    array<long> of length DIM) — the frame-parameterized core, so the
    trainer composes over derived corpora (e.g. the clustered A/B
    corpus) as well as the embeddings table. ``k`` defaults to the
    corpus-adaptive :func:`choose_k` over the frame's count (one cheap
    control-plane count job); pass a fixed k only for twins that must
    pin it.

    Small training frames (n·K·DIM at or under
    :data:`DRIVER_TRAIN_BUDGET`) train DRIVER-SIDE in exact int64
    NumPy: every sampled trainer call (cap = 64·K rows) is a bounded
    control-plane set — the same class as the per-iteration K×DIM sum
    collect the distributed loop already pulls — and one collect + a
    local loop replaces KMEANS_ITERS (assign + aggregate + collect +
    broadcast-build) job rounds, which at bench scale were ~90% fixed
    job overhead (measured: 7.0 s for a 512-row, K=8 training;
    OPTIMIZATION r12 §kmeans). All arithmetic is integer — quantized
    grid distances, int64 sums (order-independent), the identical
    exact rational centroid rounding — so the result is bit-identical
    to the distributed loop on any input. Frames past the budget (the
    full-corpus trainer at real scale) run the distributed loop
    unchanged."""
    n = qdf.count()
    if k is None:
        k = choose_k(n)
    if n * k * DIM <= DRIVER_TRAIN_BUDGET:
        return _train_kmeans_driver(qdf, k)
    seed_rows = (
        qdf.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    )
    # Seeding contract: vec_ids 0..K-1 must ALL exist. Spark numbers
    # clusters by seed-row position while the oracle labels them by
    # vec_id — a gap would silently misalign labels cross-engine, and a
    # short seed list would IndexError deep in the empty-cluster branch.
    # Fail fast with the actual ids instead (ADVICE r6).
    seed_ids = [r["vec_id"] for r in seed_rows]
    if seed_ids != list(range(k)):
        raise ValueError(
            f"k-means seeding needs embeddings with contiguous vec_ids "
            f"0..{k - 1}; found {seed_ids}"
        )
    centroids = [[int(v) * SCALE for v in r["q"]] for r in seed_rows]
    for _ in range(KMEANS_ITERS):
        assigned = _assign(qdf, centroids)
        # Per-(cluster, dim) sums as ONE hash aggregate with DIM sum
        # columns instead of posexplode + groupBy(cluster, d): the
        # explode form shuffled n·DIM rows per iteration (320k at
        # sf0.1) and cost a second codegen stage; the wide aggregate
        # partial-aggregates map-side and ships K rows of DIM+1 longs.
        # Same exact int64 sums/counts, one job per iteration.
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("q", d + 1)).alias(f"_s{d}")
                    for d in range(DIM)
                ],
            )
            .collect()
        )
        by_cluster: dict[int, tuple[list[int], int]] = {
            r["cluster"]: ([r[f"_s{d}"] for d in range(DIM)], r["_n"])
            for r in sums
        }
        new_centroids = []
        for j in range(k):
            if j in by_cluster:
                s, n = by_cluster[j]
                new_centroids.append(
                    [
                        # floor((2*SCALE*s + n) / 2n): round-half-
                        # toward-+inf of SCALE*s/n, exact in int64;
                        # the oracle floors identically (DuckDB's
                        # integer // truncates, so it floors via
                        # double there — see _kmeans_sql).
                        (2 * SCALE * s[d] + n) // (2 * n)
                        for d in range(DIM)
                    ]
                )
            else:
                new_centroids.append(centroids[j])  # empty cluster
        centroids = new_centroids
    return centroids


def _train_kmeans_driver(qdf: DataFrame, k: int) -> list[list[int]]:
    """Driver-side exact-integer Lloyd over a BOUNDED training frame —
    bit-identical to the distributed loop by construction: the same
    seed rows, the same exact int64 grid distances with ties to the
    smallest cluster id (strict ``<`` update scanning j ascending =
    ``array_min`` over (d, j) structs), the same order-independent
    integer sums, and the same exact rational centroid rounding
    ``(2·SCALE·s + n) // (2n)`` in Python ints. Integer arithmetic has
    no rounding at all, so there is no IEEE-order hazard in moving it
    off the cluster."""
    import numpy as np

    rows = qdf.select("vec_id", "q").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    Q = np.array([rows[int(i)]["q"] for i in order], dtype=np.int64)
    seed_ids = [int(v) for v in ids[:k]] if len(ids) >= k else [
        int(v) for v in ids
    ]
    if seed_ids != list(range(k)):
        raise ValueError(
            f"k-means seeding needs embeddings with contiguous vec_ids "
            f"0..{k - 1}; found {seed_ids}"
        )
    X = Q * SCALE  # n×DIM int64 — the 64·q side of the grid distance
    C = X[:k].copy()  # seeds: centroid = SCALE·q of vec_ids 0..k-1
    n_rows = len(ids)
    for _ in range(KMEANS_ITERS):
        best_d = None
        best_j = np.zeros(n_rows, dtype=np.int64)
        for j in range(k):
            diff = X - C[j]
            d = (diff * diff).sum(axis=1)
            if best_d is None:
                best_d = d
            else:
                m = d < best_d  # strict: ties keep the smaller j
                best_d = np.where(m, d, best_d)
                best_j = np.where(m, j, best_j)
        new_c = C.copy()
        for j in range(k):
            mask = best_j == j
            nj = int(mask.sum())
            if nj:  # empty cluster keeps its previous centroid
                s = Q[mask].sum(axis=0)
                new_c[j] = np.array(
                    [(2 * SCALE * int(sd) + nj) // (2 * nj) for sd in s],
                    dtype=np.int64,
                )
        C = new_c
    return [[int(v) for v in row] for row in C]


def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMEANS_ITERS Lloyd iterations from a deterministic seed (the
    first K = choose_k(n) vectors by vec_id), returning each vector's final
    cluster and its exact squared grid distance. The oracle replays the
    identical integer iterations as generated CTEs."""
    qdf, centroids = train_kmeans(spark, sf_dir)
    # two-step select: the argmin struct lands in a named column first,
    # so Catalyst's CollapseProject keeps it evaluated ONCE (it only
    # inlines cheap expressions into multi-reference consumers).
    return (
        with_centroids(qdf, centroids)
        .select("vec_id", best_cell().alias("_b"))
        .select(
            "vec_id",
            F.col("_b")["j"].cast("long").alias("cluster"),
            F.col("_b")["d"].alias("sq_dist"),
        )
    )


# Exact int64 squared distance between a quantized vector column q and
# a scaled centroid column c — shared by the training CTEs and any
# downstream probe (trained IVF).
KMEANS_DIST_SQL = (
    f"list_sum(list_transform(generate_series(1, {DIM}), "
    f"i -> (q[i]*{SCALE} - c[i]) * (q[i]*{SCALE} - c[i])))::BIGINT"
)


def _kmeans_sql(
    qv_body: str | None = None,
    train_where: str = "",
    k_where: str | None = None,
) -> str:
    """Generated Lloyd-iteration CTE chain. ``qv_body`` overrides the
    quantized-corpus source (SELECT yielding vec_id, q BIGINT[]) so the
    identical iterations can replay over a derived corpus (clustered
    A/B) — default is the embeddings table. ``train_where`` (predicate
    over alias ``v``) restricts the TRAINING iterations to a subset
    while ``final_assign`` still covers the whole corpus — the
    frozen-quantizer contract: train on history, assign everything
    (streamed_ivf_index)."""
    qv = qv_body or f"""SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {SCALE}) AS BIGINT)) AS q
  FROM embeddings"""
    # MATERIALIZED: qv is referenced by every iteration CTE plus
    # final_assign; DuckDB otherwise re-inlines the quantization per
    # reference (measured 3.3x end-to-end on the sf1 oracle).
    # kparam mirrors choose_k() bit-for-bit over the TRAINING corpus
    # (the train_where-restricted rows when a frozen quantizer trains
    # on history): positive-integer // floors in both engines, so
    # (n + T - 1) // T is the exact ceiling.
    # kparam's count basis defaults to the training subset (the frozen-
    # quantizer contract: K sized to what the trainer sees); sampled
    # training passes k_where="" so K tracks the FULL corpus while the
    # iterations stay restricted to the training prefix.
    k_pred_src = train_where if k_where is None else k_where
    train_count_pred = f" WHERE {k_pred_src}" if k_pred_src else ""
    base = f"""WITH qv AS MATERIALIZED (
  {qv}
), kparam AS (
  SELECT least({K_MAX}, greatest({K_MIN},
           (count(*) + {TARGET_CLUSTER_SIZE - 1}) // {TARGET_CLUSTER_SIZE}
         ))::BIGINT AS kk
  FROM qv v{train_count_pred}
), c0 AS (
  SELECT vec_id AS cl, list_transform(q, v -> v * {SCALE}) AS c
  FROM qv WHERE vec_id < (SELECT kk FROM kparam)
)"""
    dist = KMEANS_DIST_SQL
    train_pred = f" WHERE {train_where}" if train_where else ""
    parts = [base]
    for it in range(1, KMEANS_ITERS + 1):
        prev = f"c{it - 1}"
        parts.append(f""",
a{it} AS (
  SELECT vec_id, q, cl FROM (
    SELECT v.vec_id, v.q, c.cl,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist} ASC, c.cl ASC) AS rk
    FROM qv v CROSS JOIN {prev} c{train_pred}
  ) WHERE rk = 1
), s{it} AS (
  SELECT cl, i AS d, sum(q[i])::BIGINT AS s, count(*)::BIGINT AS n
  FROM a{it}, unnest(generate_series(1, {DIM})) AS t(i)
  GROUP BY 1, 2
), c{it} AS (
  SELECT p.cl,
         list_transform(generate_series(1, {DIM}),
           i -> coalesce(u.c_new[i], p.c[i])) AS c
  FROM {prev} p LEFT JOIN (
    SELECT cl, list(nc ORDER BY d) AS c_new
    -- FLOOR division via double (DuckDB's integer // truncates toward
    -- zero, Python's // floors — they disagree on negative sums).
    -- Exact: |2*{SCALE}*s + n| stays far below 2^53.
    FROM (SELECT cl, d,
                 CAST(floor((2*{SCALE}*s + n)::DOUBLE / (2*n)) AS BIGINT) AS nc
          FROM s{it})
    GROUP BY cl
  ) u ON p.cl = u.cl
)""")
    parts.append(f""",
final_assign AS (
  SELECT vec_id, cl AS cluster, sq_dist FROM (
    SELECT v.vec_id, c.cl, {dist} AS sq_dist,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist} ASC, c.cl ASC) AS rk
    FROM qv v CROSS JOIN c{KMEANS_ITERS} c
  ) WHERE rk = 1
)""")
    return "".join(parts)


# CTE prefix ending in final_assign (+ c{KMEANS_ITERS} centroids) —
# reusable by downstream oracles (the trained-IVF probe composes on it).
KMEANS_CTE_PREFIX = _kmeans_sql()

KMEANS_ASSIGNMENTS_SQL = (
    KMEANS_CTE_PREFIX + "\nSELECT vec_id, cluster, sq_dist FROM final_assign"
)


def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality report off the trained assignment: size, label
    purity (majority true label share), and mean exact distance per
    cluster — how a training-data team reads a clustering before using
    it for mixture decisions. Pure hash aggregate over the assignment
    join."""
    assigned = kmeans_assignments(spark, sf_dir)
    labels = read_testdata(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    per_label = (
        assigned.join(labels, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("sq_dist").alias("sd"))
    )
    # No round() anywhere: the numerators/denominators are exact int64
    # under 2^53, so the single IEEE division is bit-identical in every
    # engine — rounding would only reintroduce the .5-boundary hazard.
    return (
        per_label.groupBy("cluster")
        .agg(
            F.sum("n").alias("size"),
            F.max_by(F.col("label"), F.struct("n", (-F.col("label")).alias("t"))).alias(
                "majority_label"
            ),
            (F.max("n") / F.sum("n")).alias("purity"),
            (F.sum("sd") / F.sum("n")).alias("mean_sq_dist"),
        )
    )


KMEANS_CLUSTER_PROFILE_SQL = f"""
WITH assign AS ({KMEANS_ASSIGNMENTS_SQL}),
per_label AS (
  SELECT a.cluster, e.label::BIGINT AS label,
         count(*)::BIGINT AS n, sum(a.sq_dist)::BIGINT AS sd
  FROM assign a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
), ranked AS (
  SELECT cluster, label, n,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY n DESC, label ASC) AS rk,
         sum(n) OVER (PARTITION BY cluster) AS size,
         sum(sd) OVER (PARTITION BY cluster) AS sdt,
         max(n) OVER (PARTITION BY cluster) AS mx
  FROM per_label
)
SELECT cluster, size::BIGINT AS size, label AS majority_label,
       mx / size AS purity,
       sdt / size AS mean_sq_dist
FROM ranked WHERE rk = 1
"""
