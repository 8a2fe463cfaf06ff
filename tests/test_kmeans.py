"""Exact fixed-point k-means: primitive semantics + corpus invariants
(the oracle twin pins exact values; these pin the algorithm's shape)."""

from __future__ import annotations

import pyspark.sql.functions as F

from de_final_project_spark.operators import kmeans as km

SF_DIR = "/root/testdata/sf0.001"


def test_best_picks_argmin_with_tiebreak(spark):
    qdf = spark.createDataFrame(
        [(0, [0, 0]), (1, [10, 0]), (2, [5, 0])], "vec_id long, q array<long>"
    )
    # centroids on the *SCALE grid: cluster 0 at q=(0,0), cluster 1 at
    # q=(10,0); q=(5,0) is EQUIDISTANT -> tie breaks to cluster 0.
    c = [[0, 0], [10 * km.SCALE, 0]]
    got = {r["vec_id"]: r["cluster"] for r in km._assign(qdf, c).collect()}
    assert got == {0: 0, 1: 1, 2: 0}


def test_assignments_cover_corpus_exactly_once(spark):
    out = km.kmeans_assignments(spark, SF_DIR).cache()
    from de_final_project_spark.sources.readers import read_testdata

    n = read_testdata(spark, SF_DIR, "embeddings").count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    bad = out.where(
        (F.col("cluster") < 0)
        | (F.col("cluster") >= km.K_CLUSTERS)
        | (F.col("sq_dist") < 0)
    )
    assert bad.count() == 0
    # the trained clustering is non-degenerate: more than one cluster
    assert out.select("cluster").distinct().count() > 1
    out.unpersist()


def test_cluster_profile_consistency(spark):
    prof = km.kmeans_cluster_profile(spark, SF_DIR).collect()
    from de_final_project_spark.sources.readers import read_testdata

    n = read_testdata(spark, SF_DIR, "embeddings").count()
    assert sum(r["size"] for r in prof) == n
    for r in prof:
        assert 0 < r["purity"] <= 1.0
        assert r["mean_sq_dist"] >= 0
        assert 0 <= r["majority_label"] <= 9


def test_ivf_trained_candidates_respect_cells(spark):
    """Trained-IVF results must (a) be top-k-shaped per query, and
    (b) only contain neighbors whose trained cell is among the query's
    probed cells — the inverted-list contract."""
    from de_final_project_spark.operators.similarity import (
        TOP_K,
        ivf_knn_trained,
    )

    out = ivf_knn_trained(spark, SF_DIR).cache()
    assigned = km.kmeans_assignments(spark, SF_DIR).select(
        "vec_id", "cluster"
    ).cache()
    cell_of = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    per_q: dict[int, list] = {}
    for r in out.collect():
        assert 1 <= r["rank"] <= TOP_K
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rows in per_q.items():
        # ranks are dense from 1 and sims non-increasing
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        sims = [r["cosine_sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        # every neighbor shares one of at most N_PROBE distinct cells
        from de_final_project_spark.operators.similarity import N_PROBE

        cells = {cell_of[r["neighbor_id"]] for r in rows}
        assert len(cells) <= N_PROBE
    out.unpersist()
    assigned.unpersist()


def test_assignment_is_partition_invariant(spark):
    """The whole point of the fixed-point formulation: a different input
    partitioning yields the bit-identical clustering."""
    a = {tuple(r) for r in km.kmeans_assignments(spark, SF_DIR).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = {tuple(r) for r in km.kmeans_assignments(spark, SF_DIR).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_clustered_ab_trained_beats_seed(spark):
    """The clustered corpus exists to let the trained quantizer show its
    advantage (VERDICT r6 item 4): on a corpus whose first N_CELLS
    vectors are all one micro-cluster, macro recall@k for trained cells
    must strictly beat seed cells. (Measured: 1.00 vs 0.40.)"""
    import pyspark.sql.functions as F

    from de_final_project_spark.operators.similarity import (
        ann_recall_clustered,
    )

    rows = (
        ann_recall_clustered(spark, "/root/testdata/sf0.001")
        .groupBy("method")
        .agg(F.avg("recall_at_k").alias("r"))
        .collect()
    )
    macro = {r["method"]: r["r"] for r in rows}
    assert macro["ivf_trained"] > macro["ivf_seed"] + 0.2
    assert macro["ivf_trained"] >= 0.9


def test_clustered_ab_trained_scans_fewer_candidates(spark):
    """Scan-volume side of the A/B: trained cells must reach their
    higher recall while scanning STRICTLY fewer candidates per query
    than the seed cells (measured: 11.0 vs 124.6 at sf0.001) — recall
    and cost must both favor the trained quantizer or the 'win' is a
    fat-cell artifact."""
    import pyspark.sql.functions as F

    from de_final_project_spark.operators.similarity import (
        ann_probe_cost_clustered,
    )

    rows = (
        ann_probe_cost_clustered(spark, "/root/testdata/sf0.001")
        .groupBy("method")
        .agg(F.avg("n_candidates").alias("c"))
        .collect()
    )
    mean_cost = {r["method"]: r["c"] for r in rows}
    assert mean_cost["ivf_trained"] < mean_cost["ivf_seed"]


def test_nprobe_sweep_monotone_and_trained_dominates(spark):
    """The tuning curve must be internally consistent: recall is
    monotone non-decreasing in nprobe for each method, and the trained
    quantizer's macro recall is >= the seed's at EVERY probe budget
    (strictly better at the budgets below saturation)."""
    import pyspark.sql.functions as F

    from de_final_project_spark.operators.similarity import (
        NPROBE_SWEEP,
        ann_recall_nprobe_sweep,
    )

    rows = (
        ann_recall_nprobe_sweep(spark, "/root/testdata/sf0.001")
        .groupBy("method")
        .agg(F.avg("recall_at_k").alias("r"))
        .collect()
    )
    macro = {r["method"]: r["r"] for r in rows}
    for fam in ("ivf_seed", "ivf_trained"):
        curve = [macro[f"{fam}_p{p}"] for p in NPROBE_SWEEP]
        assert curve == sorted(curve), f"{fam} recall not monotone: {curve}"
    assert all(
        macro[f"ivf_trained_p{p}"] >= macro[f"ivf_seed_p{p}"]
        for p in NPROBE_SWEEP
    )
    assert macro["ivf_trained_p1"] > macro["ivf_seed_p1"]


def test_ivfpq_pipeline_invariants(spark):
    """IVF-PQ composition on the clustered corpus: codes stay in the
    codebook range, the ADC candidate set is exactly the probed-cell
    candidate set (PQ changes RANKING, never membership), and — because
    the clustered cells are tighter than RERANK_TOP — the reranked
    top-k must equal the exact trained-IVF top-k per query."""
    from de_final_project_spark.operators import similarity as sim

    emb = sim.clustered_corpus(spark, SF_DIR)
    qdf = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: F.floor(x * km.SCALE).cast("long")
        ).alias("q"),
    ).persist()
    centroids = km.train_kmeans_frame(qdf)
    cb = sim._pq_residual_codebook(qdf, centroids)
    assert len(cb) == sim.PQ_M and all(len(b) == sim.PQ_K for b in cb)
    codes = sim._pq_encode_residuals(
        sim._residual_frame(qdf, centroids), cb
    )
    mx = codes.select(
        F.max(F.array_max("codes")).alias("mx"),
        F.min(F.array_min("codes")).alias("mn"),
    ).first()
    assert 0 <= mx["mn"] and mx["mx"] < sim.PQ_K
    adc = sim._ivfpq_candidates(qdf, centroids, cb)
    exact = sim._ivf_trained_candidates(emb, qdf, centroids)
    assert (
        {(r[0], r[1]) for r in adc.select("query_id", "neighbor_id").collect()}
        == {(r[0], r[1]) for r in exact.select("query_id", "neighbor_id").collect()}
    )
    rerank = sim._ivfpq_rerank_topk(emb, qdf, centroids, cb)
    ivf = sim._ivf_trained_topk(emb, qdf, centroids)
    assert sorted(map(tuple, rerank.collect())) == sorted(map(tuple, ivf.collect()))
    qdf.unpersist()


def test_ivfpq_cost_report_bounds_exact_evals(spark):
    from de_final_project_spark.operators import similarity as sim

    rows = sim.ivfpq_cost_report(spark, SF_DIR).collect()
    assert len(rows) == sim.N_QUERIES
    for r in rows:
        assert r["n_exact_rerank"] == min(sim.RERANK_TOP, r["n_candidates"])


def test_pq_codebook_seed_contract(spark):
    """Gapped seed ids must fail fast, same as the k-means trainer."""
    import pytest

    from de_final_project_spark.operators import similarity as sim

    qdf = spark.createDataFrame(
        [(i * 2, [0] * km.DIM) for i in range(sim.PQ_K)],
        "vec_id long, q array<long>",
    )
    with pytest.raises(ValueError, match="contiguous vec_ids"):
        sim._pq_residual_codebook(qdf, [[0] * km.DIM])


def test_pq_training_monotone_error_and_structure(spark):
    """Per-subspace Lloyd over residuals: codebook keeps its
    PQ_M x PQ_K x PQ_SUBDIM integer shape and total reconstruction
    error never increases round over round (Lloyd monotonicity — the
    invariant behind pq_train_error_ab's seed-vs-trained delta)."""
    from de_final_project_spark.operators import similarity as sim

    qdf, centroids = km.train_kmeans(spark, SF_DIR)
    seed_cb = sim._pq_residual_codebook(qdf, centroids)
    res = sim._residual_frame(qdf, centroids).persist()
    subs = sim._pq_sub_frame(res)

    def total_err(cb):
        return (
            sim._pq_sub_assign(subs, cb)
            .agg(F.sum("sq_err").alias("e"))
            .first()["e"]
        )

    errs = [total_err(seed_cb)]
    cb = seed_cb
    for _ in range(sim.PQ_TRAIN_ITERS):
        cb = sim.train_pq_codebooks(res, cb, iters=1)
        assert len(cb) == sim.PQ_M
        assert all(len(sub) == sim.PQ_K for sub in cb)
        assert all(len(cw) == sim.PQ_SUBDIM for sub in cb for cw in sub)
        errs.append(total_err(cb))
    assert all(b <= a for a, b in zip(errs, errs[1:])), errs
    assert errs[-1] < errs[0]  # training actually moved the codebooks
    res.unpersist()


def test_choose_k_pins_corpus_sizes():
    """Auto-K contract (VERDICT r9 item 2): the floor holds at the
    driver correctness scales, the ceiling at sf1."""
    assert km.choose_k(500) == 8       # sf0.01 embeddings -> floor
    assert km.choose_k(2000) == 8      # sf0.1 -> still the floor
    assert km.choose_k(2049) == 9      # first step above the floor
    assert km.choose_k(4096) == 16
    assert km.choose_k(20000) == 79    # sf1 -> uncapped past the old 64
    assert km.choose_k(256 * km.K_MAX + 1) == km.K_MAX  # driver-state cap


def test_sql_kparam_matches_choose_k():
    """The kparam CTE arithmetic (least/greatest over the integer
    ceiling) must equal choose_k for any count — positive // floors
    in DuckDB, so (n + T - 1) // T is the exact ceiling."""
    import duckdb

    t = km.TARGET_CLUSTER_SIZE
    for n in (1, 7, 500, 2000, 2048, 2049, 4096, 20000, 10**6):
        got = duckdb.sql(
            f"SELECT least({km.K_MAX}, greatest({km.K_MIN},"
            f" ({n} + {t - 1}) // {t}))"
        ).fetchone()[0]
        assert got == km.choose_k(n), n


def test_adaptive_k_trains_wider_on_larger_frame(spark):
    """A frame above the floor threshold trains choose_k(n) centroids;
    an explicit k pins it (the fixed-k twin contract)."""
    n = 2600  # choose_k -> 11
    qdf = spark.createDataFrame(
        [(i, [(i * 7 + j) % 50 for j in range(km.DIM)]) for i in range(n)],
        "vec_id long, q array<long>",
    ).repartition(8)
    trained = km.train_kmeans_frame(qdf)
    assert len(trained) == km.choose_k(n) == 11
    pinned = km.train_kmeans_frame(qdf, k=8)
    assert len(pinned) == 8


def test_train_cap_formula_and_sql_mirror():
    """train_cap = max(k, min(n, 64*k)) — and the semdedup oracle's
    scalar-subquery cap computes the identical number in DuckDB."""
    import duckdb

    from de_final_project_spark.operators.semdedup import _CAP_SQL

    for n in (500, 2000, 4096, 20000, 10**6):
        k = km.choose_k(n)
        want = max(k, min(n, km.TRAIN_POINTS_PER_CENTROID * k))
        assert km.train_cap(n, k) == want
        got = duckdb.sql(
            "WITH embeddings AS (SELECT * FROM range(%d) t(vec_id)) "
            "SELECT %s" % (n, _CAP_SQL)
        ).fetchone()[0]
        assert got == want, (n, got, want)


def test_sampled_trainer_matches_prefix_trained_centroids(spark):
    """train_kmeans_sampled == choose_k on the FULL count + Lloyd over
    the deterministic prefix — pinned against the frame trainer."""
    import de_final_project_spark.operators.kmeans as kmod

    qdf, centroids, cap = kmod.train_kmeans_sampled(
        spark, "/root/testdata/sf0.001"
    )
    n = qdf.count()
    k = kmod.choose_k(n)
    assert len(centroids) == k
    assert cap == kmod.train_cap(n, k)
    from pyspark.sql import functions as F

    want = kmod.train_kmeans_frame(qdf.where(F.col("vec_id") < cap), k=k)
    assert centroids == want

def test_k_past_old_64_ceiling_trains_and_assigns(spark):
    """Round-11 regression pin for the table-backed centroid relation:
    K ABOVE the old literal-expression ceiling (64) must train, assign
    every vector to a valid cell, and agree with a driver-side Python
    replay of the exact integer argmin on a sample — the property the
    literal-tree design could never reach."""
    k = 96
    n = 1200
    qdf = spark.createDataFrame(
        [(i, [(i * 13 + j * 5) % 80 for j in range(km.DIM)]) for i in range(n)],
        "vec_id long, q array<long>",
    ).repartition(8)
    trained = km.train_kmeans_frame(qdf, k=k)
    assert len(trained) == k
    assigned = {r["vec_id"]: r["cluster"] for r in km._assign(qdf, trained).collect()}
    assert len(assigned) == n
    assert all(0 <= c < k for c in assigned.values())
    # exact Python twin on a sample (ties to the smallest cluster id)
    for i in (0, 7, 311, 999):
        q = [(i * 13 + j * 5) % 80 for j in range(km.DIM)]
        best = min(
            (sum((qi * km.SCALE - ci) ** 2 for qi, ci in zip(q, c)), j)
            for j, c in enumerate(trained)
        )
        assert assigned[i] == best[1], i
