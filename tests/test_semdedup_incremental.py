"""Incremental SemDeDup — operators/semdedup.py IncrementalSemDedup.

Pins the contracts the DuckDB oracle cannot see directly: the FLIP path
under OUT-OF-ORDER arrival (a late smaller-id vector revokes an earlier
keep — without it incremental verdicts would depend on arrival order),
churn proportionality of the refresh report, idempotent no-op replay,
and the insert-only refusal. The driver query + oracle sign the
contiguous-arrival equality with the frozen-centroid batch recompute.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators.semdedup import IncrementalSemDedup
from de_final_project_spark.operators.txlog import VersionedTable

DIM = 64


def _vec(spec: dict[int, float]) -> list[float]:
    v = [0.0] * DIM
    for d, x in spec.items():
        v[d] = x
    return v


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(spec)) for i, spec in rows],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture()
def corpus(spark, tmp_path):
    """Build corpus: 8 mutually-orthogonal seed vectors (ids 0..7, the
    k-means seeding contract) plus id 10, near-orthogonal to every seed
    (cosine ~0.01 << 0.4 threshold) so it is KEPT at build. Ids 8 and 9
    are deliberately absent — they arrive later, out of order."""
    rows = [(i, {i: 100.0}) for i in range(8)]
    rows.append((10, {8: 100.0, 0: 1.0}))
    t = VersionedTable(str(tmp_path / "emb"))
    t.overwrite(_emb_df(spark, rows))
    return t


def test_flip_on_out_of_order_arrival(spark, tmp_path, corpus):
    idx = IncrementalSemDedup(corpus, str(tmp_path / "idx"))
    r1 = idx.refresh(spark)
    assert (r1["mode"], r1["assigned"], r1["flipped"]) == ("build", 9, 0)
    v1 = {r["vec_id"]: r["kept"] for r in idx.read_verdicts(spark).collect()}
    assert v1[10] is True  # no smaller-id neighbor over threshold yet

    # id 9 arrives LATE: same direction as id 10 (cosine ~1.0), smaller
    # id — the keep rule's canonical winner changes after the fact.
    corpus.append(_emb_df(spark, [(9, {8: 99.0, 0: 1.1})]))
    r2 = idx.refresh(spark)
    assert (r2["mode"], r2["assigned"]) == ("delta", 1), r2
    assert r2["flipped"] == 1, r2
    v2 = {r["vec_id"]: r["kept"] for r in idx.read_verdicts(spark).collect()}
    assert v2[9] is True  # its only smaller-id cluster-mates are seeds
    assert v2[10] is False  # revoked by the smaller-id near-duplicate
    assert all(v2[i] is True for i in range(8))
    # idempotent replay
    assert idx.refresh(spark)["mode"] == "noop"


def test_insert_only_contract_refuses_deletes(spark, tmp_path, corpus):
    idx = IncrementalSemDedup(corpus, str(tmp_path / "idx"))
    idx.refresh(spark)
    corpus.delete_where(spark, "vec_id = 10")
    with pytest.raises(ValueError, match="INSERT-only"):
        idx.refresh(spark)


def test_incremental_equals_batch_keep_rule(spark, tmp_path, corpus):
    """Accumulated verdicts == one-shot judgment of the SAME final
    corpus under the SAME frozen centroids (arrival boundaries must not
    matter). The one-shot side reuses the class's own build path on a
    fresh table holding the final corpus, with centroids FORCED to the
    incremental index's frozen ones by copying its centroid table."""
    idx = IncrementalSemDedup(corpus, str(tmp_path / "idx"))
    idx.refresh(spark)
    corpus.append(_emb_df(spark, [(9, {8: 99.0, 0: 1.1})]))
    corpus.append(_emb_df(spark, [(8, {7: 50.0, 6: 50.0})]))
    idx.refresh(spark)
    idx.refresh(spark)
    got = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in idx.read_verdicts(spark).collect()
    }
    # one-shot: judge the final corpus against the frozen centroids
    from de_final_project_spark.operators.kmeans import assign_cells
    from de_final_project_spark.operators.semdedup import (
        SEMDEDUP_COSINE_THRESHOLD,
    )
    from de_final_project_spark.operators.similarity import unit_vectors
    from de_final_project_spark.functions.vector import dot

    cents = idx._frozen(spark)
    full = corpus.read(spark)
    rows = (
        assign_cells(idx._quantize(full), cents, out="cluster")
        .select("vec_id", F.col("cluster").cast("long").alias("cluster"))
        .join(unit_vectors(full), "vec_id")
    )
    a = rows.select(
        F.col("vec_id").alias("a_id"), "cluster", F.col("u").alias("u_a")
    )
    b = rows.select(
        F.col("vec_id").alias("b_id"), "cluster", F.col("u").alias("u_b")
    )
    dropped = {
        r["b_id"]
        for r in a.join(b, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            F.round(dot(F.col("u_a"), F.col("u_b")), 6)
            >= SEMDEDUP_COSINE_THRESHOLD
        )
        .select("b_id")
        .distinct()
        .collect()
    }
    want = {
        (r["vec_id"], r["cluster"], r["vec_id"] not in dropped)
        for r in rows.select("vec_id", "cluster").collect()
    }
    assert got == want


def test_reinserted_vec_id_refused(spark, tmp_path, corpus):
    """ADVICE r11: a feed that re-inserts an existing vec_id would
    append a duplicate (vec_id, cluster, u) index row and inflate every
    later refresh's pair judgments while verdicts.merge upserts over
    the symptom — refresh must refuse it BEFORE any state changes."""
    idx = IncrementalSemDedup(corpus, str(tmp_path / "idx"))
    idx.refresh(spark)
    v_index = idx.index.latest_version()
    corpus.append(_emb_df(spark, [(10, {8: 100.0, 0: 1.0})]))
    with pytest.raises(ValueError, match="NEW vec_ids"):
        idx.refresh(spark)
    # no state advanced: the index table saw no commit
    assert idx.index.latest_version() == v_index


def test_drift_reoptimize_lifecycle(spark, tmp_path, corpus):
    """VERDICT r11 item 6: freeze -> drift -> re-train -> serve. A
    drifted insert cohort pushes PSI over the threshold; reoptimize
    re-trains + re-assigns + re-stamps, after which (a) the state is
    byte-identical to a FRESH build over the same corpus (the re-train
    IS the build), (b) refresh is a no-op (the stamp advanced), and
    (c) a second reoptimize reports no new data."""
    idx = IncrementalSemDedup(corpus, str(tmp_path / "idx"))
    idx.refresh(spark)
    assert idx.trained_version() == 1
    # below-threshold guard: a distribution-MATCHED arrival cohort
    # (same per-dim shape as the build corpus) does not retrain
    mirror = [(11 + i, {i: 100.0}) for i in range(8)]
    mirror.append((19, {8: 100.0, 0: 1.0}))
    corpus.append(_emb_df(spark, mirror))
    idx.refresh(spark)
    r = idx.reoptimize(spark, psi_threshold=0.2)
    assert r["retrained"] is False and r["max_psi"] < 0.2, r
    # drifted cohort: mass concentrated on a dim the build corpus
    # never used — that dim's PSI blows out even diluted by the
    # matched cohort in the same window
    drifted = [(20 + i, {40: 0.9, 41: 0.1 * (i + 1)}) for i in range(6)]
    corpus.append(_emb_df(spark, drifted))
    r2 = idx.refresh(spark)
    assert r2["mode"] == "delta" and r2["assigned"] == 6
    v_verd, v_idx = idx.verdicts.latest_version(), idx.index.latest_version()
    r3 = idx.reoptimize(spark, psi_threshold=0.2)
    assert r3["retrained"] is True and r3["max_psi"] >= 0.2, r3
    assert r3["trained_on"] == corpus.latest_version()
    # the rewrites must LAND: overwrite() skips a commit whose txn
    # stamp does not advance, and the delta refresh already stamped
    # this corpus version — a stale-stamped retrain would silently
    # serve frozen-era assignments (caught live by the driver twin)
    assert idx.verdicts.latest_version() > v_verd
    assert idx.index.latest_version() > v_idx
    # (b) pending refresh is a no-op — the txn stamp advanced
    assert idx.refresh(spark)["mode"] == "noop"
    # (c) second reoptimize: no new data
    r4 = idx.reoptimize(spark, psi_threshold=0.2)
    assert r4["retrained"] is False and r4["max_psi"] == 0.0, r4
    # (a) byte-identical to a fresh build on the same corpus
    fresh = IncrementalSemDedup(corpus, str(tmp_path / "fresh"))
    fresh.refresh(spark)
    got = {
        (r_.vec_id, r_.cluster, r_.kept)
        for r_ in idx.read_verdicts(spark).collect()
    }
    want = {
        (r_.vec_id, r_.cluster, r_.kept)
        for r_ in fresh.read_verdicts(spark).collect()
    }
    assert got == want
    got_c = [
        (r_.j, tuple(r_.c))
        for r_ in idx.cents.read(spark).orderBy("j").collect()
    ]
    want_c = [
        (r_.j, tuple(r_.c))
        for r_ in fresh.cents.read(spark).orderBy("j").collect()
    ]
    assert got_c == want_c
