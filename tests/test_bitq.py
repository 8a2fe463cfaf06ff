"""Binary (sign-bit) quantization ANN tier — operators/bitq.py.

Pins the three contracts the oracle can't see directly:
- the PACKED codes really are the per-dimension sign bits (numpy replay),
- packed-XOR-popcount Hamming == per-dimension sign-mismatch count (the
  identity the DuckDB oracle relies on),
- recall@k vs the brute-force truth clears the measured floor at the
  shipped pool size.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators import bitq
from de_final_project_spark.operators.similarity import TOP_K, _bruteforce_topk
from de_final_project_spark.sources.readers import read_testdata

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        read_testdata(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .cache()
    )


def _np_codes(vec: list[float]) -> tuple[int, int]:
    bits = [1 if x >= 0 else 0 for x in vec]
    pack = lambda half: int("".join(map(str, half)), 2)  # noqa: E731
    return pack(bits[:32]), pack(bits[32:])


def test_bit_codes_match_numpy_replay(emb):
    rows = bitq.bit_codes(emb).join(emb, "vec_id").limit(20).collect()
    assert rows
    for r in rows:
        lo, hi = _np_codes(list(r.embedding))
        assert (r.code_lo, r.code_hi) == (lo, hi), f"vec {r.vec_id}"


def test_codes_fit_unsigned_32(emb):
    import pyspark.sql.functions as F

    agg = bitq.bit_codes(emb).agg(
        F.min("code_lo"), F.max("code_lo"), F.min("code_hi"), F.max("code_hi")
    ).first()
    assert min(agg) >= 0 and max(agg) < 2**32


def test_hamming_equals_sign_mismatch_count(emb):
    """The identity the oracle uses: bit_count(xor(codes)) == number of
    dims where the signs differ."""
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.limit(30).collect()}
    out = bitq._bitq_topk(emb).collect()
    checked = 0
    for r in out:
        if r.query_id in vecs and r.neighbor_id in vecs:
            a, b = vecs[r.query_id] >= 0, vecs[r.neighbor_id] >= 0
            assert r.hamming == int((a != b).sum())
            checked += 1
    assert checked > 0


def test_recall_floor_at_shipped_pool_size(emb):
    truth = {
        (r.query_id, r.neighbor_id) for r in _bruteforce_topk(emb).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in bitq._bitq_topk(emb).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@{TOP_K} {recall} below floor at pool {bitq.CANDIDATES}"


def test_mrl_recall_floor_and_prefix_semantics(emb):
    """The truncated-prefix tier: recall@k >= 0.9 at the shipped
    (dim, pool) point, and pre_sim really is the cosine of the leading
    MRL_DIM dims (numpy replay on sampled rows)."""
    truth = {
        (r.query_id, r.neighbor_id) for r in _bruteforce_topk(emb).collect()
    }
    out = bitq._mrl_topk(emb).collect()
    got = {(r.query_id, r.neighbor_id) for r in out}
    assert len(truth & got) / len(truth) >= 0.9
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    checked = 0
    for r in out[:30]:
        a = vecs[r.query_id][: bitq.MRL_DIM]
        b = vecs[r.neighbor_id][: bitq.MRL_DIM]
        want = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert abs(r.pre_sim - round(want, 6)) <= 1e-6
        checked += 1
    assert checked > 0


def test_output_shape_and_rank_contract(spark, emb):
    df = bitq.bitq_knn(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "query_id",
        "rank",
        "neighbor_id",
        "hamming",
        "cosine_sim",
    ]
    rows = df.collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, TOP_K + 1)), q


def test_ivf_bitq_composition_recall_and_cell_contract(spark, emb):
    """Round-11 composed tier: (a) results only come from the query's
    probed cells (the inverted-list contract), (b) recall@k vs brute
    force clears a floor, and (c) recall is within reach of the FLAT
    bitq tier (the composition trades a bounded recall delta for an
    nprobe/K scan fraction)."""
    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.operators.similarity import N_PROBE

    out = bitq.ivf_bitq_knn(spark, SF_DIR).cache()
    truth = {
        (r.query_id, r.neighbor_id) for r in _bruteforce_topk(emb).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    recall = len(truth & got) / len(truth)
    flat = {
        (r.query_id, r.neighbor_id)
        for r in bitq.bitq_knn(spark, SF_DIR).collect()
    }
    flat_recall = len(truth & flat) / len(truth)
    assert recall >= 0.7, f"composed recall@{TOP_K} {recall}"
    assert recall >= flat_recall - 0.25, (recall, flat_recall)
    # cell contract: every returned neighbor sits in a probed cell
    qdf, centroids = km.train_kmeans(spark, SF_DIR)
    cell_of = {
        r.vec_id: r.cell for r in km.assign_cells(qdf, centroids).collect()
    }
    probed = {
        (r.query_id, r.cell)
        for r in km.with_centroids(
            qdf.where(F.col("vec_id") < 10), centroids
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(km.cells_by_dist(), 1, N_PROBE)).alias("p"),
        )
        .select("query_id", F.col("p")["j"].alias("cell"))
        .collect()
    }
    for q, n in got:
        assert (q, cell_of[n]) in probed, (q, n)
    out.unpersist()


def test_ivf_mrl_composition_recall_and_cell_contract(spark, emb):
    """Round-11 composed MRL tier: same three pins as the 1-bit
    composition — probed-cell containment, a recall floor vs brute
    force, and a bounded recall delta vs the FLAT mrl tier."""
    from de_final_project_spark.operators import kmeans as km
    from de_final_project_spark.operators.similarity import N_PROBE

    out = bitq.ivf_mrl_knn(spark, SF_DIR).cache()
    truth = {
        (r.query_id, r.neighbor_id) for r in _bruteforce_topk(emb).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    recall = len(truth & got) / len(truth)
    flat = {
        (r.query_id, r.neighbor_id)
        for r in bitq.mrl_knn(spark, SF_DIR).collect()
    }
    flat_recall = len(truth & flat) / len(truth)
    assert recall >= 0.7, f"composed recall@{TOP_K} {recall}"
    assert recall >= flat_recall - 0.25, (recall, flat_recall)
    qdf, centroids = km.train_kmeans(spark, SF_DIR)
    cell_of = {
        r.vec_id: r.cell for r in km.assign_cells(qdf, centroids).collect()
    }
    probed = {
        (r.query_id, r.cell)
        for r in km.with_centroids(
            qdf.where(F.col("vec_id") < 10), centroids
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(km.cells_by_dist(), 1, N_PROBE)).alias("p"),
        )
        .select("query_id", F.col("p")["j"].alias("cell"))
        .collect()
    }
    for q, n in got:
        assert (q, cell_of[n]) in probed, (q, n)
    out.unpersist()
