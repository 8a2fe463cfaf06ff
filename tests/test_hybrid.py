"""Hybrid BM25+vector retrieval with RRF fusion (operators/hybrid.py).
The oracle twin pins exact values; these pin the fusion contract."""

from __future__ import annotations

from de_final_project_spark.operators import hybrid as hy
from de_final_project_spark.operators.similarity import N_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_fusion_contract(spark):
    rows = hy.hybrid_search_rrf(spark, SF_DIR).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= hy.HYBRID_TOP_K
        for r in rs:
            # at least one arm proposed the candidate, never the query
            # itself, and the score is exactly the RRF arithmetic
            assert r["t_rank"] is not None or r["v_rank"] is not None
            assert r["cand_id"] != q
            want = 0.0
            if r["t_rank"] is not None:
                want += 1.0 / (hy.RRF_K + r["t_rank"])
            if r["v_rank"] is not None:
                want += 1.0 / (hy.RRF_K + r["v_rank"])
            assert r["rrf_score"] == want
        # ranking is (score desc, cand asc)
        key = [(-r["rrf_score"], r["cand_id"]) for r in rs]
        assert key == sorted(key)


def test_both_arm_hit_beats_equal_single_arm(spark):
    """RRF's point: a candidate ranked r by BOTH arms strictly beats a
    candidate ranked r by one arm only."""
    rows = hy.hybrid_search_rrf(spark, SF_DIR).collect()
    both = [r for r in rows if r["t_rank"] and r["v_rank"]]
    assert both, "corpus produces no dual-arm hits — weak scenario"
    for b in both:
        singles = [
            r
            for r in rows
            if r["query_id"] == b["query_id"]
            and (r["t_rank"] is None) != (r["v_rank"] is None)
            and (r["t_rank"] or r["v_rank"]) >= min(b["t_rank"], b["v_rank"])
        ]
        for s in singles:
            assert b["rrf_score"] > s["rrf_score"]


def test_text_arm_queries_by_rarest_terms(spark):
    """Each query's term set has HYBRID_Q_TERMS terms and never exceeds
    the global df of any term it skipped (rarest-first selection)."""
    import pyspark.sql.functions as F

    from de_final_project_spark.functions.text import tokens
    from de_final_project_spark.sources.readers import read_testdata

    docs = read_testdata(spark, SF_DIR, "documents")
    doc_terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).distinct()
    dfc = {r["term"]: r["df"] for r in doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()}
    q0_terms = [
        r["term"]
        for r in doc_terms.where(F.col("doc_id") == 0).collect()
    ]
    chosen = sorted(q0_terms, key=lambda t: (dfc[t], t))[: hy.HYBRID_Q_TERMS]
    # the chosen set is exactly the df-then-term minimum
    arm = hy._text_arm(spark, SF_DIR)
    assert arm.where(F.col("query_id") == 0).count() > 0
    assert len(chosen) == hy.HYBRID_Q_TERMS
