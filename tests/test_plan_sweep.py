"""Whole-surface plan sweep: structural anti-patterns are banned across
EVERY queries() entry, not just the hand-pinned ones in test_plans.py.

- CartesianProduct: never acceptable (a BroadcastNestedLoopJoin with a
  tiny build side is the sanctioned form for scalar pins / kNN scoring).
- BatchEvalPython (row-at-a-time Python UDF): never on any plan; the
  only Python allowed on workers is Arrow-batched (mapInPandas ->
  MapInPandas / FlatMapGroupsInPandas nodes).
- BroadcastNestedLoopJoin: allowed only for the documented tiny-side
  patterns; everything else must be an equi-join.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# EXACTLY the queries whose plan carries a BNLJ today, each a documented
# tiny-build-side shape (1-row scalar pin, broadcast query/centroid side
# against a streamed corpus, or a literal band table). Adding a BNLJ to
# any other query — or a new one here without a docstring rationale —
# fails the sweep.
BNLJ_ALLOWED = {
    "ann_recall_report",  # offline diagnostic; broadcast ground-truth side
    "ann_recall_trained_vs_seed",  # composes knn_bruteforce ground truth
    "ann_recall_clustered",  # same composition over the clustered corpus
    "ann_probe_cost_clustered",  # candidate-count twin of the A/B
    "ann_recall_nprobe_sweep",  # six probe-budget variants of the A/B
    "ann_recall_ivfpq",  # composes the guarded brute-force ground truth
    "ann_recall_ivfpq_trained",  # same composition, trained codebooks
    # (ivf_pq_knn / ivfpq_cost_report / pq_train_error_ab stay
    # BNLJ-free: cell equi-joins + codebook literals only)
    "bm25_scores",  # 1-row avgdl scalar pin
    "incremental_bm25_search",  # same 1-row avgdl pin, index-served
    "embedding_neardup_exact",  # guarded O(n²) baseline, broadcast side
    "idle_rich_customers",  # avg-balance scalar pin (plans/setops.py)
    "ivf_knn",  # 8 broadcast centroids
    "knn_bruteforce",  # broadcast query side, streamed corpus
    # broadcast 10-query code side against the streamed int-code corpus;
    # the per-pair work is two XOR+popcounts, the float pass is pool-only
    "bitq_knn",
    # same shape, 16-dim prefix instead of bit codes; full-dim pass is
    # pool-only
    "mrl_knn",
    "knn_classify",  # composes knn_bruteforce
    "parts_price_band_join",  # literal band table broadcast
    "q11_important_stock",  # HAVING-over-global scalar pin
    "q22_sales_opportunity",  # avg-balance scalar pin
    "source_quality_report",  # corpus-stat scalar pin
    "customer_rfm_segments",  # 1-row corpus-max-date scalar pin
    "hybrid_search_rrf",  # 1-row avgdl scalar pin (same as bm25_scores)
    # 5-phi x <=64-bucket literal grid: every phi scans the cumulative
    # histogram — the cross product IS the quantile lookup and is
    # bounded by HQ_PHIS x HQ_BUCKETS, corpus-size-independent.
    "value_quantile_sketch",
    # |segments| x |nations| grid densification (~125 rows): Catalyst
    # folds the constant-key equi-join back to a nested loop; the cross
    # product is the intent and is bounded by category cardinality.
    "segment_nation_contingency",
}


@pytest.fixture(scope="module")
def all_plans(spark):
    plans = {}
    for name, fn in entry_mod.queries().items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        plans[name] = buf.getvalue()
    return plans


def test_no_cartesian_products_anywhere(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"cartesian products in: {offenders}"


def test_no_row_at_a_time_python_udfs(all_plans):
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert offenders == [], f"row-at-a-time Python UDFs in: {offenders}"


def test_bnlj_only_where_documented(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == [], f"undocumented BNLJ in: {offenders}"
