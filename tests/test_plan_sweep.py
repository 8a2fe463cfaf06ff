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

# Queries whose BNLJ is the documented intended shape (1-row scalar pin
# or broadcast query/centroid side against a streamed corpus).
BNLJ_ALLOWED = {
    "knn_bruteforce",
    "embedding_neardup_exact",
    "knn_lsh_candidates",
    "ivf_knn",
    "ann_recall_report",
    "embedding_label_centroids",
    "incremental_neardup",
    "embedding_quantize",
    "knn_classify",
    "q11_important_stock",
    "q15_top_supplier",
    "q22_sales_opportunity",
    "cms_heavy_hitters",
    "unigram_logprob_scores",
    "top_pmi_bigrams",
    "bm25_scores",
    "quantity_percentiles",
    "approx_distinct_users",
    "source_quality_report",
    "repetition_report",
    "quality_gate",
    "corpus_curation",
    "contamination_check",
    "sequence_packing",
    "packing_efficiency",
    "dedup_method_agreement",
    "source_overlap_neardup",
    "cross_source_dupes",
    "doc_length_histogram",
    "customer_value_tiles",
    "tfidf_top_terms",
    "idle_rich_customers",  # avg-balance scalar pin (plans/setops.py)
    "parts_price_band_join",  # literal band table broadcast (plans/temporal.py)
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
