"""Physical-plan audit: pin the plan properties that make the headline
queries scale — predicate pushdown to the parquet scan, column pruning,
broadcast joins for dimension lookups, and the intended join strategies.
A regression here (e.g. a filter that stops pushing, a dim join that
falls back to sort-merge) is a 100 TB performance bug even when results
stay correct, so it fails the suite.

Plans only — nothing is executed; runs against the sf0.001 parquet.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = entry_mod.queries()

    def plan(name: str) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, SF_DIR).explain("formatted")
        return buf.getvalue()

    return plan


def test_q1_filter_pushed_and_columns_pruned(plans):
    p = plans("q1_pricing_summary")
    # Catalyst must rewrite to_date(l_shipdate) <= d into a raw-column
    # range predicate the parquet reader can evaluate on row-group stats.
    assert "LessThan(l_shipdate" in p
    # Projection pruning: the 11-column lineitem scan must not read keys.
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]
    assert "HashAggregate" in p


def test_q5_all_dim_joins_broadcast(plans):
    p = plans("q5_revenue_by_nation")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    # The date-range filter reaches the orders scan.
    assert "GreaterThanOrEqual(o_orderdate" in p


def test_fact_lineitem_date_joins_broadcast(plans):
    p = plans("fact_lineitem")
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_late_shipment_uses_semi_join(plans):
    p = plans("late_shipment_orders")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_knn_bruteforce_is_broadcast_nested_loop(plans):
    # Intended: tiny query side broadcast against the streaming corpus;
    # anything else (a real cartesian shuffle) is a plan regression.
    p = plans("knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in p


def test_window_queries_single_shuffle(plans):
    # The running-window query should shuffle once on o_custkey and
    # evaluate all four frames in window nodes over that one exchange.
    p = plans("customer_order_running")
    assert "Window" in p
    assert p.count("hashpartitioning(") == 1


def test_asof_single_shuffle_no_join(plans):
    # The as-of join must compile to union + window — no join operator,
    # one hash exchange on the key.
    p = plans("purchases_asof_view")
    assert "Union" in p and "Window" in p
    assert "Join" not in p
    assert p.count("hashpartitioning(") == 1


def test_events_hourly_partial_aggregation(plans):
    # Map-side partial agg before the shuffle: two HashAggregate nodes.
    p = plans("events_hourly")
    assert p.count("HashAggregate") >= 2


def test_q10_broadcasts_dims_and_pushes_filters(plans):
    p = plans("q10_returned_revenue")
    # returnflag filter reaches the lineitem scan; date range reaches orders
    assert "EqualTo(l_returnflag,R)" in p
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_tfidf_df_join_broadcasts(plans):
    # The vocabulary-sized document-frequency side must broadcast; the
    # corpus-sized term relation must never be on a build side.
    p = plans("tfidf_top_terms")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_dataset_splits_no_shuffle(plans):
    # Pure narrow projection: no exchange anywhere.
    p = plans("dataset_splits")
    assert "Exchange" not in p


def test_large_volume_orders_aggregates_before_joins(plans):
    p = plans("large_volume_orders")
    # customer enrichment broadcasts; no sort-merge on a dimension
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # the quantity aggregate is map-side partial (shuffle carries one
    # row per orderkey per partition, not one per lineitem)
    assert "partial_sum(cast(l_quantity" in p


def test_nation_year_profit_broadcasts_small_dims(plans):
    p = plans("nation_year_profit")
    # supplier and nation ride broadcast joins; the only shuffles are the
    # two big-side equi-joins (orderkey, partkey) and the final aggregate
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_customer_order_distribution_left_join_preserved(plans):
    p = plans("customer_order_distribution")
    # the LEFT join must survive optimization (zero-order customers count)
    assert "LeftOuter" in p


def test_nation_pair_trade_inequality_is_residual(plans):
    p = plans("nation_pair_trade")
    # the nation inequality must be a filter/residual on equi-joined
    # rows, never a nested-loop join condition
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert p.count("BroadcastHashJoin") >= 3


def test_supplier_diversity_anti_join_before_big_join(plans):
    p = plans("supplier_diversity")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_doc_chunks_is_narrow(plans):
    # chunking must stay a single map stage — no exchange anywhere
    p = plans("doc_chunks")
    assert "Exchange" not in p


def test_contamination_and_curation_never_nested_loop(plans):
    for q in ("contamination_check", "corpus_curation"):
        p = plans(q)
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, q


def test_gapfill_single_raw_scan(plans):
    # the dense grid is GENERATED from the span aggregate, and the
    # hourly pre-aggregate is cached — its three consumers must read the
    # cache (InMemoryTableScan), not re-derive the parquet subtree. The
    # formatted explain reprints the cached subtree under each cache
    # read, so count cache READS, not scan strings.
    p = plans("events_gapfill")
    assert p.count("InMemoryTableScan") >= 3
    assert "Generate" in p  # sequence() explode builds the grid


def test_fulfillment_snapshot_one_wide_join(plans):
    p = plans("order_fulfillment_snapshot")
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p


def test_transition_matrix_broadcast_normalizer(plans):
    p = plans("event_transition_matrix")
    # the 25-row totals join must broadcast, and the lag window implies
    # exactly one user_id shuffle for the pair build
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_similar_names_is_blocked_equi_join(plans):
    # the brand block key must plan as an equi-join (hash or sort-merge);
    # an unblocked fuzzy join would surface as BNLJ/cartesian.
    p = plans("similar_part_names")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_trailing_window_single_shuffle(plans):
    p = plans("user_trailing_window")
    assert p.count("hashpartitioning(") == 1
    assert "Window" in p


def test_pq_assignment_broadcasts_codebook(plans):
    """PQ encoding must ship the 64-row codebook to the vectors, never
    shuffle the corpus against it; the only exchange is the per-vector
    argmin window."""
    p = plans("pq_codes")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_bloom_probe_broadcasts_filter_words(plans):
    """The probe side joins the 66-word bloom table broadcast; the fact
    side must not shuffle before the pruning decision."""
    p = plans("bloom_semijoin_prune")
    assert p.count("BroadcastHashJoin") >= 2  # bloom words + truth dim
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_zorder_is_scan_project_aggregate(plans):
    """Z-values are pure per-row integer expressions: one scan, one
    hash aggregate, no joins at all."""
    p = plans("zorder_locality_stats")
    assert "Join" not in p
    # formatted explain lists each node twice (tree + detail): 1 scan
    assert p.count("Scan parquet") == 2


def test_weighted_sample_uses_topk_not_global_sort(plans):
    """Priority sampling compiles to TakeOrderedAndProject (partition
    heaps + K-row merge), not a full Sort + Limit."""
    p = plans("weighted_doc_sample")
    assert "TakeOrderedAndProject" in p


def test_incremental_rollup_two_scans_no_join(plans):
    """Partial-aggregate maintenance is two filtered scans and a merge
    aggregate — no join anywhere."""
    p = plans("incremental_hourly_rollup")
    assert "Join" not in p
    # formatted explain lists each node twice (tree + detail): 2 scans
    assert p.count("Scan parquet") == 4
