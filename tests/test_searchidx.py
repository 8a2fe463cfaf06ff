"""Incremental posting index (operators/searchidx.py): the maintenance
paths the driver query (insert-only feed) doesn't exercise — updates
tombstoning dropped terms, deletes removing a doc's postings and length,
and served-BM25 equivalence with the batch expression after churn."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_final_project_spark.operators.searchidx import IncrementalPostingIndex
from de_final_project_spark.operators.txlog import VersionedTable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def setup(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "docs"))
    t.overwrite(
        _docs(
            spark,
            [
                (1, "spark join hash join"),
                (2, "hash table scan"),
                (3, "window agg sort"),
            ],
        )
    )
    idx = IncrementalPostingIndex(t, str(tmp_path / "idx"))
    r = idx.refresh(spark)
    assert r["mode"] == "build" and r["tokenized_docs"] == 3
    return t, idx


def _postings_of(spark, idx, doc_id):
    return {
        (r.term, r.tf)
        for r in idx.postings.read(spark).where(F.col("doc_id") == doc_id).collect()
    }


def test_build_postings_and_lengths(spark, setup):
    t, idx = setup
    assert _postings_of(spark, idx, 1) == {("spark", 1), ("join", 2), ("hash", 1)}
    dls = {r.doc_id: r.dl for r in idx.doclens.read(spark).collect()}
    assert dls == {1: 4, 2: 3, 3: 3}


def test_update_tombstones_dropped_terms(spark, setup):
    t, idx = setup
    # doc 1 loses 'spark' and one 'join', gains 'scan'
    t.merge(spark, _docs(spark, [(1, "join hash scan")]), ["doc_id"])
    r = idx.refresh(spark)
    assert r["mode"] == "delta" and r["tokenized_docs"] == 1
    assert _postings_of(spark, idx, 1) == {("join", 1), ("hash", 1), ("scan", 1)}
    dls = {r_.doc_id: r_.dl for r_ in idx.doclens.read(spark).collect()}
    assert dls[1] == 3


def test_delete_removes_doc_everywhere(spark, setup):
    t, idx = setup
    t.delete_where(spark, "doc_id = 2")
    r = idx.refresh(spark)
    assert r["mode"] == "delta"
    assert _postings_of(spark, idx, 2) == set()
    assert 2 not in {r_.doc_id for r_ in idx.doclens.read(spark).collect()}
    # served BM25 no longer surfaces doc 2 for a query it used to match
    got = {r_.doc_id for r_ in idx.bm25_topk(spark, ("hash",), 10).collect()}
    assert 2 not in got and 1 in got


def test_served_bm25_equals_batch_expression_after_churn(spark, setup):
    """After an update AND a delete, index-served BM25 equals the batch
    expression computed fresh over the surviving corpus."""
    t, idx = setup
    t.merge(spark, _docs(spark, [(1, "join hash scan")]), ["doc_id"])
    t.delete_where(spark, "doc_id = 3")
    idx.refresh(spark)

    from de_final_project_spark.functions.text import tokens
    from de_final_project_spark.operators.corpusops import BM25_B, BM25_K1

    docs = t.read(spark)
    n_docs = docs.count()
    q = ("join", "hash")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    qtf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*q))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom
    want = {
        (r.doc_id, r.bm25)
        for r in qtf.join(dfc, "term")
        .join(dl, "doc_id")
        .crossJoin(avgdl)
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .collect()
    }
    got = {
        (r.doc_id, r.bm25) for r in idx.bm25_topk(spark, q, 10).collect()
    }
    assert got == want


def test_noop_and_monotone_txn(spark, setup):
    t, idx = setup
    assert idx.refresh(spark)["mode"] == "noop"
    v = idx.applied_version()
    t.append(_docs(spark, [(9, "spark spark")]))
    assert idx.refresh(spark)["mode"] == "delta"
    assert idx.applied_version() > v


def test_bucket_layout_prunes_scans_and_rewrites(spark, setup):
    """Round-11 scale pin: the term-bucket partitioning must make (a) a
    small batch's refresh rewrite ONLY the buckets its terms hash to,
    and (b) a term lookup a partition-pruned read — 'O(churn) refresh'
    for scan volume, not just compute."""
    from de_final_project_spark.operators.searchidx import term_bucket

    t, idx = setup
    e0 = idx.postings._read_entry(idx.postings.latest_version())["live"]
    assert len(e0) > 1  # the seed corpus spreads over multiple buckets
    t.append(_docs(spark, [(9, "zebra zebra")]))
    r = idx.refresh(spark)
    assert r["tokenized_docs"] == 1
    e1 = idx.postings._read_entry(idx.postings.latest_version())["live"]
    changed = {p for p in e1 if e0.get(p) != e1[p]} | {
        p for p in e0 if p not in e1
    }
    assert changed == {str(term_bucket("zebra"))}
    # Spark-side tbucket equals the driver-side twin for every term
    for row in idx.postings.read(spark).collect():
        assert row.tbucket == term_bucket(row.term), row.term
    # a query read prunes to its terms' buckets (log metadata only)
    rep = idx.postings.prune_report(
        "tbucket IN (%d)" % term_bucket("zebra")
    )
    assert rep["partitions_scanned"] == 1
    assert rep["partitions_total"] == len(e1) > 1
    # and the pruned serve returns the right answer
    got = {r_.doc_id for r_ in idx.bm25_topk(spark, ("zebra",), 5).collect()}
    assert got == {9}


def test_lifecycle_bounded_files_over_many_refreshes(spark, setup):
    """VERDICT r11 item 5: a long-lived index must not fragment. Drive
    20 append refreshes; the post-refresh auto_compact policy must keep
    every live set bounded (per-partition for the bucketed postings,
    per-pointer for the unpartitioned doclens), and the served answer
    must stay byte-identical to a fresh-index recompute across the
    compaction commits it triggers."""
    import os

    t, idx = setup

    def live_file_counts(table):
        head = table.latest_version()
        entry = table._read_entry(head)["live"]
        out = {}
        from de_final_project_spark.operators.txlog import _ptrs

        for p, e in entry.items():
            n = 0
            for ptr in _ptrs(e):
                if ptr.get("files") is not None:
                    n += len(ptr["files"])
                else:
                    d = os.path.join(
                        table.path, ptr["commit_dir"], ptr["part_dir"]
                    )
                    n += sum(
                        1 for f in os.listdir(d) if f.endswith(".parquet")
                    )
            out[p] = n
        return out

    for i in range(20):
        t.append(
            _docs(
                spark,
                [(100 + i, f"join scan w{i} shared hash term{i % 3}")],
            )
        )
        r = idx.refresh(spark)
        assert r["mode"] == "delta" and r["tokenized_docs"] == 1
    # bounded live sets: the policy threshold is 8 files
    for table in (idx.postings, idx.doclens):
        counts = live_file_counts(table)
        assert counts and max(counts.values()) < 8, (
            table.path,
            counts,
        )
    # r12: insert-only windows land as pointer-list APPENDS (no
    # touched-bucket rewrite), so on a 20-append diet the live sets are
    # bounded BY the auto_compact policy — it must actually fire, and
    # the bound assertions above prove it kept every set under the
    # threshold. (Pre-r12 the MERGE rewrote pointers wholesale and the
    # policy never engaged here; that regime is gone by design.)
    ops = [h["op"] for h in idx.doclens.history()]
    assert "compact" in ops or "compact_parts" in ops, ops
    # answers byte-identical across the compactions: a fresh index over
    # the same docs head serves the same postings/doclens relations
    fresh = IncrementalPostingIndex(t, idx.postings.path + "_fresh")
    fresh.refresh(spark)
    got = {
        (r_.doc_id, r_.term, r_.tf)
        for r_ in idx.postings.read(spark).collect()
    }
    want = {
        (r_.doc_id, r_.term, r_.tf)
        for r_ in fresh.postings.read(spark).collect()
    }
    assert got == want
    got_dl = {
        (r_.doc_id, r_.dl) for r_ in idx.doclens.read(spark).collect()
    }
    want_dl = {
        (r_.doc_id, r_.dl) for r_ in fresh.doclens.read(spark).collect()
    }
    assert got_dl == want_dl
    # and the served top-k matches too
    served = [
        (r_.doc_id, r_.bm25)
        for r_ in idx.bm25_topk(spark, ("join", "hash")).collect()
    ]
    fresh_served = [
        (r_.doc_id, r_.bm25)
        for r_ in fresh.bm25_topk(spark, ("join", "hash")).collect()
    ]
    assert served == fresh_served


def test_insert_only_refresh_commits_append(spark, setup):
    """r12 optimization pin: an all-append docs window commits the new
    postings/doclens as pointer-list APPENDs (no touched-bucket
    rewrite), and the served BM25 state matches the batch recompute
    (covered by the equality test above; here we pin the commit op)."""
    t, idx = setup
    t.append(_docs(spark, [(11, "quasar quasar pulsar")]))
    r = idx.refresh(spark)
    assert r["mode"] == "delta"
    assert [h["op"] for h in idx.postings.history()][-1] == "append"
    assert [h["op"] for h in idx.doclens.history()][-1] == "append"
    # postings for the new doc are served through the pointer list
    got = {r_.doc_id for r_ in idx.bm25_topk(spark, ("quasar",), 5).collect()}
    assert got == {11}


def test_duplicate_key_append_fails_loudly(spark, tmp_path):
    """r13 hardening (VERDICT r12 item 4): the insert-only fast path
    rests on the unique-keyed producer contract — an append that
    re-carries an EXISTING doc_id must raise, never silently duplicate
    posting/doclen rows. With the probe conf off, the fast path is the
    producer's responsibility again (documented escape hatch)."""
    t = VersionedTable(str(tmp_path / "docs"))
    t.overwrite(_docs(spark, [(1, "alpha beta"), (2, "beta gamma")]))
    idx = IncrementalPostingIndex(t, str(tmp_path / "idx"))
    assert idx.refresh(spark)["mode"] == "build"
    # doc_id 2 already indexed: contract violation
    t.append(_docs(spark, [(2, "beta gamma delta"), (3, "delta")]))
    with pytest.raises(ValueError, match="unique-keyed producer"):
        idx.refresh(spark)
    # trusted-producer escape hatch: probe off -> no raise
    spark.conf.set("spark.de_final_project.verifyInsertOnlyKeys", "false")
    try:
        assert idx.refresh(spark)["mode"] == "delta"
    finally:
        spark.conf.unset("spark.de_final_project.verifyInsertOnlyKeys")
