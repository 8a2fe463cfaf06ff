"""Incrementally-maintained FULL-TEXT POSTING INDEX, served as BM25.

The steady-state form of text retrieval at 100 TB: tokenizing the corpus
is the expensive pass, so it must happen once per document, not once per
query or once per refresh. The index is two ``VersionedTable``s
maintained from the documents table's change feed (the ivm.py
subscription pattern; ``IncrementalNearDupIndex`` is the dedup-tier
precedent, the streamed IVF index the vector-tier one):

- ``postings``: (doc_id, term, tf, tbucket) for EVERY term — a real
  inverted index, not a query-term cache, so any query is servable
  without touching document text again. The table is PARTITIONED by
  ``tbucket = crc32(term) % N_TERM_BUCKETS`` — a pure function of the
  merge key, so rows never move partitions — which is what turns
  "O(churn) compute" into "O(touched buckets) scan": a refresh's MERGE
  rewrites only the buckets its batch's terms hash to, and a query
  reads only its own terms' buckets (``prune_report``-pinned by test).
  crc32 is computed identically by Spark (F.crc32) and the driver
  (zlib.crc32), so bucket lists for a Python query tuple need no job.
- ``doclens``: (doc_id, dl) — the BM25 length normalizer (read as an
  aggregate at serve time; unpartitioned, its reads are corpus-global).

Each refresh tokenizes ONLY the feed's documents (churn-proportional,
asserted by the driver query), merges their postings in (update/delete
by (doc_id, term) — a dropped term of an updated doc is tombstoned by a
NULL-tf marker row built distributedly from the stored index, never a
driver-side id list), and txn-stamps the applied version so a crashed
refresh replays as a no-op.

Query serving recomputes the corpus-global statistics (N, avgdl, df)
from the INDEX tables at query time — they are aggregate-sized reads,
and folding them into the stored rows would make every refresh rewrite
the whole index (df/avgdl change with every batch). Scoring reuses the
batch operator's exact expression (corpusops.bm25_scores), so the
accumulated index serves answers IDENTICAL to a full-corpus recompute —
the driver oracle for ``incremental_bm25_search`` is the batch
operator's own SQL, the strongest available check that incrementality
changes cost, not answers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.text import tokens
from de_final_project_spark.operators.txlog import EmptyChangeFeed
from de_final_project_spark.operators.corpusops import (
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    BM25_TOP_K,
)
from de_final_project_spark.sources.readers import read_testdata

_BMIDX_APP = "bm25idx"

# Bucket count: sized so a realistic query (a handful of terms) prunes
# to a small fraction, while a batch's MERGE still touches enough
# buckets to parallelize. Must never change for a live index (bucket is
# part of the physical layout).
N_TERM_BUCKETS = 64


def term_bucket(term: str) -> int:
    """Driver-side twin of the Spark-side bucket expression."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % N_TERM_BUCKETS


def _tbucket_col():
    return F.pmod(
        F.crc32(F.col("term").cast("binary")), F.lit(N_TERM_BUCKETS)
    ).cast("long")


class IncrementalPostingIndex:
    def __init__(self, docs, root: str):
        from de_final_project_spark.operators.txlog import VersionedTable

        self.docs = docs
        self.postings = VersionedTable(
            os.path.join(root, "postings"), partition_col="tbucket"
        )
        self.doclens = VersionedTable(os.path.join(root, "doclens"))

    def applied_version(self) -> int | None:
        head = self.postings.latest_version()
        if head is None:
            return None
        return self.postings._read_entry(head).get("txn", {}).get(_BMIDX_APP)

    @staticmethod
    def _tokenize(docs_df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """One pass over ONLY these docs: (postings rows, doclen rows).
        Fanned out first: the bronze/feed read is typically one scan
        task, and tokenization is the refresh's per-row cost
        (session.fan_out)."""
        from de_final_project_spark.session import fan_out

        toks = fan_out(docs_df).select(
            "doc_id", tokens(F.col("text")).alias("toks")
        )
        post = (
            toks.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("tbucket", _tbucket_col())
        )
        dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
        return post, dl

    def refresh(self, spark: SparkSession) -> dict:
        """Advance the index to the docs head. Report: mode, version
        window, ``tokenized_docs`` (the churn-proportionality
        measurement)."""
        base_v = self.docs.latest_version()
        if base_v is None:
            raise FileNotFoundError(f"no commits at {self.docs.path}")
        applied = self.applied_version()
        if applied is not None and applied >= base_v:
            return {"mode": "noop", "from": applied, "to": applied,
                    "tokenized_docs": 0}
        if applied is None:
            feed = self.docs.read(spark, version=base_v).withColumn(
                "_change_type", F.lit("insert")
            )
            mode = "build"
        else:
            try:
                feed = self.docs.read_changes(
                    spark, ["doc_id"], applied, base_v,
                    include_deletes=True,
                    include_update_preimages=True,
                )
            except EmptyChangeFeed:
                # metadata-only commits in the window: the applied
                # watermark intentionally stays put (same stance as
                # ivm.py) — the next real change re-diffs from the same
                # cheap endpoints. Other ValueErrors (schema misuse)
                # now propagate instead of masquerading as no-ops.
                return {"mode": "noop", "from": applied, "to": base_v,
                        "tokenized_docs": 0}
            mode = "delta"
        # Control-plane insert-only proof (same as the near-dup index):
        # an all-append window carries no deletes/preimages under the
        # unique-keyed producer contract, so the removed-rows probe job
        # is skipped without running the feed pipeline.
        insert_only = mode == "build" or all(
            op == "append" for op in self.docs.window_ops(applied, base_v)
        )
        new_docs = feed.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).persist()
        removed_ids = feed.where(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("doc_id").distinct()
        # Runtime hardening of the unique-keyed producer contract
        # (VERDICT r12 item 4), same stance as the near-dup index: a
        # re-appended doc_id under the insert-only fast path would
        # silently duplicate posting/doclen rows. Probe the DOCLENS id
        # column (doc-count-sized, far smaller than postings) and fail
        # loudly; conf-disabled for trusted producers.
        if (
            mode == "delta"
            and insert_only
            and self.doclens.latest_version() is not None
            and self.docs.verify_insert_only_keys(spark)
        ):
            dup = (
                self.doclens.read(spark)
                .select("doc_id")
                .join(new_docs.select("doc_id"), "doc_id", "left_semi")
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    "insert-only refresh re-appends an EXISTING doc_id: "
                    "the unique-keyed producer contract is violated — "
                    "commit updates as update/merge ops (the MERGE path "
                    "upserts them), or disable "
                    "spark.de_final_project.verifyInsertOnlyKeys if "
                    "uniqueness is enforced upstream."
                )
        new_post, new_dl = self._tokenize(new_docs)
        new_post = new_post.persist()
        n_tokenized = new_docs.count()

        # The postings and doclens commits are INDEPENDENT: separate
        # tables (separate log dirs, separate head CAS), sources derived
        # from the same persisted new_docs/new_post frames, no shared
        # uncommitted state. Overlapping them lets the second commit's
        # staging tasks back-fill executors idled by the first one's
        # straggler tail + committer walk (guide §2.6) — the measured
        # ~1.3–1.9 s/commit staged-write floor was the dominant cost of
        # an append refresh (OPTIMIZATION r12 "Not yet optimized").
        from de_final_project_spark.session import run_concurrently

        if self.postings.latest_version() is None:
            run_concurrently(
                lambda: self.postings.overwrite(
                    new_post, txn=(_BMIDX_APP, base_v)
                ),
                lambda: self.doclens.overwrite(
                    new_dl, txn=(_BMIDX_APP, base_v)
                ),
            )
        elif insert_only:
            # Control-plane-proven insert-only window: every posting
            # key (doc_id, term) and doclen key (doc_id) is NEW (append
            # commits carry unique doc_ids — the contract the tombstone
            # skip already rides), so the MERGEs' matched clauses can
            # never fire and their full-outer rewrites of touched
            # buckets would be the identity on stored rows. Commit both
            # deltas as pointer-list APPENDs: O(batch) staging, zero
            # stored-index IO; auto_compact below bounds the pointer
            # lists a steady append diet accumulates (guide §1.2).
            run_concurrently(
                lambda: self.postings.append(
                    new_post, txn=(_BMIDX_APP, base_v)
                ),
                lambda: self.doclens.append(
                    new_dl, txn=(_BMIDX_APP, base_v)
                ),
            )
        else:
            src = new_post
            # Insert-only batches (the common append corpus) skip the
            # tombstone pass entirely — it is the only step that reads
            # the stored index during a refresh, so an append refresh
            # scans NO index data beyond the buckets its MERGE touches.
            has_removed = (
                not insert_only and removed_ids.limit(1).count() > 0
            )
            if has_removed:
                # tombstone markers: the stored (doc_id, term) rows of
                # removed/updated docs that the new batch does NOT
                # re-assert — built by joins against the stored index,
                # no driver lists. tbucket rides along from the stored
                # row (it is a pure function of term, so it matches).
                stale = (
                    self.postings.read(spark)
                    .join(removed_ids, "doc_id", "left_semi")
                    .join(new_post, ["doc_id", "term"], "left_anti")
                    .select(
                        "doc_id", "term",
                        F.lit(None).cast("long").alias("tf"), "tbucket",
                    )
                )
                src = new_post.unionByName(stale)
            if has_removed:
                gone = (
                    self.doclens.read(spark)
                    .join(removed_ids, "doc_id", "left_semi")
                    .join(new_dl, ["doc_id"], "left_anti")
                    .select("doc_id", F.lit(None).cast("long").alias("dl"))
                )
            else:
                gone = new_dl.limit(0).select(
                    "doc_id", F.lit(None).cast("long").alias("dl")
                )
            # same independence argument as the append path: the two
            # MERGEs read/rewrite disjoint tables (each only its own).
            run_concurrently(
                lambda: self.postings.merge_into(
                    spark,
                    src,
                    on=["doc_id", "term"],
                    matched_update={"tf": "s.tf"},
                    matched_update_condition="s.tf IS NOT NULL",
                    matched_delete_condition="s.tf IS NULL",
                    insert_condition="s.tf IS NOT NULL",
                    txn=(_BMIDX_APP, base_v),
                ),
                lambda: self.doclens.merge_into(
                    spark,
                    new_dl.unionByName(gone),
                    on=["doc_id"],
                    matched_update={"dl": "s.dl"},
                    matched_update_condition="s.dl IS NOT NULL",
                    matched_delete_condition="s.dl IS NULL",
                    insert_condition="s.dl IS NOT NULL",
                    txn=(_BMIDX_APP, base_v),
                ),
            )
        for df in (new_docs, new_post):
            df.unpersist()
        # small-file lifecycle (VERDICT r11 item 5): a long-lived index
        # still fragments over hundreds of refreshes — per-partition
        # OPTIMIZE for the bucketed postings, whole-pointer compact for
        # the unpartitioned doclens once its live set reaches the
        # threshold. Control-plane no-op when nothing is fragmented;
        # the txn watermark carries through compaction commits, so
        # applied_version() is unaffected. Overlapped for the same
        # reason as the commits — two disjoint tables' lifecycles.
        run_concurrently(
            lambda: self.postings.auto_compact(spark),
            lambda: self.doclens.auto_compact(spark),
        )
        return {"mode": mode, "from": applied, "to": base_v,
                "tokenized_docs": n_tokenized}

    def bm25_topk(
        self,
        spark: SparkSession,
        query: tuple[str, ...] = BM25_QUERY,
        k: int = BM25_TOP_K,
    ) -> DataFrame:
        """Okapi BM25 top-k from the STORED index — document text is
        never read. Identical expression to corpusops.bm25_scores, so
        index-served answers equal the batch recompute exactly."""
        # bucket-pruned read: only the query terms' partitions are
        # listed/opened (file skipping from log metadata) — at index
        # scale this is the difference between touching ~|q| buckets
        # and scanning the whole posting relation.
        bks = sorted({term_bucket(str(t)) for t in query})
        post = self.postings.read(
            spark, where=f"tbucket IN ({', '.join(str(b) for b in bks)})"
        )
        dls = self.doclens.read(spark)
        n_docs = dls.count()
        qtf = post.where(
            F.col("term").isin(*[str(t) for t in query])
        ).select("doc_id", "term", "tf")
        dfc = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        avgdl = dls.agg(F.avg("dl").alias("avgdl"))
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        denom = F.col("tf") + BM25_K1 * (
            1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl")
        )
        contrib = idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom
        return (
            qtf.join(F.broadcast(dfc), "term")
            .join(dls, "doc_id")
            .crossJoin(F.broadcast(avgdl))
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
            .limit(k)
        )


def incremental_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable incrementally-maintained text index: documents
    arrive as THREE commits (70% history + two append batches); the
    index refreshes after each, tokenizing only its own batch (asserted
    in-line), then serves the fixed probe query from the stored
    postings. Answers equal the full-corpus batch recompute exactly, so
    the oracle is corpusops.BM25_SCORES_SQL."""
    from de_final_project_spark.operators.txlog import VersionedTable
    from de_final_project_spark.session import scratch_dir

    docs = read_testdata(spark, sf_dir, "documents")
    root = scratch_dir("bmidx")
    bronze = VersionedTable(os.path.join(root, "documents"))
    history = docs.where(F.col("doc_id") % 10 < 7)
    batch_a = docs.where(F.col("doc_id") % 10 == 7)
    batch_b = docs.where(F.col("doc_id") % 10 >= 8)
    # one scan for all three cohort counts (was 3 jobs — §1.2)
    n_hist, n_a, n_b = docs.agg(
        F.sum((F.col("doc_id") % 10 < 7).cast("long")),
        F.sum((F.col("doc_id") % 10 == 7).cast("long")),
        F.sum((F.col("doc_id") % 10 >= 8).cast("long")),
    ).first()
    bronze.overwrite(history)
    idx = IncrementalPostingIndex(bronze, root)
    r1 = idx.refresh(spark)
    assert (r1["mode"], r1["tokenized_docs"]) == ("build", n_hist), r1
    bronze.append(batch_a)
    r2 = idx.refresh(spark)
    # churn proportionality: the second refresh tokenizes ONLY its batch
    assert (r2["mode"], r2["tokenized_docs"]) == ("delta", n_a), r2
    bronze.append(batch_b)
    r3 = idx.refresh(spark)
    assert (r3["mode"], r3["tokenized_docs"]) == ("delta", n_b), r3
    assert idx.refresh(spark)["mode"] == "noop"
    return idx.bm25_topk(spark)
