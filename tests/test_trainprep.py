"""Semantic invariants for the training-corpus prep operators (the
oracle twin checks value parity; these pin the semantics themselves)."""

from pyspark.sql import functions as F

from de_final_project_spark.operators.trainprep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
    contamination_check,
    cross_source_dupes,
    doc_chunks,
    sequence_packing,
    source_overlap_neardup,
)

SF_DIR = "/root/testdata/sf0.001"


def test_doc_chunks_cover_every_token(spark):
    rows = doc_chunks(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.split(
                    F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
                )
            ).alias("n"),
        )
        .collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = docs[doc_id]
        # ids are 0..k dense; starts advance by the stride
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.chunk_start == c.chunk_id * CHUNK_STRIDE
            assert 1 <= c.n_chunk_tokens <= CHUNK_TOKENS
        # the last chunk reaches the end of the doc: full coverage
        last = chunks[-1]
        assert last.chunk_start + last.n_chunk_tokens == n
        # no start beyond what coverage needs (no degenerate tail)
        if len(chunks) > 1:
            assert chunks[-2].chunk_start + CHUNK_TOKENS < n


def test_contamination_only_flags_test_split(spark):
    from de_final_project_spark.operators.sampling import dataset_splits

    splits = {
        r.doc_id: r.split for r in dataset_splits(spark, SF_DIR).collect()
    }
    rows = contamination_check(spark, SF_DIR).collect()
    assert rows, "sf0.001 corpus should have some shingle overlap"
    for r in rows:
        assert splits[r.doc_id] == "test"
        assert r.n_shared_shingles >= 1 and r.n_train_docs >= 1


def test_sequence_packing_invariants(spark):
    rows = sorted(sequence_packing(spark, SF_DIR).collect(), key=lambda r: r.doc_id)
    cum = 0
    for r in rows:
        assert r.bin_id == cum // PACK_BUDGET
        assert r.bin_offset == cum % PACK_BUDGET
        cum += r.n_tokens
    # bins are dense and nondecreasing
    bins = [r.bin_id for r in rows]
    assert bins == sorted(bins)


def test_cross_source_dupes_finds_known_dupes(spark):
    # sf0.1 is the smallest SF with syndicated content (8 hashes as of
    # the current testdata generation — assert the semantic invariants,
    # not the exact count, so a corpus regeneration doesn't fail this
    # test without a real defect in cross_source_dupes).
    rows = cross_source_dupes(spark, "/root/testdata/sf0.1").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_sources > 1 and r.n_docs >= r.n_sources


def test_source_overlap_totals_match_pair_count(spark):
    from de_final_project_spark.operators.neardup import neardup_pairs_minhash

    n_pairs = neardup_pairs_minhash(spark, SF_DIR).count()
    overlap = source_overlap_neardup(spark, SF_DIR).collect()
    assert sum(r.n_neardup_pairs for r in overlap) == n_pairs
    for r in overlap:
        assert r.source_a <= r.source_b


def test_repetition_report_invariants(spark):
    from de_final_project_spark.operators.textquality import repetition_report

    rows = repetition_report(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0.0 <= r.dup_2gram_frac <= 1.0
        assert 0.0 <= r.dup_3gram_frac <= 1.0
        if r.n_tokens > 0:
            # the modal token accounts for at least 1/n and at most all
            # values are rounded to 6 places, so allow half-ulp slack
            assert 1.0 / r.n_tokens <= r.top_token_frac + 5e-7
            assert r.top_token_frac <= 1.0
        else:
            assert r.top_token_frac == 0.0


def test_repetition_report_known_values(spark):
    """Hand-computed check on a tiny in-memory frame routed through the
    same expressions (monkeypatch-free: rebuild the plan on a temp view
    is overkill — instead verify the testdata doc with the highest
    repetition agrees with a python recomputation)."""
    import collections

    from de_final_project_spark.operators.textquality import repetition_report

    top = (
        repetition_report(spark, SF_DIR)
        .orderBy("doc_id")
        .limit(3)
        .collect()
    )
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(3)
        .collect()
    }
    for r in top:
        toks = docs[r.doc_id].strip().split()
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        exp2 = 0.0 if not g2 else round(1.0 - len(set(g2)) / len(g2), 6)
        exp3 = 0.0 if not g3 else round(1.0 - len(set(g3)) / len(g3), 6)
        exp_top = round(
            collections.Counter(toks).most_common(1)[0][1] / len(toks), 6
        )
        assert (r.dup_2gram_frac, r.dup_3gram_frac, r.top_token_frac) == (
            exp2,
            exp3,
            exp_top,
        ), r.doc_id


def test_quality_gate_reasons_consistent(spark):
    from de_final_project_spark.operators.textquality import (
        GATE_MAX_DUP3,
        GATE_MAX_TOP_TOKEN,
        GATE_MIN_TOKENS,
        quality_gate,
        repetition_report,
    )

    gate = {r.doc_id: r for r in quality_gate(spark, SF_DIR).collect()}
    rep = {r.doc_id: r for r in repetition_report(spark, SF_DIR).collect()}
    assert set(gate) == set(rep)
    dropped = [g for g in gate.values() if not g.keep]
    assert dropped, "gate should flag a tail of the corpus"
    for g in gate.values():
        r = rep[g.doc_id]
        assert ("too_short" in g.drop_reasons) == (r.n_tokens < GATE_MIN_TOKENS)
        assert ("high_repetition" in g.drop_reasons) == (
            r.dup_3gram_frac > GATE_MAX_DUP3
        )
        assert ("dominant_token" in g.drop_reasons) == (
            r.top_token_frac > GATE_MAX_TOP_TOKEN
        )
        assert g.keep == (g.drop_reasons == "")


def test_cms_never_undercounts_and_matches_exact_top(spark):
    from de_final_project_spark.operators.sketches import (
        CMS_TOP_K,
        cms_heavy_hitters,
    )
    from de_final_project_spark.operators.textquality import top_terms

    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == CMS_TOP_K
    for r in rows:
        assert r.cms_estimate >= r.n  # CMS upper-bound property
        assert r.overestimate == r.cms_estimate - r.n
    # the K terms are exactly the corpus top-K by count
    exact = {r.term for r in top_terms(spark, SF_DIR).limit(CMS_TOP_K).collect()}
    assert {r.term for r in rows} == exact


def test_corpus_curation_composes_its_stages(spark):
    from de_final_project_spark.operators.neardup import neardup_clusters
    from de_final_project_spark.operators.textquality import quality_gate
    from de_final_project_spark.operators.trainprep import corpus_curation

    cur = {r.doc_id: r for r in corpus_curation(spark, SF_DIR).collect()}
    gate = {r.doc_id: r for r in quality_gate(spark, SF_DIR).collect()}
    clus = {r.doc_id: r for r in neardup_clusters(spark, SF_DIR).collect()}
    assert set(cur) == set(gate) == set(clus)
    for d, r in cur.items():
        assert r.quality_keep == gate[d].keep
        assert r.is_canonical == clus[d].is_canonical
        assert r.keep_final == (r.quality_keep and r.is_canonical)
        assert ("near_duplicate" in r.drop_reasons) == (not r.is_canonical)
    kept = sum(1 for r in cur.values() if r.keep_final)
    assert 0 < kept < len(cur)


def test_unigram_cross_entropy_bounds(spark):
    import math

    from de_final_project_spark.operators.textquality import (
        unigram_logprob_scores,
    )

    rows = unigram_logprob_scores(spark, SF_DIR).collect()
    assert len(rows) == 500
    # cross-entropy of a unigram LM is bounded by ln(total corpus tokens)
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert 0.0 < r.cross_entropy <= math.log(total) + 1e-6


def test_pmi_bigrams_recompute(spark):
    """Recompute PMI in python from raw counts for the returned rows."""
    import collections
    import math

    from de_final_project_spark.operators.textquality import (
        PMI_MIN_COUNT,
        top_pmi_bigrams,
    )

    docs = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    uni: collections.Counter = collections.Counter()
    bg: collections.Counter = collections.Counter()
    for text in docs:
        toks = text.strip().split()
        uni.update(t for t in toks if t)
        bg.update(
            (a, b) for a, b in zip(toks, toks[1:]) if a and b
        )
    n_uni, n_bg = sum(uni.values()), sum(bg.values())
    rows = top_pmi_bigrams(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bigram_count == bg[(r.w1, r.w2)] >= PMI_MIN_COUNT
        exp = round(
            math.log(
                (r.bigram_count / n_bg)
                / ((uni[r.w1] / n_uni) * (uni[r.w2] / n_uni))
            ),
            6,
        )
        assert abs(r.pmi - exp) < 2e-6, (r.w1, r.w2)


def test_embedding_label_centroids_recompute(spark):
    import numpy as np

    from de_final_project_spark.operators.similarity import (
        embedding_label_centroids,
    )

    rows = embedding_label_centroids(spark, SF_DIR).collect()
    raw = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = {}
    for r in raw:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    assert len(rows) == len(by_label) * 64
    for r in rows:
        vecs = by_label[r.label]
        assert r.n_vectors == len(vecs)
        exp = float(np.mean([v[r.dim_idx] for v in vecs]))
        assert abs(r.mean_value - exp) < 2e-6, (r.label, r.dim_idx)


def test_chunk_dedup_conserves_chunks(spark):
    import pyspark.sql.functions as F

    from de_final_project_spark.operators.trainprep import chunk_dedup, doc_chunks

    sf = "/root/testdata/sf0.001"
    kept = chunk_dedup(spark, sf).cache()
    total_chunks = doc_chunks(spark, sf).count()
    # every source chunk is represented exactly once via its canonical
    assert kept.agg(F.sum("n_copies")).first()[0] == total_chunks
    # one keeper per hash
    assert kept.groupBy("chunk_hash").count().where("count > 1").count() == 0
    assert kept.where("n_copies < 1").count() == 0


def test_packing_efficiency_mass_conservation(spark):
    import pyspark.sql.functions as F

    from de_final_project_spark.operators.trainprep import (
        packing_efficiency,
        sequence_packing,
    )

    sf = "/root/testdata/sf0.001"
    eff = packing_efficiency(spark, sf)
    packed = sequence_packing(spark, sf)
    assert (
        eff.agg(F.sum("tokens_started")).first()[0]
        == packed.agg(F.sum("n_tokens")).first()[0]
    )
    assert eff.agg(F.sum("n_docs")).first()[0] == packed.count()


def test_dup_span_report_invariants(spark):
    """Every doc appears once; dup counts are bounded by window counts;
    the longest run never exceeds the dup-window count; a doc whose text
    duplicates another doc verbatim reports a full-coverage dup run."""
    from de_final_project_spark.operators.trainprep import SPAN_N, dup_span_report

    rep = dup_span_report(spark, SF_DIR).cache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert rep.count() == docs.count()
    assert rep.select("doc_id").distinct().count() == rep.count()
    bad = rep.where(
        (F.col("n_dup_windows") > F.col("n_windows"))
        | (F.col("longest_dup_run") > F.col("n_dup_windows"))
        | (F.col("dup_window_frac") < 0)
        | (F.col("dup_window_frac") > 1)
        | ((F.col("n_windows") == 0) & (F.col("n_dup_windows") != 0))
    )
    assert bad.count() == 0
    # Exact-duplicate document pair => every window of each copy is
    # duplicated, so dup_window_frac == 1.0 and the run spans all starts.
    dup_pair = (
        docs.select(F.md5(F.lower(F.trim("text"))).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.count("*").alias("c"), F.min("doc_id").alias("doc_id"))
        .where((F.col("c") > 1))
        .join(rep, "doc_id")
        .where(F.col("n_windows") > 0)
    )
    full = dup_pair.where(
        (F.col("dup_window_frac") == 1.0)
        & (F.col("longest_dup_run") == F.col("n_windows"))
    )
    assert dup_pair.count() == full.count()
    rep.unpersist()


def test_doc_quality_pandas_twin_exact_parity(spark):
    """The Arrow mapInPandas twin reproduces the expression version
    bit-for-bit (including Spark's HALF_UP-on-shortest-decimal
    rounding) — the bench A/B compares identical semantics."""
    from de_final_project_spark.operators.textquality import (
        doc_quality,
        doc_quality_pandas,
    )

    a = {r.doc_id: tuple(r) for r in doc_quality(spark, SF_DIR).collect()}
    b = {
        r.doc_id: tuple(r) for r in doc_quality_pandas(spark, SF_DIR).collect()
    }
    assert a == b


def test_shard_manifest_consistent_with_packing(spark):
    """Shard totals re-derive from the packing assignment: bins group
    into shards of SHARD_BINS, token sums and doc counts add up, and
    the content hash equals the sum of member doc fingerprints."""
    import pyspark.sql.functions as F

    from de_final_project_spark.operators import trainprep as tp

    sf = "/root/testdata/sf0.001"
    packed = tp.sequence_packing(spark, sf).collect()
    manifest = {r["shard_id"]: r for r in tp.packed_shard_manifest(spark, sf).collect()}
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r["bin_id"] // tp.SHARD_BINS, []).append(r)
    assert set(manifest) == set(by_shard)
    for sid, rows in by_shard.items():
        m = manifest[sid]
        assert m["n_docs"] == len(rows)
        assert m["n_tokens"] == sum(r["n_tokens"] for r in rows)
        assert m["n_bins"] == len({r["bin_id"] for r in rows})
        assert m["first_doc"] == min(r["doc_id"] for r in rows)
        assert m["last_doc"] == max(r["doc_id"] for r in rows)
        assert m["fill"] == m["n_tokens"] / (tp.SHARD_BINS * tp.PACK_BUDGET)
    # fingerprint: recompute one shard's hash driver-side
    import hashlib

    sid, rows = next(iter(by_shard.items()))
    want = sum(
        int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12], 16)
        for r in rows
    )
    assert manifest[sid]["content_hash"] == want
