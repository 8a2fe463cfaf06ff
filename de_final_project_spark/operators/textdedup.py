"""Document deduplication operators (training-data pipeline surface).

Exact dedup here; MinHash-LSH / SimHash near-dup live in
``operators/neardup.py``. All are DataFrame-native: the heavy lifting is
hash-groupBy (one shuffle on the fingerprint — uniformly distributed, so
no skew) and self-joins on band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.text import fingerprint, token_count
from de_final_project_spark.sources.readers import read_testdata


def dedup_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup groups: md5 fingerprint of normalized text ->
    canonical doc (min doc_id) + copy count per fingerprint.

    One hash aggregate on a 128-bit uniform key: shuffles O(distinct
    fingerprints), map-side partials first. At 100 TB this is the standard
    exact-dedup pass of a corpus pipeline."""
    docs = read_testdata(spark, sf_dir, "documents")
    return (
        docs.select(fingerprint("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


DEDUP_DOCS_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: token count, char count, exact token
    chars — the quality-scoring feature base. Pure narrow projection, no
    shuffle at all."""
    docs = read_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_computed"),
        token_count("text").alias("n_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", r"\s", "")))
        .cast("long")
        .alias("n_whitespace"),
    )


DOC_STATS_SQL = """
SELECT doc_id,
       lang,
       length(text) AS n_chars_computed,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS n_whitespace
FROM documents
"""


# BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct splits
# with leading-space attachment), restricted to constructs RE2 also
# supports so the DuckDB oracle runs the identical regex — no lookahead.
BPE_PATTERN = r" ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per document — the cost model
    for LLM-pipeline budgeting (tokens ≈ compute). Both counters are
    JVM-side regex extractions in one narrow projection; no Python, no
    shuffle."""
    docs = read_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens
FROM documents
"""


def dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup verdict ACROSS methods — which passes flagged
    each doc as a duplicate: exact fingerprint (non-canonical copy of a
    byte-identical group), MinHash near-dup (non-canonical member of an
    LSH cluster), and SemDeDup (pruned by the embedding
    cluster-then-compare pass; NULL for docs without an embedding).
    dedup_method_agreement summarizes corpus-level overlap in one row;
    this is the row-level artifact a curation pipeline actually acts on
    — and audits ("why was doc X dropped?"). Each arm is the existing
    scale-shaped operator; the consolidation is two key joins.
    Reference analog: none (extension surface)."""
    from de_final_project_spark.operators.neardup import neardup_clusters
    from de_final_project_spark.operators.semdedup import semantic_dedup

    docs = read_testdata(spark, sf_dir, "documents")
    per_doc_hash = docs.select(
        "doc_id", fingerprint("text").alias("text_hash")
    )
    exact = per_doc_hash.join(
        dedup_docs_exact(spark, sf_dir), "text_hash"
    ).select(
        "doc_id",
        (F.col("doc_id") != F.col("canonical_doc_id")).alias("exact_dup"),
    )
    minhash = neardup_clusters(spark, sf_dir).select(
        "doc_id", (~F.col("is_canonical")).alias("minhash_dup")
    )
    semantic = semantic_dedup(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        (~F.col("kept")).alias("semantic_dup"),
    )
    return (
        exact.join(minhash, "doc_id")
        .join(semantic, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            "minhash_dup",
            "semantic_dup",
            (
                F.col("exact_dup").cast("long")
                + F.col("minhash_dup").cast("long")
                + F.coalesce(F.col("semantic_dup").cast("long"), F.lit(0))
            ).alias("n_flags"),
        )
    )


def _dedup_provenance_sql() -> str:
    from de_final_project_spark.operators.neardup import NEARDUP_CLUSTERS_SQL
    from de_final_project_spark.operators.semdedup import SEMANTIC_DEDUP_SQL

    return f"""
WITH per_doc AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash
  FROM documents
), exact AS (
  SELECT p.doc_id, p.doc_id <> g.canonical_doc_id AS exact_dup
  FROM per_doc p JOIN ({DEDUP_DOCS_EXACT_SQL}) g USING (text_hash)
), mh AS (
  SELECT doc_id, NOT is_canonical AS minhash_dup
  FROM ({NEARDUP_CLUSTERS_SQL})
), sem AS (
  SELECT vec_id AS doc_id, NOT kept AS semantic_dup
  FROM ({SEMANTIC_DEDUP_SQL})
)
SELECT e.doc_id, e.exact_dup, mh.minhash_dup, sem.semantic_dup,
       (e.exact_dup::BIGINT + mh.minhash_dup::BIGINT
        + coalesce(sem.semantic_dup::BIGINT, 0)) AS n_flags
FROM exact e
JOIN mh USING (doc_id)
LEFT JOIN sem USING (doc_id)
"""
