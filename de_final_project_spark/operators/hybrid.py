"""Hybrid retrieval: BM25 text arm + IVF vector arm, fused by
Reciprocal Rank Fusion.

Query-by-document over the corpus the engine already indexes two ways:
each query document retrieves candidates through (a) Okapi BM25 on its
rarest terms and (b) IVF-probed cosine over its embedding (embeddings
and documents share the id space by construction of the testdata), and
the two rankings fuse by RRF — ``score = Σ_arms 1/(K + rank)`` with
K=60, the published constant (Cormack et al., SIGIR 2009). RRF needs
no score calibration between arms, which is exactly why production
hybrid search uses it: BM25 logs and cosine similarities are not
commensurable, ranks are.

Scale shape: the text arm is explode -> hash-agg term stats -> an
equi-join on term restricted to the Q×5 query-term broadcast; the
vector arm is the IVF cell equi-join (operators/similarity.py) — no
stage is quadratic in the corpus. Fusion is a full-outer join of two
top-k relations (Q×k rows each, control-plane sized).

Cross-engine exactness: per-(query, candidate) BM25 sums its ≤5 term
contributions IN SORTED TERM ORDER on both engines (Spark: aggregate
over array_sort(collect_list(struct)); DuckDB: list_sum(list(... ORDER
BY term))) — a stronger discipline than the corpus BM25's rounded
unordered sum, eliminating the addend-order ulp hazard entirely. The
RRF arithmetic is two exact IEEE divisions and one add — bit-identical
everywhere; ties break to the smaller candidate id.

Reference analog: none — extension surface (training-data / retrieval
pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_final_project_spark.functions.text import tokens
from de_final_project_spark.operators.corpusops import BM25_B, BM25_K1
from de_final_project_spark.operators.similarity import (
    IVF_KNN_SQL,
    N_QUERIES,
    ivf_knn,
)
from de_final_project_spark.sources.readers import read_testdata

HYBRID_Q_TERMS = 5  # rarest terms of the query doc form its text query
HYBRID_TEXT_TOP_K = 10
HYBRID_TOP_K = 10
RRF_K = 60


def _text_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, cand_id, t_rank): BM25 top-k per query document,
    querying by the doc's HYBRID_Q_TERMS globally-rarest terms."""
    docs = read_testdata(spark, sf_dir, "documents")
    n_docs = docs.count()
    doc_terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).distinct()
    dfc = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        doc_terms.where(F.col("doc_id") < N_QUERIES)
        .join(dfc, "term")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "term")
            ),
        )
        .where(F.col("rn") <= HYBRID_Q_TERMS)
        .select(F.col("doc_id").alias("query_id"), "term", "df")
    )
    tf = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    avgdl = doclen.agg(F.avg("dl").alias("avgdl"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    contrib = idf * (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1
        * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            F.col("doc_id").alias("cand_id"),
            "term",
            contrib.alias("contrib"),
        )
        # sorted-order sum: both engines add the SAME addends in the
        # SAME sequence, so the double result is bit-identical
        .groupBy("query_id", "cand_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("term", "contrib"))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["contrib"],
            ).alias("bm25")
        )
    )
    return (
        scored.withColumn(
            "t_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.round(F.col("bm25"), 6).desc(), F.col("cand_id").asc()
                )
            ),
        )
        .where(F.col("t_rank") <= HYBRID_TEXT_TOP_K)
        .select("query_id", "cand_id", F.col("t_rank").cast("long").alias("t_rank"))
    )


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-k per query document: text rank, vector rank, and the
    RRF score. A candidate found by only one arm still scores (the
    other arm contributes 0) — union-of-arms recall, rank-based
    precision, the standard hybrid-retrieval contract."""
    text = _text_arm(spark, sf_dir)
    vec = ivf_knn(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("rank").cast("long").alias("v_rank"),
    )
    fused = text.join(vec, ["query_id", "cand_id"], "full_outer").select(
        "query_id",
        "cand_id",
        "t_rank",
        "v_rank",
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("t_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("v_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return (
        fused.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("rrf_score").desc(), F.col("cand_id").asc()
                )
            ),
        )
        .where(F.col("rank") <= HYBRID_TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "cand_id",
            "t_rank",
            "v_rank",
            "rrf_score",
        )
    )


HYBRID_SEARCH_RRF_SQL = f"""
WITH doc_terms AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), dfc AS (
  SELECT term, count(*)::BIGINT AS df FROM doc_terms GROUP BY 1
), qterms AS (
  SELECT doc_id AS query_id, term, df FROM (
    SELECT t.doc_id, t.term, d.df,
           row_number() OVER (PARTITION BY t.doc_id
                              ORDER BY d.df ASC, t.term ASC) AS rn
    FROM doc_terms t JOIN dfc d USING (term)
    WHERE t.doc_id < {N_QUERIES}
  ) WHERE rn <= {HYBRID_Q_TERMS}
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents WHERE trim(text) <> '')
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY 1, 2
), doclen AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT AS dl
  FROM documents
), stats AS (SELECT avg(dl) AS avgdl FROM doclen),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT query_id, cand_id,
         list_sum(list(contrib ORDER BY term ASC)) AS bm25
  FROM (
    SELECT q.query_id, tf.doc_id AS cand_id, q.term,
           ln((n.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1.0))
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.dl::DOUBLE / stats.avgdl)) AS contrib
    FROM qterms q
    JOIN tf ON q.term = tf.term AND tf.doc_id <> q.query_id
    JOIN doclen dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats CROSS JOIN n
  )
  GROUP BY 1, 2
), text_arm AS (
  SELECT query_id, cand_id, t_rank FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(bm25, 6) DESC,
                                       cand_id ASC)::BIGINT AS t_rank
    FROM scored
  ) WHERE t_rank <= {HYBRID_TEXT_TOP_K}
), vec_arm AS (
  SELECT query_id, neighbor_id AS cand_id, rank::BIGINT AS v_rank
  FROM ({IVF_KNN_SQL})
), fused AS (
  SELECT coalesce(t.query_id, v.query_id) AS query_id,
         coalesce(t.cand_id, v.cand_id) AS cand_id,
         t.t_rank, v.v_rank,
         coalesce(1.0 / ({RRF_K} + t.t_rank), 0.0)
         + coalesce(1.0 / ({RRF_K} + v.v_rank), 0.0) AS rrf_score
  FROM text_arm t
  FULL OUTER JOIN vec_arm v
    ON t.query_id = v.query_id AND t.cand_id = v.cand_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, cand_id ASC)::BIGINT
         AS rank,
       cand_id, t_rank, v_rank, rrf_score
FROM fused
QUALIFY rank <= {HYBRID_TOP_K}
"""
