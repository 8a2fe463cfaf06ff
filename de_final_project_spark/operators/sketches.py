"""Count-Min Sketch frequency estimation over corpus tokens.

The scale story: exact per-token counts need state proportional to the
vocabulary (unbounded at 100 TB); a CMS is a fixed D×W counter matrix —
here 4×256 = 1024 counters regardless of corpus size — updated by one
hash aggregate whose output cardinality is capped at D·W. Estimates
never undercount (each cell only ever adds colliding terms), so
``min`` over the D rows gives the classic upper-bound estimate.

Hashes are the engine-portable md5-prefix trick (same as
operators/sampling.hash_bucket), so the DuckDB oracle reproduces the
sketch bit-for-bit — this is a deterministic sketch, not an RNG one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.text import tokens
from de_final_project_spark.sources.readers import read_testdata

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP_K = 20


def _cms_bucket(term: Column, d: int) -> Column:
    """Row-d bucket for a term: md5 prefix of 'd:term', mod width."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}:"), term)), 1, 8), 16, 10)
        .cast("long")
        % CMS_WIDTH
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report: the exact top-K corpus terms with their
    Count-Min estimate and its (always non-negative) overestimate.

    Shape: one explode of the corpus into (term) rows feeds BOTH the
    sketch build (term -> D (row, bucket) updates -> ONE hash aggregate
    with ≤ D·W output rows) and the exact counts. The estimate join is
    top-K × D rows against the ≤1024-row sketch — broadcast, no wide
    stage. At 100 TB the exact-count branch is the expensive one and
    exists here as ground truth; the sketch branch alone is the
    production path (bounded state, map-side partials)."""
    docs = read_testdata(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term")).where(
        F.col("term") != ""
    )
    updates = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("term"), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("u")
    ).select("u.d", "u.bucket")
    sketch = updates.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))

    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    top = exact.orderBy(F.col("n").desc(), F.col("term").asc()).limit(CMS_TOP_K)
    probes = top.select(
        "term",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("term"), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("u"),
    ).select("term", "n", "u.d", "u.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("term", "n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "term",
            "n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n")).alias("overestimate"),
        )
    )


_DS = list(range(CMS_DEPTH))

CMS_HEAVY_HITTERS_SQL = f"""
WITH terms AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), t AS (
  SELECT term FROM terms WHERE term <> ''
), upd AS (
  SELECT d,
         ('0x' || substr(md5(d::VARCHAR || ':' || term), 1, 8))::BIGINT
           % {CMS_WIDTH} AS bucket
  FROM (SELECT term, unnest({_DS}) AS d FROM t)
), sk AS (
  SELECT d, bucket, count(*) AS c FROM upd GROUP BY 1, 2
), exact AS (
  SELECT term, count(*)::BIGINT AS n FROM t GROUP BY 1
), top AS (
  SELECT term, n FROM exact ORDER BY n DESC, term ASC LIMIT {CMS_TOP_K}
), probes AS (
  SELECT term, n, d,
         ('0x' || substr(md5(d::VARCHAR || ':' || term), 1, 8))::BIGINT
           % {CMS_WIDTH} AS bucket
  FROM (SELECT term, n, unnest({_DS}) AS d FROM top)
)
SELECT p.term, p.n,
       min(sk.c)::BIGINT AS cms_estimate,
       (min(sk.c) - p.n)::BIGINT AS overestimate
FROM probes p JOIN sk USING (d, bucket)
GROUP BY 1, 2
"""


KMV_K = 64


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event_type, with the
    exact count alongside as ground truth.

    KMV keeps only the K smallest hash values of the keys seen; if the
    K-th smallest of a uniform [0,1) hash is m, distinct ≈ (K−1)/m. The
    sketch state is K values per group regardless of cardinality — the
    mergeable bounded-state shape (union sketches = merge-and-keep-K)
    that scales where exact distinct needs unbounded state. Like the CMS,
    hashes are the md5-prefix trick, so the sketch — and therefore the
    estimate — is bit-reproducible in the DuckDB oracle: a deterministic
    sketch, not an RNG one. Groups with fewer than K distinct hashes
    report the exact distinct count (the standard small-range fallback).

    Shape: one distinct-hash aggregate, a per-group rank window over ≤
    (groups × distinct) rows that the K-th-smallest filter immediately
    caps, and a K-row-per-group final aggregate.
    """
    ev = read_testdata(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    hashed = ev.select("event_type", h.alias("h")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    ranked = hashed.withColumn("rk", F.row_number().over(w))
    per_group = (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_exact"),
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("_kth"),
        )
    )
    estimate = F.when(
        F.col("_kth").isNull(), F.col("n_distinct_exact").cast("double")
    ).otherwise(
        F.round((F.lit(KMV_K - 1)) / (F.col("_kth").cast("double") / F.lit(float(2**32))), 6)
    )
    return per_group.select(
        "event_type", "n_distinct_exact", estimate.alias("kmv_estimate")
    )


KMV_DISTINCT_USERS_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
), ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rk
  FROM hashed
)
SELECT event_type,
       count(*)::BIGINT AS n_distinct_exact,
       CASE WHEN max(CASE WHEN rk = {KMV_K} THEN h END) IS NULL
            THEN count(*)::DOUBLE
            ELSE round(({KMV_K} - 1)
                       / (max(CASE WHEN rk = {KMV_K} THEN h END)::DOUBLE / 4294967296.0), 6)
       END AS kmv_estimate
FROM ranked
GROUP BY event_type
"""
