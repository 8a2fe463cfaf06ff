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
