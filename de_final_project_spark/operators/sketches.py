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
            # sketch-side state only: the count of DISTINCT HASHES (the
            # small-range fallback a real KMV reports) and the K-th one
            F.count(F.lit(1)).alias("_nh"),
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("_kth"),
        )
    )
    # ground truth is countDistinct over the KEYS, not the hashes — a
    # 32-bit md5-prefix collision must not shift the 'exact' column
    # (ADVICE r9). The `_kth = 0` guard is theoretical (64 distinct
    # non-negative hashes put the 64th at >= 63) but keeps the divide
    # total.
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct_exact")
    )
    estimate = F.when(
        F.col("_kth").isNull() | (F.col("_kth") == 0),
        F.col("_nh").cast("double"),
    ).otherwise(
        F.round((F.lit(KMV_K - 1)) / (F.col("_kth").cast("double") / F.lit(float(2**32))), 6)
    )
    return exact.join(per_group, "event_type").select(
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
), sk AS (
  SELECT event_type,
         count(*)::BIGINT AS nh,
         max(CASE WHEN rk = {KMV_K} THEN h END) AS kth
  FROM ranked
  GROUP BY event_type
), exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_distinct_exact,
       CASE WHEN sk.kth IS NULL OR sk.kth = 0
            THEN sk.nh::DOUBLE
            ELSE round(({KMV_K} - 1) / (sk.kth::DOUBLE / 4294967296.0), 6)
       END AS kmv_estimate
FROM exact e JOIN sk USING (event_type)
"""


# ----------------------------------------------------------------------
# Bloom-filter semi-join pruning (round 5)
# ----------------------------------------------------------------------

BLOOM_BITS = 4096
# 63 usable bits per signed-bigint word: bit 63 would overflow DuckDB's
# checked left shift, and cross-engine bit-identity is the whole point.
BLOOM_BITS_PER_WORD = 63
BLOOM_WORDS = -(-BLOOM_BITS // BLOOM_BITS_PER_WORD)
BLOOM_HASHES = 3


def _bloom_pos(key: Column, j: int) -> Column:
    """Bit position of hash j for a key: md5-prefix of 'j|key', mod the
    filter width — the same cross-engine md5 trick as the CMS/KMV."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}|"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_BITS
    )


def bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, with its false-positive rate
    measured against the exact join: the BUILDING-segment customer keys
    compress into a {BLOOM_BITS}-bit filter (BLOOM_WORDS bigint words,
    BLOOM_HASHES probes) and every order is tested against it. This is
    the runtime-filter pattern big engines inject to cut shuffle volume:
    at 100 TB the fact side drops non-matching rows at the scan, before
    the join exchange, at the cost of a broadcast measured in KILOBYTES
    regardless of dim cardinality (vs broadcasting the key set itself).
    Reports, per order priority: order count, bloom-pass count, true
    semi-join count, false positives, and the FP rate among true
    negatives. A Bloom filter admits no false negatives, so
    n_bloom_pass >= n_true_match row-for-row — the oracle rebuilds the
    identical filter bit-for-bit and pins both counts.

    Shape: filter build is one {BLOOM_WORDS}-row bit_or aggregate
    (mergeable sketch state, map-side combined); the probe explodes each
    order into BLOOM_HASHES word lookups against the broadcast filter
    — narrow join, no fact-side shuffle before the pruning decision.
    """
    cust = read_testdata(spark, sf_dir, "customer")
    orders = read_testdata(spark, sf_dir, "orders")
    seg = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    words = None
    for j in range(BLOOM_HASHES):
        part = seg.select(
            _bloom_pos(F.col("c_custkey"), j).alias("pos")
        ).select(
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("int").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("_mask"),
        )
        words = part if words is None else words.unionByName(part)
    bloom = F.broadcast(
        words.groupBy("word_idx").agg(F.bit_or("_mask").alias("word"))
    )

    probes = None
    for j in range(BLOOM_HASHES):
        p = orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            _bloom_pos(F.col("o_custkey"), j).alias("pos"),
        ).select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("int").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("_mask"),
        )
        probes = p if probes is None else probes.unionByName(p)
    tested = (
        probes.join(bloom, "word_idx", "left")
        .withColumn(
            "_hit",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0)
            .cast("int"),
        )
        .groupBy("o_orderkey", "o_custkey", "o_orderpriority")
        .agg((F.sum("_hit") == BLOOM_HASHES).alias("bloom_pass"))
    )
    truth = tested.join(
        F.broadcast(seg.withColumnRenamed("c_custkey", "o_custkey")).withColumn(
            "is_match", F.lit(True)
        ),
        "o_custkey",
        "left",
    ).withColumn("is_match", F.coalesce(F.col("is_match"), F.lit(False)))
    return (
        truth.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("bloom_pass").cast("long")).alias("n_bloom_pass"),
            F.sum(F.col("is_match").cast("long")).alias("n_true_match"),
            F.sum(
                (F.col("bloom_pass") & ~F.col("is_match")).cast("long")
            ).alias("n_false_pos"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_bloom_pass",
            "n_true_match",
            "n_false_pos",
            F.when(
                F.col("n_orders") > F.col("n_true_match"),
                F.round(
                    F.col("n_false_pos").cast("double")
                    / (F.col("n_orders") - F.col("n_true_match")).cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("fp_rate"),
        )
    )


_BLOOM_JS = list(range(BLOOM_HASHES))

BLOOM_SEMIJOIN_PRUNE_SQL = f"""
WITH seg AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), dim_bits AS (
  {" UNION ALL ".join(
      f'''SELECT (('0x' || substr(md5('{j}|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                  % {BLOOM_BITS}) AS pos FROM seg'''
      for j in _BLOOM_JS
  )}
), bloom AS (
  SELECT (pos // {BLOOM_BITS_PER_WORD})::INT AS word_idx,
         bit_or(1::BIGINT << (pos % {BLOOM_BITS_PER_WORD})::INT) AS word
  FROM dim_bits GROUP BY 1
), probe_bits AS (
  {" UNION ALL ".join(
      f'''SELECT o_orderkey, o_custkey, o_orderpriority,
                 (('0x' || substr(md5('{j}|' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                  % {BLOOM_BITS}) AS pos FROM orders'''
      for j in _BLOOM_JS
  )}
), tested AS (
  SELECT p.o_orderkey, p.o_custkey, p.o_orderpriority,
         (sum(CASE WHEN (coalesce(b.word, 0)
                          & (1::BIGINT << (p.pos % {BLOOM_BITS_PER_WORD})::INT)) <> 0
                   THEN 1 ELSE 0 END) = {BLOOM_HASHES}) AS bloom_pass
  FROM probe_bits p
  LEFT JOIN bloom b ON (p.pos // {BLOOM_BITS_PER_WORD})::INT = b.word_idx
  GROUP BY 1, 2, 3
), truth AS (
  SELECT t.*, (s.c_custkey IS NOT NULL) AS is_match
  FROM tested t LEFT JOIN seg s ON t.o_custkey = s.c_custkey
)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_bloom_pass,
       sum(CASE WHEN is_match THEN 1 ELSE 0 END)::BIGINT AS n_true_match,
       sum(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)::BIGINT
         AS n_false_pos,
       CASE WHEN count(*) > sum(CASE WHEN is_match THEN 1 ELSE 0 END)
            THEN round(sum(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)::DOUBLE
                       / (count(*) - sum(CASE WHEN is_match THEN 1 ELSE 0 END)), 6)
            ELSE 0.0 END AS fp_rate
FROM truth
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------- quantiles
# Mergeable equi-width histogram quantile sketch. The scale story: exact
# percentiles need a full sort (or an order-dependent streaming sketch
# like GK/KLL/t-digest, which no cross-engine oracle can replay); an
# equi-width histogram over a FIXED bucketing is order-independent,
# mergeable by plain addition (map-side combine IS the merge), costs one
# scan + a <=HQ_BUCKETS-row aggregate, and answers any quantile with
# error bounded by one bucket width. Boundaries come from an exact
# min/max pre-pass (two scans total — the same two-scan discipline as
# plans/stats.py's profiler); shards that reuse the boundaries merge by
# summing counts (pinned by test).
#
# Everything is exact integer arithmetic until ONE final IEEE division,
# the same fixed-point discipline as k-means/PageRank/BPE: values
# quantize by floor(x * 64) (power of two — exact in doubles), buckets
# by integer division over the quantized span, the rank by
# ceil-as-integers, and the in-bucket linear interpolation as a ratio of
# exact int64 products. No round() anywhere — there is no .5 boundary to
# disagree on.

HQ_BUCKETS = 64
HQ_SCALE = 64  # power of two: x*HQ_SCALE is exact in doubles
HQ_PHIS = (25, 50, 75, 90, 99)  # integer percents, exact rank math


def _hq_quantized(col: Column) -> Column:
    return F.floor(col * HQ_SCALE).cast("long")


def hq_counts(df: DataFrame, col: str, qmin: int, span: int) -> DataFrame:
    """The sketch itself: (bucket, cnt) under boundaries [qmin,
    qmin+span) split into HQ_BUCKETS equi-width cells. Two sketches
    built under the SAME boundaries merge by summing cnt per bucket."""
    return (
        df.where(F.col(col).isNotNull())
        .select(
            (
                (_hq_quantized(F.col(col)) - F.lit(int(qmin)))
                * HQ_BUCKETS
            ).alias("sq")
        )
        .select(F.expr(f"sq div {int(span)}L").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch percentiles of lineitem extended price: for each
    phi, the rank, the bucket that covers it, the bucket's exact bounds
    (lo/hi are /64ths — exact doubles), and the interpolated estimate
    (one IEEE division of exact int64 products). The exact-sort twin is
    quantity_percentiles (plans/setops.py); this is the form that runs
    at 100 TB — one scan, a 64-row aggregate, no sort."""
    li = read_testdata(spark, sf_dir, "lineitem").select("l_extendedprice")
    q = _hq_quantized(F.col("l_extendedprice"))
    qmin, qmax, n = li.agg(F.min(q), F.max(q), F.count(q)).first()
    span = int(qmax) - int(qmin) + 1
    counts = hq_counts(li, "l_extendedprice", int(qmin), span)
    from pyspark.sql import Window

    cum = counts.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bucket"))
    )
    phis = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in HQ_PHIS])).alias("phi")
    )
    # rank = ceil(phi% * n) computed as exact integers — a float here
    # could disagree with the oracle when a bucket's cum lands exactly
    # on the rank
    rank_expr = F.expr(f"(phi * {int(n)}L + 99) div 100")
    ranked = (
        phis.join(cum)
        .where(F.col("cum") >= rank_expr)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("phi").orderBy("bucket")
            ),
        )
        .where(F.col("rk") == 1)
    )
    lo_q = F.lit(int(qmin)) + F.expr(f"(bucket * {span}L) div {HQ_BUCKETS}")
    hi_q = F.lit(int(qmin)) + F.expr(
        f"((bucket + 1) * {span}L) div {HQ_BUCKETS}"
    )
    rank = rank_expr.cast("long")
    pos = rank - (F.col("cum") - F.col("cnt"))
    return ranked.select(
        F.col("phi").cast("long").alias("phi"),
        rank.alias("rank"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt").alias("n_in_bucket"),
        (lo_q.cast("double") / HQ_SCALE).alias("bucket_lo"),
        (hi_q.cast("double") / HQ_SCALE).alias("bucket_hi"),
        (
            (lo_q * F.col("cnt") + (hi_q - lo_q) * pos).cast("double")
            / (F.col("cnt") * HQ_SCALE).cast("double")
        ).alias("est"),
    )


VALUE_QUANTILE_SKETCH_SQL = f"""
WITH q AS (
  SELECT CAST(floor(l_extendedprice * {HQ_SCALE}) AS BIGINT) AS q
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), bounds AS (
  SELECT min(q) AS qmin, max(q) - min(q) + 1 AS span,
         count(*)::BIGINT AS n
  FROM q
), counts AS (
  SELECT ((q.q - b.qmin) * {HQ_BUCKETS}) // b.span AS bucket,
         count(*)::BIGINT AS cnt
  FROM q, bounds b GROUP BY 1
), cum AS (
  SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket)::BIGINT AS cum
  FROM counts
), phis AS (
  SELECT unnest([{", ".join(str(p) for p in HQ_PHIS)}])::BIGINT AS phi
), hit AS (
  SELECT phi, bucket, cnt, cum,
         (phi * b.n + 99) // 100 AS rank, b.qmin, b.span,
         row_number() OVER (PARTITION BY phi ORDER BY bucket) AS rk
  FROM phis, cum, bounds b
  WHERE cum >= (phi * b.n + 99) // 100
)
SELECT phi, rank, bucket, cnt AS n_in_bucket,
       (qmin + (bucket * span) // {HQ_BUCKETS})::DOUBLE / {HQ_SCALE}
         AS bucket_lo,
       (qmin + ((bucket + 1) * span) // {HQ_BUCKETS})::DOUBLE / {HQ_SCALE}
         AS bucket_hi,
       ((qmin + (bucket * span) // {HQ_BUCKETS}) * cnt
        + (((bucket + 1) * span) // {HQ_BUCKETS}
           - (bucket * span) // {HQ_BUCKETS}) * (rank - (cum - cnt)))::DOUBLE
       / (cnt * {HQ_SCALE})::DOUBLE AS est
FROM hit WHERE rk = 1
"""
