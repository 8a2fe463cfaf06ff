"""Near-duplicate detection over the documents table — the training-data
pipeline's signature dedup family: word-shingle MinHash + LSH banding,
SimHash, and exact n-gram Jaccard verification.

All hashing is md5-based (available and bit-identical in every engine) so
each operator is oracle-checkable; the MinHash "values" are lexicographic
minima of hex digests, which is a uniform order statistic — exactly what
MinHash needs — without any engine-specific hash function.

Scale shapes:
- signatures/bands: narrow per-row projections, no shuffle;
- LSH candidate join: explode bands (xB rows) -> self equi-join on
  (band_idx, band_hash). Shuffle O(n·B) on uniform keys. This is the
  100 TB path: the quadratic pairwise compare never materializes, only
  same-bucket candidates are scored;
- *_pairs_exact variants are the O(n²) correctness baseline for bounded
  inputs (and the oracle anchor for the LSH path's scoring function).

Everything is built-in expressions (codegen'd); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.operators.txlog import EmptyChangeFeed
from de_final_project_spark.sources.readers import read_testdata

SHINGLE_K = 3
N_HASHES = 16
LSH_BANDS = 4  # 4 bands x 4 rows
LSH_ROWS = N_HASHES // LSH_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32


def _norm_tokens(text_col: Column) -> Column:
    """Lowercased, whitespace-normalized word tokens."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " "
    )


def shingle_set(text_col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles; documents shorter than k tokens collapse
    to a single whole-text shingle."""
    toks = _norm_tokens(text_col)
    n = F.size(toks)
    shingles = F.when(
        n < k, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return F.array_distinct(shingles)


def minhash_signature(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash signature: for hash i, min over shingles of md5('i:'+s).

    The lexicographic min of a uniform hex digest is a valid min-hash;
    P(min_a == min_b) = Jaccard(a, b) as usual."""

    def hasher(i: int):
        # NB: a plain unary lambda — a two-arg lambda would be bound by
        # pyspark as (element, array_index) and shadow the hash number.
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(
        *[
            F.array_min(F.transform(shingles, hasher(i)))
            for i in range(1, n_hashes + 1)
        ]
    )


def lsh_bands(signature: Column, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> Column:
    """Band the signature: band j hashes sig[j*rows .. j*rows+rows-1].
    Docs sharing any band hash become candidate pairs."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.element_at(signature, j * rows + r + 1) for r in range(rows)]
                    )
                ).alias("band_hash"),
            )
            for j in range(bands)
        ]
    )


def _docs_with_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_final_project_spark.session import fan_out

    docs = fan_out(read_testdata(spark, sf_dir, "documents"))
    return docs.select("doc_id", shingle_set(F.col("text")).alias("shingles"))


def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LSH band hashes (doc_id, band_idx, band_hash) — the
    bucketing relation of the MinHash-LSH dedup.

    The persist between signature and banding is load-bearing: without a
    materialization boundary Catalyst's CollapseProject inlines the
    16-min-hash array expression into every ``element_at`` of every band
    hash, re-evaluating the whole signature O(bands×rows) times per row
    (measured ~60× slowdown at sf0.1). The cached relation is
    doc-count-sized — 16 hex digests per doc."""
    sigs = _docs_with_shingles(spark, sf_dir).select(
        "doc_id", minhash_signature(F.col("shingles")).alias("sig")
    ).persist()
    with_sig = sigs.select("doc_id", lsh_bands(F.col("sig")).alias("bands"))
    return with_sig.select(
        "doc_id", F.explode("bands").alias("b")
    ).select("doc_id", F.col("b.band_idx").alias("band_idx"),
             F.col("b.band_hash").alias("band_hash"))


# Skew guard on the LSH candidate self-join (VERDICT r8 item 9): the
# band equi-join assumes roughly uniform bucket keys, but a hot shingle
# set (boilerplate headers, templated docs) concentrates one
# (band_idx, band_hash) bucket — and a self-join bucket of m rows emits
# m² pairs in ONE reducer task, the classic straggler. Above the
# threshold the join is salted with the operators/skew.py helpers:
# the left side hashes into BAND_N_SALTS sub-buckets and the right side
# replicates across the salt domain, so the hot bucket's pair
# generation spreads over BAND_N_SALTS tasks with identical output.
# Measured bucket histograms (max rows in any band bucket / docs):
# sf0.001 → 4/500, sf0.01 → 3/500, sf0.1 → 4/5000, sf1 → 40/50000 —
# organic buckets stay tiny (the threshold is straggler insurance, not
# a steady-state path), and pair output with/without salt is asserted
# identical by test_band_join_skew_guard_salted_output_identical. The
# measurement aggregate rides the caller's persisted band relation:
# A/B at sf1 read 33.1/40.7 s (agg off) vs 39.3/33.3 s (on) — free.
BAND_SALT_THRESHOLD = 2048
BAND_N_SALTS = 8


def _band_candidates(bands: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Distinct candidate pairs (a_id < b_id) from the band relation.
    ``max_bucket`` (the largest same-bucket row count) picks the plan:
    callers may pass a known value; None measures it with one hash
    aggregate over the (persisted) band relation — O(buckets) rows,
    trivially parallel, and worth one extra job to avoid an m² task."""
    from de_final_project_spark.operators.skew import (
        SALT_COL,
        replicate_small_for_salted_join,
        with_salt,
    )

    if max_bucket is None:
        max_bucket = (
            bands.groupBy("band_idx", "band_hash")
            .count()
            .agg(F.max("count"))
            .first()[0]
            or 0
        )
    a = bands.select(F.col("doc_id").alias("a_id"), "band_idx", "band_hash")
    b = bands.select(F.col("doc_id").alias("b_id"), "band_idx", "band_hash")
    if max_bucket > BAND_SALT_THRESHOLD:
        a = with_salt(a, ["a_id"], BAND_N_SALTS)
        b = replicate_small_for_salted_join(b, BAND_N_SALTS)
        keys = ["band_idx", "band_hash", SALT_COL]
    else:
        keys = ["band_idx", "band_hash"]
    return (
        a.join(b, keys)
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def neardup_pairs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: candidates sharing any band bucket,
    verified with exact shingle Jaccard >= threshold.

    Plan: bands self-join on (band_idx, band_hash) -> distinct candidate
    pairs -> broadcast-free jaccard scoring via a join back to shingle
    sets. At 100 TB only same-bucket pairs are ever scored; a hot
    bucket past BAND_SALT_THRESHOLD flips the self-join to the salted
    form (see _band_candidates)."""
    # Both persists bound recomputation: shingle sets feed the signature
    # AND both sides of the jaccard verification; bands feed both sides
    # of the candidate self-join. Without them each branch replays the
    # full tokenize/shingle/hash pipeline.
    sh = _docs_with_shingles(spark, sf_dir).persist()
    bands = minhash_bands(spark, sf_dir).persist()
    cands = _band_candidates(bands)
    sh_a = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cands.join(sh_a, "a_id")
        .join(sh_b, "b_id")
        .select(
            "a_id", "b_id",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING corpus — the shape a
    continuously-fed training pipeline actually runs: candidates come
    only from incoming-bands ⋈ existing-bands, so per ingest cycle the
    work is O(batch·B) probes of the corpus band index, never a corpus
    self-join and never re-clustering history. At 100 TB the existing
    bands relation is a materialized table partitioned by
    (band_idx, band_hash); each batch probes it with a shuffle of
    batch-size, not corpus-size.

    Batch membership is deterministic here (doc_id % 10 == 0 plays the
    incoming batch) so the operator is oracle-checkable; production
    callers pass any predicate/batch column the same way.
    """
    is_incoming = F.col("doc_id") % 10 == 0
    sh = _docs_with_shingles(spark, sf_dir).persist()
    bands = minhash_bands(spark, sf_dir).persist()
    new_bands = bands.where(is_incoming).select(
        F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
    )
    old_bands = bands.where(~is_incoming).select(
        F.col("doc_id").alias("old_id"), "band_idx", "band_hash"
    )
    cands = (
        new_bands.join(old_bands, ["band_idx", "band_hash"])
        .select("new_id", "old_id")
        .distinct()
    )
    sh_new = sh.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sh_n"))
    sh_old = sh.select(F.col("doc_id").alias("old_id"), F.col("shingles").alias("sh_o"))
    inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_o")))
    union = F.size(F.col("sh_n")) + F.size(F.col("sh_o")) - inter
    return (
        cands.join(sh_new, "new_id")
        .join(sh_old, "old_id")
        .select("new_id", "old_id", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def ngram_jaccard_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-Jaccard pairs at threshold 0.3 via an inverted-index
    candidate join — not an approximation: Jaccard > 0 requires at least
    one shared shingle, so candidates = posting-list self-join on the
    shingle, then exact verification. Replaces the naive O(n²) cross
    product (measured 30× slower at sf0.1) with an equi-join whose volume
    is Σ df(s)² over the vocabulary — bounded because near-dup corpora
    have long-tailed shingle frequencies. A hot-shingle cap (drop
    stop-shingles with df above a bound) is the standard guard at 100 TB
    when the frequency tail is heavy.

    The intersection is COUNTED on the postings join directly (shingles
    are per-doc-distinct, so matches per (a,b) = |intersection|): the
    wide stage shuffles only (long, long) pairs into a partially-
    aggregated count, and the union size comes from joining two scalar
    per-doc sizes afterwards. The previous form (distinct pairs, then
    re-join both full shingle ARRAYS for array_intersect) shipped ~1.5 KB
    of duplicated array per candidate and filled 78 GB of spill at sf1
    (279M candidates) before dying — this form moves ~4.5 GB for the
    same input and needs no distinct at all. sf1 proof finding."""
    sh = _docs_with_shingles(spark, sf_dir).persist()
    posts = sh.select("doc_id", F.explode("shingles").alias("s"))
    inter = (
        posts.select(F.col("doc_id").alias("a_id"), "s")
        .join(posts.select(F.col("doc_id").alias("b_id"), "s"), "s")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("_n_inter"))
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("_n"))
    sz_a = sizes.select(F.col("doc_id").alias("a_id"), F.col("_n").alias("_na"))
    sz_b = sizes.select(F.col("doc_id").alias("b_id"), F.col("_n").alias("_nb"))
    union = F.col("_na") + F.col("_nb") - F.col("_n_inter")
    return (
        inter.join(F.broadcast(sz_a), "a_id")
        .join(F.broadcast(sz_b), "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(F.col("_n_inter") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(0.3))
    )


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------


def _token_hash(tok: Column) -> Column:
    """32-bit integer hash of a token: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash_from_hashes(thashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash from a pre-computed token-hash array: bit b is set iff the
    sum of +-1 votes from each token hash's bit b is >= 0.

    Takes the hash ARRAY (not the text) so callers can materialize it
    once — referencing a tokenize+hash expression from all ``bits``
    aggregates would re-evaluate it per bit (the CollapseProject blowup;
    see minhash_bands)."""

    def voter(b: int):
        # binary (acc, elem) lambda via closure; see hasher() note above
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b) % 2 == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for b in range(bits):
        votes = F.aggregate(thashes, F.lit(0).cast("long"), voter(b))
        bit_cols.append(
            F.when(votes >= 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def simhash(text_col: Column, bits: int = SIMHASH_BITS) -> Column:
    """Classic SimHash over word tokens (with multiplicity). Convenience
    single-expression form — inside a DataFrame plan prefer materializing
    the token hashes and using ``simhash_from_hashes`` (see simhash_docs)."""
    return simhash_from_hashes(F.transform(_norm_tokens(text_col), _token_hash), bits)


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SimHash value (doc_id, simhash).

    Shape: explode token hashes -> 32 per-bit vote sums in ONE hash
    aggregate -> recombine bits. Spark evaluates higher-order-function
    lambdas interpreted (no whole-stage codegen), so the natural
    ``F.aggregate``-per-bit form runs ~3× slower even with the hash
    array cached; the explode+groupBy form keeps every expression inside
    codegen and its shuffle carries one row per token hash, partially
    aggregated map-side. explode_outer + null-vote-0 preserves the
    empty-document semantics of the fold (zero votes -> all bits set)."""
    from de_final_project_spark.session import fan_out

    docs = fan_out(read_testdata(spark, sf_dir, "documents"))
    ex = docs.select(
        "doc_id",
        F.explode_outer(
            F.transform(_norm_tokens(F.col("text")), _token_hash)
        ).alias("h"),
    )
    vote = lambda b: F.sum(  # noqa: E731
        F.when(F.col("h").isNull(), 0)
        .when(F.shiftright(F.col("h"), b) % 2 == 1, 1)
        .otherwise(-1)
    )
    votes = ex.groupBy("doc_id").agg(
        *[vote(b).alias(f"_v{b}") for b in range(SIMHASH_BITS)]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"_v{b}") >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    return votes.select("doc_id", sim.alias("simhash"))


def _simhash_block_plan(bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """(offset, width) per block, widths as even as possible."""
    base, extra = divmod(bits, n_blocks)
    out, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_candidate_keys(
    simhash: Column, bits: int = SIMHASH_BITS, max_hamming: int = 3, n_blocks: int = 6
) -> Column:
    """Array of (table_id, key) structs for pigeonhole LSH over Hamming
    distance: split the ``bits``-bit hash into ``n_blocks`` blocks — a
    pair within Hamming ``max_hamming`` differs in at most ``max_hamming``
    blocks, so it agrees exactly on every block of at least one
    ``n_blocks - max_hamming``-sized block subset. One table per subset
    (C(n_blocks, max_hamming) of them), key = the subset's blocks packed
    into one long.

    Block width sets the skew/recall-cost tradeoff: keys are
    ``(n_blocks - max_hamming) * bits/n_blocks`` bits wide — with the
    defaults (32-bit hash, 6 blocks, k=3) that's 16-18-bit keys, i.e.
    ~10^5 buckets, vs the naive 4×8-bit single-block scheme whose 256
    buckets still cost O(n²/256) comparisons at cluster scale."""
    from itertools import combinations

    plan = _simhash_block_plan(bits, n_blocks)
    keep = n_blocks - max_hamming
    entries = []
    for tid, subset in enumerate(combinations(range(n_blocks), keep)):
        key = F.lit(0).cast("long")
        for j in subset:
            off, w = plan[j]
            block = F.shiftright(simhash, off).bitwiseAND(F.lit((1 << w) - 1))
            key = F.shiftleft(key, w) + block
        entries.append(F.struct(F.lit(tid).alias("tbl"), key.alias("key")))
    return F.array(*entries)


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with SimHash Hamming distance <= 3 via pigeonhole-blocked
    LSH: candidates come from an equi-join on (table_id, packed block
    key) — C(6,3)=20 tables of 16-18-bit keys — and ``bit_count(xor)``
    runs only on candidates. Shuffle is O(20·n) explode + one shuffled
    equi-join; no all-pairs comparison anywhere (the O(n²) scoring form
    survives as simhash_neardup_pairs_allpairs, a test-only oracle twin).

    Honest measurement: on the synthetic corpus the match density is
    extreme (~0.8% of ALL pairs at sf0.1), so the exact form is locally
    faster (2.7s vs 15.9s at sf0.1) — candidate dedup across 20 tables
    dominates when nearly everything collides. The blocked form is the
    scale path anyway: at n=10⁹ the n² form is infeasible at ANY constant
    factor, while banded cost tracks Σ(bucket²) which shrinks as real
    corpora are sparse. n_blocks is the knob: more blocks → wider keys →
    smaller buckets but more tables.

    The simhash relation is persisted: both join sides read it, and
    without the boundary Catalyst would recompute the 32-aggregate
    vote pipeline twice. The cache is deliberately NOT unpersisted —
    the result is lazy, so the persist must outlive this call; the
    blocks are evictable (MEMORY_AND_DISK default) and bounded at one
    row per doc. Long-lived sessions wanting strict cleanup should
    ``df.unpersist()`` via ``spark.catalog.clearCache()`` between
    query batches (the driver twin does per-process isolation instead)."""
    d = simhash_docs(spark, sf_dir).persist()
    keyed = d.select(
        "doc_id",
        "simhash",
        F.explode(simhash_candidate_keys(F.col("simhash"))).alias("tk"),
    ).select("doc_id", "simhash", "tk.tbl", "tk.key")
    a = keyed.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("h_a"), "tbl", "key"
    )
    b = keyed.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("h_b"), "tbl", "key"
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["tbl", "key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.cast("long").alias("hamming"))
        .where(F.col("hamming") <= 3)
        .distinct()
    )


def simhash_neardup_pairs_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(n²) exact scoring — correctness baseline for the blocked form
    (tests assert set equality); never the default path. Size-guarded;
    simhash_neardup_pairs (pigeonhole blocks) is the scale path."""
    from de_final_project_spark.operators.guards import guard_exact_baseline

    d = guard_exact_baseline(
        simhash_docs(spark, sf_dir),
        "simhash_neardup_pairs_allpairs",
        "simhash_neardup_pairs",
    ).repartition(spark.sparkContext.defaultParallelism)
    a = d.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("h_a"))
    b = d.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("h_b"))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.cast("long").alias("hamming"))
        .where(F.col("hamming") <= 3)
    )


# ----------------------------------------------------------------------
# Oracle SQL
# ----------------------------------------------------------------------

_SHINGLES_CTE = """
shingled AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(1, len(toks) - 2),
                                    i -> array_to_string(toks[i:i+2], ' '))
           END) AS shingles
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
    FROM documents
  )
)
"""

_SIG_EXPR = ", ".join(
    f"list_min(list_transform(shingles, s -> md5('{i}:' || s))) AS sig_{i}"
    for i in range(1, N_HASHES + 1)
)

_BANDS_EXPR = ", ".join(
    "md5(" + " || ',' || ".join(f"sig_{j * LSH_ROWS + r + 1}" for r in range(LSH_ROWS)) + f") AS band_{j}"
    for j in range(LSH_BANDS)
)

_BANDS_CTE = f"""
sigs AS (SELECT doc_id, {_SIG_EXPR} FROM shingled),
banded AS (SELECT doc_id, {_BANDS_EXPR} FROM sigs),
bands AS (
  SELECT doc_id, u.band_idx, u.band_hash
  FROM banded, UNNEST(
    [{', '.join(f"{{'band_idx': {j}, 'band_hash': band_{j}}}" for j in range(LSH_BANDS))}]
  ) AS t(u)
)
"""

MINHASH_BANDS_SQL = f"""
WITH {_SHINGLES_CTE}, {_BANDS_CTE}
SELECT doc_id, band_idx, band_hash FROM bands
"""

NEARDUP_PAIRS_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE}, {_BANDS_CTE},
cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
)
SELECT a_id, b_id,
       round(len(list_intersect(sa.shingles, sb.shingles))
             / (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cands
JOIN shingled sa ON sa.doc_id = a_id
JOIN shingled sb ON sb.doc_id = b_id
WHERE round(len(list_intersect(sa.shingles, sb.shingles))
            / (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))), 6) >= {JACCARD_THRESHOLD}
"""

INCREMENTAL_NEARDUP_SQL = f"""
WITH {_SHINGLES_CTE}, {_BANDS_CTE},
cands AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
)
SELECT new_id, old_id,
       round(len(list_intersect(sn.shingles, so.shingles))
             / (len(sn.shingles) + len(so.shingles)
                - len(list_intersect(sn.shingles, so.shingles))), 6) AS jaccard
FROM cands
JOIN shingled sn ON sn.doc_id = new_id
JOIN shingled so ON so.doc_id = old_id
WHERE round(len(list_intersect(sn.shingles, so.shingles))
            / (len(sn.shingles) + len(so.shingles)
               - len(list_intersect(sn.shingles, so.shingles))), 6) >= {JACCARD_THRESHOLD}
"""

# Same inverted-index candidate generation as the Spark side (exact:
# jaccard >= 0.3 > 0 implies a shared shingle) — keeps the oracle
# checkable at sf0.1+ where the naive O(n^2) form takes minutes.
# Counting form mirrors the engine plan: shingles are per-doc-distinct,
# so COUNT(*) on the postings self-join IS the intersection size — no
# array re-join, no DISTINCT (same 78 GB-spill hazard class in any
# engine at sf1 candidate volumes).
NGRAM_JACCARD_PAIRS_SQL = f"""
WITH {_SHINGLES_CTE},
posts AS (SELECT doc_id, unnest(shingles) AS s FROM shingled),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS n_inter
  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(shingles) AS n FROM shingled)
SELECT a_id, b_id,
       round(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE round(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.3
"""

_SIMHASH_EXPR = f"""
list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}), b ->
  CASE WHEN list_sum(list_transform(thashes, h ->
         CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END)) >= 0
       THEN (1::BIGINT << b) ELSE 0::BIGINT END))
"""

# The outer ::BIGINT matters for the driver oracle: DuckDB's list_sum
# returns HUGEINT, which pandas fetches as float64 and the value hash then
# diverges from Spark's int64 (confirmed red in CORRECTNESS_r01.json).
SIMHASH_DOCS_SQL = f"""
SELECT doc_id, ({_SIMHASH_EXPR})::BIGINT AS simhash
FROM (
  SELECT doc_id,
         list_transform(
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS thashes
  FROM documents
)
"""

SIMHASH_NEARDUP_PAIRS_SQL = f"""
WITH h AS (
  SELECT doc_id, ({_SIMHASH_EXPR})::BIGINT AS simhash
  FROM (
    SELECT doc_id,
           list_transform(
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
             t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS thashes
    FROM documents
  )
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ----------------------------------------------------------------------
# Cluster formation: pairs -> connected components -> canonical docs.
# ----------------------------------------------------------------------


def connected_components(
    edges: DataFrame, a: str = "a_id", b: str = "b_id", max_iter: int = 25
) -> DataFrame:
    """(node, component) for the undirected graph given as an edge list —
    component id is the minimum node id reachable from the node.

    Iterative min-label propagation (the scalable Spark shape for the
    union-find step every near-dup pipeline ends with): each round every
    node takes the min label among itself and its neighbors; converged
    when no label changes. Rounds are O(graph diameter) — near-dup
    graphs are overwhelmingly tiny star/clique clusters, so 2-3 rounds
    close them; each round is one shuffle on node id. ``localCheckpoint``
    truncates the growing lineage so round N's plan doesn't replay
    rounds 1..N-1.
    """
    # Materialize the edge list ONCE. Without this every iteration (and
    # every convergence probe) replays the upstream edge derivation — for
    # near-dup input that is the whole shingle/MinHash/band pipeline,
    # turning an O(diameter) loop into O(diameter × full-pipeline): ~60×
    # slower measured at sf0.1.
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # ONE job per round (r13, guide §2.4/§8 loop discipline): labels are
    # MONOTONE — each round takes F.least(old, neighbor min), so every
    # label can only decrease — which makes an exact label-sum an exact
    # convergence witness (sum unchanged ⟺ every label unchanged). The
    # lazy checkpoint is materialized by the same full-scan sum job, so
    # the old shape's two jobs per round (eager checkpoint + a
    # changed-rows join probe) and the probe's per-round join both
    # vanish. DECIMAL(38,0) keeps the sum exact for any id range (a
    # silent int64 wrap could fake a fixed point). Labels at the fixed
    # point are bit-identical to the old loop's — only the convergence
    # TEST changed, and it fires at exactly the same round.
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = updated.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).first()[0]
        labels = updated
        if prev_sum is not None and new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup decision output: MinHash near-dup pairs -> connected
    components -> per-doc (cluster_id, is_canonical). Canonical = lowest
    doc_id in the cluster (deterministic); docs with no near-dup are their
    own singleton cluster. Downstream keeps ``is_canonical`` rows."""
    pairs = neardup_pairs_minhash(spark, sf_dir).select("a_id", "b_id")
    comp = connected_components(pairs)
    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(comp, docs["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", (F.col("doc_id") == F.col("cluster_id")))
    )


NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_BANDS_CTE},
cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
pairs AS (
  SELECT a_id, b_id
  FROM cands
  JOIN shingled sa ON sa.doc_id = a_id
  JOIN shingled sb ON sb.doc_id = b_id
  WHERE round(len(list_intersect(sa.shingles, sb.shingles))
              / (len(sa.shingles) + len(sb.shingles)
                 - len(list_intersect(sa.shingles, sb.shingles))), 6)
        >= {JACCARD_THRESHOLD}
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
comp AS (SELECT src AS node, min(dst) AS min_reach FROM reach GROUP BY src)
SELECT d.doc_id,
       coalesce(least(c.min_reach, d.doc_id), d.doc_id) AS cluster_id,
       coalesce(least(c.min_reach, d.doc_id), d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method validation summary: pair counts per near-dup method
    (MinHash-Jaccard, SimHash-Hamming, embedding-cosine) and the sizes of
    their pairwise intersections — the calibration readout for choosing
    thresholds before a 100 TB run. Each method's pair set is computed by
    its own operator; intersections are inner joins on the (a_id, b_id)
    key, so the whole report costs three pair pipelines + three
    dimension-sized joins, returned as ONE row."""
    from de_final_project_spark.operators.similarity import (
        embedding_neardup_exact,
    )

    mh = neardup_pairs_minhash(spark, sf_dir).select("a_id", "b_id").persist()
    sh = simhash_neardup_pairs(spark, sf_dir).select("a_id", "b_id").persist()
    em = embedding_neardup_exact(spark, sf_dir).select("a_id", "b_id").persist()
    row = {
        "n_minhash": mh.count(),
        "n_simhash": sh.count(),
        "n_embedding": em.count(),
        "n_minhash_and_simhash": mh.join(sh, ["a_id", "b_id"]).count(),
        "n_minhash_and_embedding": mh.join(em, ["a_id", "b_id"]).count(),
        "n_simhash_and_embedding": sh.join(em, ["a_id", "b_id"]).count(),
    }
    return spark.createDataFrame(
        [tuple(row.values())],
        ", ".join(f"{k} long" for k in row),
    )


from de_final_project_spark.operators.similarity import (  # noqa: E402
    EMBEDDING_NEARDUP_SQL as _EMBEDDING_NEARDUP_SQL,
)

_PAIRSET = "SELECT a_id, b_id FROM ({sql})"

DEDUP_METHOD_AGREEMENT_SQL = f"""
WITH mh AS ({_PAIRSET.format(sql=NEARDUP_PAIRS_MINHASH_SQL)}),
sh AS ({_PAIRSET.format(sql=SIMHASH_NEARDUP_PAIRS_SQL)}),
em AS ({_PAIRSET.format(sql=_EMBEDDING_NEARDUP_SQL)})
SELECT (SELECT count(*) FROM mh) AS n_minhash,
       (SELECT count(*) FROM sh) AS n_simhash,
       (SELECT count(*) FROM em) AS n_embedding,
       (SELECT count(*) FROM mh JOIN sh USING (a_id, b_id)) AS n_minhash_and_simhash,
       (SELECT count(*) FROM mh JOIN em USING (a_id, b_id)) AS n_minhash_and_embedding,
       (SELECT count(*) FROM sh JOIN em USING (a_id, b_id)) AS n_simhash_and_embedding
"""


# ----------------------------------------------------------------------
# Incrementally-maintained near-dup index (VERDICT r9 item 3)
# ----------------------------------------------------------------------

_NDIDX_APP = "ndidx"

# Band-index bucket count: the partition key is a pure function of
# band_hash (which is part of the merge key, so rows never move
# partitions). Fixed for the life of an index.
N_BAND_BUCKETS = 64


def _hbucket_col():
    return F.pmod(
        F.crc32(F.col("band_hash").cast("binary")), F.lit(N_BAND_BUCKETS)
    ).cast("long")


class IncrementalNearDupIndex:
    """A PERSISTED MinHash band index maintained from a documents
    table's change feed — the steady-state form of near-dup detection
    at 100 TB: each refresh signs ONLY the docs the feed names (never
    the corpus), probes their bands against the stored index with one
    equi-join, verifies candidates with exact shingle Jaccard against a
    semi-join-restricted text read, and lands two txn-stamped commits
    (verdict append, band-index merge) so a crashed refresh replays as
    a no-op per table. This is the ``ivm.py`` subscription pattern
    applied to the dedup tier (the streamed IVF index at
    streaming/pipeline.py:241 is the vector-side precedent).

    Costs per refresh: O(batch) signature work, O(batch·B) index
    probes, O(candidates) verification text reads. The corpus is
    re-read only for candidate OLD doc texts (left-semi restricted).

    The stored band relation is PARTITIONED by ``hbucket =
    crc32(band_hash) % N_BAND_BUCKETS``: a batch's probe join reads
    only the buckets its own band hashes map to (lossless — a
    band-hash match implies an equal bucket), and the MERGE rewrites
    only touched buckets, so refresh SCAN volume is O(touched
    buckets), not O(index) (VERDICT r10 item 3). To keep the bucket a
    pure function of the merge key (the table invariant that lets rows
    never move partitions), the key is the full band row (doc_id,
    band_idx, band_hash); updates retire their old rows via tombstone
    marker rows (NULL ``sv``) built from the stored index, and the
    ``sv`` payload column records the commit version that signed the
    row (refresh provenance). Insert-only batches skip the tombstone
    pass entirely — the only refresh step that reads the index outside
    the batch's own buckets.

    Verdict semantics are EMISSION-TIME: a pair is recorded when its
    later doc arrives. Under insert-only feeds the accumulated verdicts
    equal a full-corpus recompute exactly (each pair is found once —
    within its batch via the batch self-join, or against the stored
    index otherwise); under updates/deletes the INDEX stays exact (old
    band rows are merged away) while already-emitted verdicts are
    historical, like any CDC consumer's output."""

    def __init__(self, docs: "VersionedTable", root: str):
        import os

        from de_final_project_spark.operators.txlog import VersionedTable

        self.docs = docs
        self.index = VersionedTable(
            os.path.join(root, "band_index"), partition_col="hbucket"
        )
        self.verdicts = VersionedTable(os.path.join(root, "verdicts"))

    def _applied(self, table) -> int | None:
        head = table.latest_version()
        if head is None:
            return None
        return table._read_entry(head).get("txn", {}).get(_NDIDX_APP)

    def applied_version(self) -> int | None:
        return self._applied(self.index)

    @staticmethod
    def _sign(docs_df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(shingles, band rows) for a doc frame — the same signature
        pipeline the batch operators use, applied to ONLY these rows.
        The batch is fanned out first: a change-feed/bronze read is
        typically one scan task, and shingle+MinHash is the refresh's
        dominant per-row cost (session.fan_out)."""
        from de_final_project_spark.session import fan_out

        sh = fan_out(docs_df).select(
            "doc_id", shingle_set(F.col("text")).alias("shingles")
        ).persist()
        # sigs IS persisted deliberately: the band frame is consumed by
        # a self-join whose two branches race to fill new_bands' cache —
        # without this, each branch recomputes the 128-hash MinHash
        # (measured: the build refresh doubled). Returned to the caller
        # for unpersist (it used to leak until the LRU caught it).
        sigs = sh.select(
            "doc_id", minhash_signature(F.col("shingles")).alias("sig")
        ).persist()
        bands = sigs.select(
            "doc_id", F.explode(lsh_bands(F.col("sig"))).alias("b")
        ).select(
            "doc_id",
            F.col("b.band_idx").cast("long").alias("band_idx"),
            F.col("b.band_hash").alias("band_hash"),
        ).withColumn("hbucket", _hbucket_col())
        return sh, sigs, bands

    def _verify(
        self, spark, cands: DataFrame, sh_new: DataFrame, base_v: int
    ) -> DataFrame:
        """Exact shingle-Jaccard over (new_id, other_id) candidates;
        other-side texts come from the PINNED base snapshot restricted
        to exactly the candidate ids (left-semi before shingling)."""
        other_docs = self.docs.read(spark, version=base_v).join(
            cands.select(F.col("other_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
        sh_other = other_docs.select(
            F.col("doc_id").alias("other_id"),
            shingle_set(F.col("text")).alias("sh_o"),
        )
        scored = (
            cands.join(
                sh_new.select(
                    F.col("doc_id").alias("new_id"),
                    F.col("shingles").alias("sh_n"),
                ),
                "new_id",
            )
            .join(sh_other, "other_id")
        )
        inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_o")))
        union = F.size(F.col("sh_n")) + F.size(F.col("sh_o")) - inter
        return (
            scored.select(
                F.least("new_id", "other_id").alias("a_id"),
                F.greatest("new_id", "other_id").alias("b_id"),
                F.round(inter / union, 6).alias("jaccard"),
            )
            .where(F.col("jaccard") >= JACCARD_THRESHOLD)
            .distinct()
        )

    def refresh(self, spark: SparkSession) -> dict:
        """Advance index + verdicts to the docs head. Returns a report:
        mode, the version window, ``signed_docs`` (rows through the
        signature pipeline — the churn-proportionality measurement) and
        ``n_candidates``."""
        base_v = self.docs.latest_version()
        if base_v is None:
            raise FileNotFoundError(f"no commits at {self.docs.path}")
        applied = self.applied_version()
        if applied is not None and applied >= base_v:
            return {"mode": "noop", "from": applied, "to": applied,
                    "signed_docs": 0, "n_candidates": 0}
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
                # metadata-only window: watermark stays put (ivm.py's
                # stance); real misuse ValueErrors now propagate.
                return {"mode": "noop", "from": applied, "to": base_v,
                        "signed_docs": 0, "n_candidates": 0}
            mode = "delta"
        # Control-plane proof that the window is insert-only: every
        # commit in (applied, base_v] is an append (log-entry ops, no
        # data IO). Then the feed carries no deletes/preimages BY
        # CONSTRUCTION (unique-keyed producer contract, the same
        # assumption _cdf_single_commit_fast documents), so the
        # "any removed rows?" probe job and the removed-side anti-join
        # are skipped outright.
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
        # (VERDICT r12 item 4): the insert-only fast path below skips
        # the MERGE, so a re-appended EXISTING doc_id would silently
        # duplicate band rows where the rewrite path upserted. One
        # column-pruned id semi-join (doc_id only — no band/text bytes
        # read) fails loudly instead; conf-disabled for producers that
        # enforce uniqueness upstream.
        if (
            mode == "delta"
            and insert_only
            and self.index.latest_version() is not None
            and self.docs.verify_insert_only_keys(spark)
        ):
            dup = (
                self.index.read(spark)
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
        sh_new, sigs_new, new_bands = self._sign(new_docs)
        new_bands = new_bands.persist()
        signed = new_docs.count()

        have_index = self.index.latest_version() is not None
        # ---- verdicts against the PRE-MERGE index + within the batch
        within = (
            new_bands.select(
                F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
            )
            .join(
                new_bands.select(
                    F.col("doc_id").alias("other_id"), "band_idx",
                    "band_hash",
                ),
                ["band_idx", "band_hash"],
            )
            .where(F.col("new_id") < F.col("other_id"))
            .select("new_id", "other_id")
        )
        cands = within
        if have_index:
            # bucket-pruned probe: only partitions the BATCH's band
            # hashes map to are listed/opened — lossless, because a
            # band-hash match implies an equal bucket. The bucket list
            # is bounded by N_BAND_BUCKETS (control-plane collect).
            bks = sorted(
                {r[0] for r in new_bands.select("hbucket").distinct().collect()}
            )
            stored = self.index.read(
                spark,
                where="hbucket IN (%s)" % ", ".join(str(b) for b in bks)
                if bks
                else "hbucket IS NULL",
            )
            if not insert_only:
                stored = stored.join(removed_ids, "doc_id", "left_anti")
            probe = (
                new_bands.select(
                    F.col("doc_id").alias("new_id"), "band_idx",
                    "band_hash",
                )
                .join(
                    stored.select(
                        F.col("doc_id").alias("other_id"), "band_idx",
                        "band_hash",
                    ),
                    ["band_idx", "band_hash"],
                )
                .where(F.col("new_id") != F.col("other_id"))
                .select("new_id", "other_id")
            )
            cands = cands.unionByName(probe)
        cands = cands.distinct().persist()
        n_cands = cands.count()

        # The verdict commit and the band-index commit are INDEPENDENT:
        # separate tables (separate log dirs, separate head CAS); the
        # verdict branch reads cands (persisted, materialized above) +
        # the PINNED docs snapshot, the index branch reads new_bands
        # (persisted, materialized) + the feed — neither reads the
        # table the other commits to. Overlapping them back-fills the
        # ~1.3–1.9 s/commit staged-write floor of one branch with the
        # other's verification/staging jobs (guide §2.6; OPTIMIZATION
        # r12's top deferred item).
        from de_final_project_spark.session import run_concurrently

        def _commit_verdicts() -> None:
            verdict = self._verify(spark, cands, sh_new, base_v)
            if self._applied(self.verdicts) != base_v:
                if self.verdicts.latest_version() is None:
                    self.verdicts.overwrite(
                        verdict, txn=(_NDIDX_APP, base_v)
                    )
                else:
                    self.verdicts.append(verdict, txn=(_NDIDX_APP, base_v))

        # ---- band-index merge: full-row key, bucket-partitioned.
        # New rows carry sv=base_v (signed-at provenance); stale rows of
        # updated/removed docs become NULL-sv tombstones built FROM the
        # stored index (they inherit their real hbucket, so the merge
        # touches exactly the right partitions). Insert-only batches
        # skip the tombstone scan — the one refresh step that would
        # read outside the batch's own buckets.
        def _commit_index() -> None:
            new_rows = new_bands.withColumn(
                "sv", F.lit(base_v).cast("long")
            )
            if not have_index:
                self.index.overwrite(new_rows, txn=(_NDIDX_APP, base_v))
            elif insert_only:
                # Control-plane-proven insert-only window: every key
                # (doc_id, band_idx, band_hash) is NEW (append commits
                # carry unique doc_ids — the same producer contract the
                # tombstone skip above rides), so the MERGE's matched
                # clauses can never fire and the full-outer rewrite of
                # touched buckets would be the identity on every stored
                # row. Commit the new band rows as a pointer-list
                # APPEND instead: O(batch) staging, ZERO stored-index
                # IO (guide §1.2 — don't compute things you throw away;
                # auto_compact below still bounds the per-bucket
                # pointer lists).
                self.index.append(new_rows, txn=(_NDIDX_APP, base_v))
            else:
                src = new_rows
                if removed_ids.limit(1).count() > 0:
                    tomb = (
                        self.index.read(spark)
                        .join(removed_ids, "doc_id", "left_semi")
                        .join(
                            new_bands,
                            ["doc_id", "band_idx", "band_hash"],
                            "left_anti",
                        )
                        .select(
                            "doc_id", "band_idx", "band_hash", "hbucket",
                            F.lit(None).cast("long").alias("sv"),
                        )
                    )
                    src = src.unionByName(tomb)
                self.index.merge_into(
                    spark,
                    src,
                    on=["doc_id", "band_idx", "band_hash"],
                    matched_update={"sv": "s.sv"},
                    matched_update_condition="s.sv IS NOT NULL",
                    matched_delete_condition="s.sv IS NULL",
                    insert_condition="s.sv IS NOT NULL",
                    txn=(_NDIDX_APP, base_v),
                )

        run_concurrently(_commit_verdicts, _commit_index)
        for df in (new_docs, new_bands, cands, sh_new, sigs_new):
            df.unpersist()
        # small-file lifecycle (VERDICT r11 item 5): per-partition
        # OPTIMIZE for the bucketed band index, whole-pointer compact
        # for the append-only verdict relation (each refresh appends a
        # pointer — unbounded reads-per-file otherwise). No-op unless
        # some live set reaches the threshold; txn watermarks ride
        # through compaction commits. Overlapped — disjoint tables.
        run_concurrently(
            lambda: self.index.auto_compact(spark),
            lambda: self.verdicts.auto_compact(spark),
        )
        return {"mode": mode, "from": applied, "to": base_v,
                "signed_docs": signed, "n_candidates": n_cands}

    def read_verdicts(self, spark: SparkSession) -> DataFrame:
        return self.verdicts.read(spark)


def incremental_neardup_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-checkable incrementally-maintained near-dup index: the
    documents table arrives as THREE commits (70% history, then two
    append batches), and the index refreshes after each — every refresh
    signs only its own batch (asserted in-line from the report), probes
    the stored band relation, and appends emission-time verdicts.
    Under insert-only feeds the accumulated verdicts equal the full-
    corpus MinHash-LSH recompute EXACTLY (each pair is found once, when
    its later doc arrives), so the oracle is the batch operator's own
    SQL — the strongest possible check that incremental maintenance
    changes cost, not answers."""
    import os

    from de_final_project_spark.operators.txlog import VersionedTable
    from de_final_project_spark.session import scratch_dir

    docs = read_testdata(spark, sf_dir, "documents")
    root = scratch_dir("ndidx")
    bronze = VersionedTable(os.path.join(root, "documents"))
    history = docs.where(F.col("doc_id") % 10 < 7)
    batch_a = docs.where(F.col("doc_id") % 10 == 7)
    batch_b = docs.where(F.col("doc_id") % 10 >= 8)
    # one scan for all three cohort counts (was 3 jobs — §1.2, fixed
    # job overhead dominates sub-second scans at any local scale)
    n_hist, n_a, n_b = docs.agg(
        F.sum((F.col("doc_id") % 10 < 7).cast("long")),
        F.sum((F.col("doc_id") % 10 == 7).cast("long")),
        F.sum((F.col("doc_id") % 10 >= 8).cast("long")),
    ).first()
    bronze.overwrite(history)
    idx = IncrementalNearDupIndex(bronze, root)
    r1 = idx.refresh(spark)
    assert (r1["mode"], r1["signed_docs"]) == ("build", n_hist), r1
    bronze.append(batch_a)
    r2 = idx.refresh(spark)
    # churn proportionality: the second refresh signs ONLY its batch
    assert (r2["mode"], r2["signed_docs"]) == ("delta", n_a), r2
    bronze.append(batch_b)
    r3 = idx.refresh(spark)
    assert (r3["mode"], r3["signed_docs"]) == ("delta", n_b), r3
    assert idx.refresh(spark)["mode"] == "noop"
    return idx.read_verdicts(spark)


def neardup_keep_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-revival keep state over the incremental near-dup index:
    the curation decision a steady-state dedup pipeline actually
    serves. Emission-time pair verdicts are immutable history (the
    class docstring's CDC stance), so the KEEP state is a view joining
    them against corpus liveness — ``kept(d) = no surviving pair
    (a, d) whose smaller side a is still ALIVE``. Deleting a kept
    dominator therefore REVIVES its duplicates for free: no verdict
    rewrite, no re-probe — the anti-join sees the dominator leave the
    alive set. Lifecycle driven here: two insert refreshes build the
    index, a COW delete removes every ``doc_id % 5 == 0``, one more
    refresh retires the victims' band rows (tombstone merge, signs
    zero docs — asserted), and the returned frame is the per-survivor
    keep flag. The oracle recomputes MinHash-LSH + exact-Jaccard from
    scratch over the SURVIVING corpus — equality holds because every
    alive-alive pair was emitted exactly once while both sides were
    live (insert-only history before the delete), and band signatures
    are corpus-independent."""
    import os

    from de_final_project_spark.operators.txlog import VersionedTable
    from de_final_project_spark.session import scratch_dir

    docs = read_testdata(spark, sf_dir, "documents")
    root = scratch_dir("ndkeep")
    bronze = VersionedTable(os.path.join(root, "documents"))
    bronze.overwrite(docs.where(F.col("doc_id") % 10 < 7))
    idx = IncrementalNearDupIndex(bronze, root)
    idx.refresh(spark)
    bronze.append(docs.where(F.col("doc_id") % 10 >= 7))
    idx.refresh(spark)
    bronze.delete_where(spark, "doc_id % 5 = 0")
    r = idx.refresh(spark)
    assert (r["mode"], r["signed_docs"]) == ("delta", 0), r
    alive = bronze.read(spark).select("doc_id")
    suppressed = (
        idx.read_verdicts(spark)
        .join(
            alive.select(F.col("doc_id").alias("a_id")), "a_id", "left_semi"
        )
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
        .withColumn("_s", F.lit(True))
    )
    return alive.join(suppressed, "doc_id", "left").select(
        "doc_id", F.col("_s").isNull().alias("kept")
    )


NEARDUP_KEEP_STATE_SQL = f"""
WITH alive_docs AS (
  SELECT * FROM documents WHERE doc_id % 5 != 0
), {_SHINGLES_CTE.replace("FROM documents", "FROM alive_docs").strip()}, {_BANDS_CTE.strip()},
cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT DISTINCT b_id
  FROM cands
  JOIN shingled sa ON sa.doc_id = a_id
  JOIN shingled sb ON sb.doc_id = b_id
  WHERE round(len(list_intersect(sa.shingles, sb.shingles))
              / (len(sa.shingles) + len(sb.shingles)
                 - len(list_intersect(sa.shingles, sb.shingles))), 6)
        >= {JACCARD_THRESHOLD}
)
SELECT d.doc_id, v.b_id IS NULL AS kept
FROM alive_docs d LEFT JOIN verified v ON d.doc_id = v.b_id
"""
