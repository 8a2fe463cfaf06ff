"""Training-corpus preparation operators: context-window chunking,
train/test contamination detection, token-budget sequence packing, and
cross-source duplicate detection.

These extend the engine beyond the reference's surface (the reference
stops at star-schema transforms — src/process_lambda.py) with the
document-pipeline stages an LLM training corpus needs between "deduped
documents" and "token stream": chunk to the context length, verify the
eval split is not contaminated by train-set text, pack documents into
fixed-token bins, and find content syndicated across sources.

Every operator is a pure column-expression DataFrame plan (no UDFs) with
a DuckDB oracle restating the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_final_project_spark.operators.neardup import (
    _SHINGLES_CTE,
    _norm_tokens,
    shingle_set,
)
from de_final_project_spark.operators.sampling import (
    TEST_LOWER,
    TRAIN_UPPER,
    hash_bucket,
)
from de_final_project_spark.sources.readers import read_testdata

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks
PACK_BUDGET = 512  # tokens per packed training sequence


# ----------------------------------------------------------------------
# Context-window chunking
# ----------------------------------------------------------------------

def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token windows per document: chunk i covers tokens
    [i*stride, i*stride + chunk); the last start is the smallest stride
    multiple whose window reaches the end, so there are no degenerate
    tail chunks and every token is covered.

    Shape: tokenize once, generate the start indices with ``F.sequence``
    (an array of ints — no join, no shuffle), ``slice`` the token array
    per start, explode. Entirely narrow: chunking any corpus is a single
    map stage, and output partitioning follows the input — at 100 TB the
    only knob is input split size. All expressions stay in codegen."""
    docs = read_testdata(spark, sf_dir, "documents")
    toks = _norm_tokens(F.col("text"))
    with_toks = docs.select("doc_id", toks.alias("_toks"), F.size(toks).alias("_n"))
    last = F.ceil(
        F.greatest(F.col("_n") - CHUNK_TOKENS, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
    ).cast("int")
    ex = with_toks.select(
        "doc_id",
        "_toks",
        F.explode(F.sequence(F.lit(0), last)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id").cast("long") * CHUNK_STRIDE).alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


DOC_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
           AS toks
  FROM documents
), starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(
           0,
           CAST(ceil(greatest(len(toks) - {CHUNK_TOKENS}, 0)
                     / {float(CHUNK_STRIDE)}) AS INT))) AS chunk_id
  FROM t
)
SELECT doc_id,
       chunk_id::BIGINT AS chunk_id,
       (chunk_id * {CHUNK_STRIDE})::BIGINT AS chunk_start,
       len(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}])::BIGINT
         AS n_chunk_tokens,
       array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                            chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
         AS chunk_text
FROM starts
"""


# ----------------------------------------------------------------------
# Train/test contamination
# ----------------------------------------------------------------------

def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination report: test-split documents sharing at
    least one word 3-shingle with any train-split document, with how many
    shingles and how many train docs overlap.

    Shape: one shingle inverted index (explode), split assignment is the
    same pure hash expression as dataset_splits (no join against a split
    table), then an equi-join train-side × test-side on the shingle —
    the posting-list join, O(sum of per-shingle train×test postings),
    never all-pairs. At 100 TB the standard guard applies: drop
    stop-shingles above a document-frequency cap before the join (they
    dominate cost and signal nothing); the cap is omitted here because
    the oracle must stay threshold-exact."""
    docs = read_testdata(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    shingled = docs.select(
        "doc_id",
        b.alias("_bucket"),
        F.explode(shingle_set(F.col("text"))).alias("shingle"),
    )
    train = shingled.where(F.col("_bucket") < TRAIN_UPPER).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    test = shingled.where(F.col("_bucket") >= TEST_LOWER).select(
        "doc_id", "shingle"
    )
    return (
        test.join(train, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("train_doc_id").alias("n_train_docs"),
        )
    )


CONTAMINATION_CHECK_SQL = f"""
WITH {_SHINGLES_CTE.strip()},
b AS (
  SELECT doc_id, shingles,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
              AS INT) AS bucket
  FROM shingled
),
posting AS (SELECT doc_id, bucket, unnest(shingles) AS shingle FROM b)
SELECT t.doc_id,
       count(DISTINCT t.shingle)::BIGINT AS n_shared_shingles,
       count(DISTINCT tr.doc_id)::BIGINT AS n_train_docs
FROM (SELECT * FROM posting WHERE bucket >= {TEST_LOWER}) t
JOIN (SELECT * FROM posting WHERE bucket < {TRAIN_UPPER}) tr USING (shingle)
GROUP BY t.doc_id
"""


# ----------------------------------------------------------------------
# Token-budget sequence packing
# ----------------------------------------------------------------------

def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a fixed-token-budget training bin:
    bin = floor(cumulative tokens before this doc / budget), documents in
    doc_id order — the concat-then-split packing of a pretraining token
    stream (documents straddle bin boundaries; no padding waste).

    Shape: one token-count projection, then a DISTRIBUTED running sum —
    the add_sequence_key_distributed pattern (operators/surrogate.py):
    range-partition by doc_id (partition p holds a contiguous doc_id
    range), per-partition token cumsum, then add each partition's
    cumulative token total as a broadcast offset. Every stage is
    distributed; the only global structure is the O(partitions) offset
    table, so the op survives a corpus that would kill the naive
    unpartitioned ``Window.orderBy`` form in a single-partition sort.
    Output is identical to that form: cumulative-before totals don't
    depend on where the range boundaries fall."""
    docs = read_testdata(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", F.size(_norm_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = counted.repartitionByRange(n, F.col("doc_id").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Persist: the offset branch re-reads this relation, and range
    # boundaries come from sampling — a recompute could repartition
    # differently and corrupt the offsets (same pin as surrogate.py).
    w_local = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = ranged.withColumn(
        "_local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    ).persist()
    w_cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_ptoks"))
        .withColumn("_off", F.coalesce(F.sum("_ptoks").over(w_cum), F.lit(0)))
        .select("_pid", "_off")
    )
    cum_before = F.col("_off") + F.col("_local_before")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(cum_before / PACK_BUDGET).cast("long").alias("bin_id"),
            (cum_before % PACK_BUDGET).cast("long").alias("bin_offset"),
        )
    )


SEQUENCE_PACKING_SQL = f"""
WITH c AS (
  SELECT doc_id,
         len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' '))::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       (coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        // {PACK_BUDGET})::BIGINT AS bin_id,
       (coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        % {PACK_BUDGET})::BIGINT AS bin_offset
FROM c
"""


# ----------------------------------------------------------------------
# Cross-source duplicate content
# ----------------------------------------------------------------------

def cross_source_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content syndicated across sources: exact text hashes that appear
    under more than one ``source``, with doc/source counts and the
    canonical (minimum) doc id. One hash aggregate — the map-side
    partials shrink the shuffle to one row per distinct hash."""
    docs = read_testdata(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_sources") > 1)
    )


CROSS_SOURCE_DUPES_SQL = """
SELECT md5(text) AS content_hash,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT source)::BIGINT AS n_sources,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY 1
HAVING count(DISTINCT source) > 1
"""

# ----------------------------------------------------------------------
# Near-dup source overlap (syndication report)
# ----------------------------------------------------------------------

def source_overlap_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources syndicate each other's content: MinHash near-dup
    pairs joined back to each document's source, counted per unordered
    source pair (self-pairs included — within-source duplication is the
    common case and worth seeing).

    Shape: reuses the banded-LSH pair pipeline (never all-pairs), then
    two broadcast-sized joins to the (doc_id, source) projection and one
    small aggregate — the report is |sources|² rows at most."""
    from de_final_project_spark.operators.neardup import neardup_pairs_minhash

    pairs = neardup_pairs_minhash(spark, sf_dir)
    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "source")
    sa = docs.select(F.col("doc_id").alias("a_id"), F.col("source").alias("_sa"))
    sb = docs.select(F.col("doc_id").alias("b_id"), F.col("source").alias("_sb"))
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_neardup_pairs"))
    )


def _source_overlap_sql() -> str:
    from de_final_project_spark.operators.neardup import NEARDUP_PAIRS_MINHASH_SQL

    return f"""
WITH pairs AS ({NEARDUP_PAIRS_MINHASH_SQL})
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*)::BIGINT AS n_neardup_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.a_id
JOIN documents db ON db.doc_id = p.b_id
GROUP BY 1, 2
"""


SOURCE_OVERLAP_NEARDUP_SQL = _source_overlap_sql()

# ----------------------------------------------------------------------
# End-to-end corpus curation (the capstone composition)
# ----------------------------------------------------------------------

def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE declarative plan: quality gate
    (repetition + quality signals) ∧ near-dup canonical selection
    (MinHash-LSH → connected components), with the train/val/test split
    carried through and every drop explained (gate reasons plus
    'near_duplicate' for non-canonical cluster members).

    Composing the stages as DataFrames means Catalyst sees the union of
    all their plans at once — the documents scan is shared, the three
    doc-id-keyed joins co-partition, and nothing materializes between
    stages. This is the query a corpus owner actually runs; the pieces
    exist separately for inspection."""
    from de_final_project_spark.operators.neardup import neardup_clusters
    from de_final_project_spark.operators.sampling import dataset_splits
    from de_final_project_spark.operators.textquality import quality_gate

    gate = quality_gate(spark, sf_dir).select("doc_id", "drop_reasons", "keep")
    clusters = neardup_clusters(spark, sf_dir)
    splits = dataset_splits(spark, sf_dir).select("doc_id", "split")
    return (
        gate.join(clusters, "doc_id")
        .join(splits, "doc_id")
        .select(
            "doc_id",
            "split",
            "cluster_id",
            F.col("keep").alias("quality_keep"),
            "is_canonical",
            (F.col("keep") & F.col("is_canonical")).alias("keep_final"),
            F.concat_ws(
                ",",
                F.nullif(F.col("drop_reasons"), F.lit("")),
                F.when(~F.col("is_canonical"), F.lit("near_duplicate")),
            ).alias("drop_reasons"),
        )
    )


def _corpus_curation_sql() -> str:
    from de_final_project_spark.operators.neardup import NEARDUP_CLUSTERS_SQL
    from de_final_project_spark.operators.sampling import DATASET_SPLITS_SQL
    from de_final_project_spark.operators.textquality import QUALITY_GATE_SQL

    return f"""
WITH gate AS ({QUALITY_GATE_SQL}),
clusters AS ({NEARDUP_CLUSTERS_SQL}),
splits AS ({DATASET_SPLITS_SQL})
SELECT g.doc_id, s.split, c.cluster_id, g.keep AS quality_keep,
       c.is_canonical,
       (g.keep AND c.is_canonical) AS keep_final,
       concat_ws(',', nullif(g.drop_reasons, ''),
                 CASE WHEN NOT c.is_canonical THEN 'near_duplicate' END)
         AS drop_reasons
FROM gate g JOIN clusters c USING (doc_id) JOIN splits s USING (doc_id)
"""


CORPUS_CURATION_SQL = _corpus_curation_sql()


# ----------------------------------------------------------------------
# Chunk-level dedup and packing efficiency (round-4 compositions)
# ----------------------------------------------------------------------

def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular exact dedup across the corpus: identical token
    windows (by md5 of chunk_text) keep one canonical copy — the level
    real pretraining dedup operates at after document-level passes,
    catching boilerplate shared across otherwise-distinct documents.
    Returns one row per KEPT chunk with how many copies it represents.

    Canonical = (min doc_id, then min chunk_id) within the hash group —
    one hash shuffle on the digest, the same shape as document-level
    exact dedup but over the chunk explosion.
    """
    from pyspark.sql import Window

    chunks = doc_chunks(spark, sf_dir)
    h = F.md5(F.col("chunk_text"))
    w = Window.partitionBy("_h").orderBy(
        F.col("doc_id").asc(), F.col("chunk_id").asc()
    )
    return (
        chunks.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "n_copies", F.count(F.lit(1)).over(Window.partitionBy("_h")).cast("long")
        )
        .where(F.col("_rk") == 1)
        .select(
            "doc_id",
            "chunk_id",
            F.col("_h").alias("chunk_hash"),
            "n_chunk_tokens",
            "n_copies",
        )
    )


CHUNK_DEDUP_SQL = f"""
WITH chunks AS ({DOC_CHUNKS_SQL}),
hashed AS (
  SELECT doc_id, chunk_id, n_chunk_tokens, md5(chunk_text) AS chunk_hash
  FROM chunks
)
SELECT doc_id, chunk_id, chunk_hash, n_chunk_tokens, n_copies
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY chunk_hash
                            ORDER BY doc_id ASC, chunk_id ASC) AS _rk,
         count(*) OVER (PARTITION BY chunk_hash)::BIGINT AS n_copies
  FROM hashed
)
WHERE _rk = 1
"""


def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill report over the token-stream packing: per bin, the documents
    that START in it, their token mass, and the fill fraction relative
    to the bin budget — the diagnostic that decides whether a packing
    policy wastes padding before a training run burns compute on it.
    Fill can exceed 1 because documents straddle bin boundaries (their
    tokens spill into the next bin); the tail bin underfills.

    Pure composition: one aggregate over sequence_packing's assignment,
    keyed on bin_id.
    """
    packed = sequence_packing(spark, sf_dir)
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_started"),
            F.min("bin_offset").alias("first_offset"),
        )
        .select(
            "bin_id",
            "n_docs",
            "tokens_started",
            "first_offset",
            F.round(
                F.col("tokens_started").cast("double") / F.lit(float(PACK_BUDGET)), 6
            ).alias("fill_fraction"),
        )
    )


PACKING_EFFICIENCY_SQL = f"""
WITH packed AS ({SEQUENCE_PACKING_SQL})
SELECT bin_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS tokens_started,
       min(bin_offset)::BIGINT AS first_offset,
       round(sum(n_tokens)::DOUBLE / {PACK_BUDGET}, 6) AS fill_fraction
FROM packed
GROUP BY bin_id
"""


# ----------------------------------------------------------------------
# Duplicated-substring span diagnostics (ExactSubstr-style, round 5)
# ----------------------------------------------------------------------

SPAN_N = 16  # sliding-window n-gram length, in word tokens


def dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring diagnostics at sliding n-gram
    granularity — the statistic behind suffix-array ExactSubstr dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"), approximated at fixed n: a SPAN_N-token window whose text
    occurs anywhere else in the corpus (another document OR elsewhere in
    the same document) is a duplicated span start. Reports, per doc, the
    window count, how many are duplicated, the duplicated fraction, and
    the longest run of consecutive duplicated starts (long runs = long
    verbatim copies, the spans ExactSubstr would actually cut).

    Shape: explode every sliding window start (positions 0..n-SPAN_N),
    hash the window text, one global hash-aggregate for occurrence
    counts, equi-join the counts back, then per-doc aggregates. The run
    length uses gaps-and-islands (pos - row_number) under a window
    PARTITIONED BY doc_id — never a global sort. At 100 TB the explosion
    is ~n_tokens rows; the count/join pair is the exact-dedup shuffle
    shape on uniform md5 keys, and everything else is doc-partitioned.
    Documents shorter than SPAN_N tokens report zero windows.
    """
    docs = read_testdata(spark, sf_dir, "documents")
    toks = _norm_tokens(F.col("text"))
    t = docs.select("doc_id", toks.alias("_toks"), F.size(toks).alias("_n"))
    grams = (
        t.where(F.col("_n") >= SPAN_N)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_n") - SPAN_N)).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("_toks"), F.col("pos") + 1, SPAN_N))
            ).alias("_h"),
        )
    )
    counts = grams.groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
    # flagged feeds BOTH the per-doc totals and the run extraction; the
    # boundary stops Catalyst re-running the explode + count-join twice
    # (the expensive half of this plan at corpus scale).
    flagged = (
        grams.join(counts, "_h")
        .select("doc_id", "pos", (F.col("_c") > 1).alias("is_dup"))
        .persist()
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_windows"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        flagged.where(F.col("is_dup"))
        .withColumn("_isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "_isl")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy("doc_id")
        .agg(F.max("_run").alias("longest_dup_run"))
    )
    return (
        t.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(runs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.when(
                F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
                F.col("n_dup_windows").cast("double") / F.col("n_windows"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_window_frac"),
            F.coalesce(F.col("longest_dup_run"), F.lit(0))
            .cast("long")
            .alias("longest_dup_run"),
        )
    )


DUP_SPAN_REPORT_SQL = f"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
           AS toks
  FROM documents
), grams AS (
  SELECT doc_id, pos,
         md5(array_to_string(toks[pos + 1 : pos + {SPAN_N}], ' ')) AS h
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(0, len(toks) - {SPAN_N})) AS pos
    FROM t WHERE len(toks) >= {SPAN_N}
  )
), counts AS (
  SELECT h, count(*) AS c FROM grams GROUP BY h
), flagged AS (
  SELECT g.doc_id, g.pos, (c.c > 1) AS is_dup
  FROM grams g JOIN counts c USING (h)
), per_doc AS (
  SELECT doc_id, count(*) AS n_windows,
         sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_windows
  FROM flagged GROUP BY doc_id
), runs AS (
  SELECT doc_id, max(run) AS longest_dup_run FROM (
    SELECT doc_id, count(*) AS run FROM (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM flagged WHERE is_dup
    ) GROUP BY doc_id, isl
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(p.n_windows, 0)::BIGINT AS n_windows,
       coalesce(p.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       CASE WHEN coalesce(p.n_windows, 0) > 0
            THEN p.n_dup_windows::DOUBLE / p.n_windows ELSE 0.0 END
         AS dup_window_frac,
       coalesce(r.longest_dup_run, 0)::BIGINT AS longest_dup_run
FROM t
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN runs r USING (doc_id)
"""


# ----------------------------------------------------------------------
# Training-shard export manifest
# ----------------------------------------------------------------------

SHARD_BINS = 32  # packed sequences per output shard


def packed_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export plan for the packed token stream: group the packing bins
    into fixed-size output shards (WebDataset-style) and emit the
    per-shard manifest a resumable writer verifies against — bin and
    doc counts, token totals, id range, fill ratio against the shard's
    token capacity, and an ORDER-INDEPENDENT content fingerprint (sum
    of each member doc's md5-prefix integer) so any engine can confirm
    a shard's membership without reading the data. One extra hash
    aggregate on top of sequence_packing's distributed cumsum; the
    manifest is O(corpus / shard-capacity) rows — the control-plane
    artifact, not the data.

    Fill is exact-int division as double (no rounding hazard); a doc
    straddling a shard boundary belongs to the shard of its STARTING
    bin, the same rule packing uses for bins — so fill can exceed 1.0
    slightly on straddles, which is the honest number (capacity
    accounting, not padding)."""
    packed = sequence_packing(spark, sf_dir)
    doc_fp = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    return (
        packed.select(
            F.expr(f"bin_id div {SHARD_BINS}").alias("shard_id"),
            "bin_id",
            "doc_id",
            "n_tokens",
            doc_fp.alias("_fp"),
        )
        .groupBy("shard_id")
        .agg(
            F.countDistinct("bin_id").alias("n_bins"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            (
                F.sum("n_tokens").cast("double")
                / float(SHARD_BINS * PACK_BUDGET)
            ).alias("fill"),
            F.sum("_fp").alias("content_hash"),
        )
    )


PACKED_SHARD_MANIFEST_SQL = f"""
WITH packed AS ({SEQUENCE_PACKING_SQL})
SELECT bin_id // {SHARD_BINS} AS shard_id,
       count(DISTINCT bin_id)::BIGINT AS n_bins,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       sum(n_tokens)::DOUBLE / {SHARD_BINS * PACK_BUDGET} AS fill,
       sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)::BIGINT
         AS content_hash
FROM packed
GROUP BY 1
"""
