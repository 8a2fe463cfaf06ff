"""Byte-pair-encoding vocabulary induction — distributed merge training.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units"): start
from characters, repeatedly count adjacent symbol pairs across the
corpus (weighted by word frequency) and merge the most frequent pair
into a new symbol. The learned merge table IS the tokenizer.

Scale shape: the expensive stage per iteration is the pair count — an
explode + hash aggregate over the (word, freq) vocabulary, fully
distributed and map-side combined; at 100 TB the vocabulary aggregate
is the classic word-count shuffle and everything downstream operates on
the aggregated vocab, not the raw corpus. The argmax per iteration is a
1-row control-plane scalar (same class as the watermark probes); the
merge rewrite is a narrow per-row string replacement.

Determinism contract (what the oracle pins): symbol sequences live as
single-space-joined strings with sentinel spaces, and a merge applies
via left-to-right non-overlapping ``replace`` of ``' a b '`` with
``' ab '``. In runs where occurrences share a boundary space (e.g.
``a b a b``), this differs from token-greedy BPE — but it is exactly
identical in Spark and DuckDB, which is the property the correctness
gate needs; real BPE implementations disagree on the same corner.
Ties on pair count break lexicographically (left, then right symbol).

Reference analog: none — the reference stops at star-schema transforms
(src/process_lambda.py); this extends the engine's training-data
surface alongside operators/trainprep.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.operators.neardup import _norm_tokens
from de_final_project_spark.sources.readers import read_testdata

BPE_MERGES = 6


def _char_seq(word):
    """' a b c ' — each character its own symbol, space sentinels."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocab, weighted by word
    frequency: one explode + one hash aggregate."""
    toks = F.split(F.trim(F.col("seq")), " ")
    ex = vocab.select(
        "freq",
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(1), F.size(toks) - 1)).alias("_i"),
    ).where(F.size(F.col("_toks")) >= 2)
    return (
        ex.select(
            "freq",
            F.element_at("_toks", F.col("_i")).alias("left_sym"),
            F.element_at("_toks", F.col("_i") + 1).alias("right_sym"),
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_MERGES merges over the documents corpus.
    Returns the merge table: (step, left_sym, right_sym, merged_sym,
    pair_count) — rows in merge order, counts at selection time."""
    docs = read_testdata(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(_norm_tokens(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", _char_seq(F.col("word")).alias("seq"))
        .cache()
    )
    merges = []
    cur = vocab
    # Every iteration's cache fills lazily as a side effect of the NEXT
    # pair-count collect, so no extra materialization job runs per step;
    # all generations stay pinned until the loop ends (the vocab frame
    # is aggregate-sized) and release together.
    generations = [vocab]
    for step in range(1, BPE_MERGES + 1):
        top = (
            _pair_counts(cur)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            # Degenerate corpus: no adjacent pairs remain before
            # BPE_MERGES steps. Stop with the merges learned so far —
            # the SQL twin does the same (its b{i} CTE is empty, which
            # empties every later iteration and the UNION ALL simply
            # emits fewer rows), so both engines agree (ADVICE r5).
            break
        best = top[0]
        merges.append(
            (
                step,
                best.left_sym,
                best.right_sym,
                best.left_sym + best.right_sym,
                best.pair_count,
            )
        )
        cur = cur.select(
            "word",
            "freq",
            F.replace(
                F.col("seq"),
                F.lit(f" {best.left_sym} {best.right_sym} "),
                F.lit(f" {best.left_sym}{best.right_sym} "),
            ).alias("seq"),
        ).cache()
        generations.append(cur)
    for g in generations:
        g.unpersist()
    return spark.createDataFrame(
        merges,
        "step long, left_sym string, right_sym string, merged_sym string, "
        "pair_count long",
    )


def _bpe_sql() -> str:
    base = """WITH words AS (
  SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
    AS word
  FROM documents
), vocab AS (
  SELECT word, count(*)::BIGINT AS freq FROM words WHERE word <> '' GROUP BY 1
), it0 AS (
  SELECT word, freq,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
  FROM vocab
)"""
    parts = [base]
    for i in range(1, BPE_MERGES + 1):
        parts.append(f""",
p{i} AS (
  SELECT left_sym, right_sym, sum(freq)::BIGINT AS pair_count FROM (
    SELECT freq, toks[i] AS left_sym, toks[i + 1] AS right_sym
    FROM (
      SELECT freq, toks,
             unnest(generate_series(1, len(toks) - 1)) AS i
      FROM (SELECT freq, string_split(trim(seq), ' ') AS toks FROM it{i - 1})
      WHERE len(toks) >= 2
    )
  ) GROUP BY 1, 2
), b{i} AS (
  SELECT left_sym, right_sym, pair_count FROM p{i}
  ORDER BY pair_count DESC, left_sym ASC, right_sym ASC LIMIT 1
), it{i} AS (
  SELECT v.word, v.freq,
         replace(v.seq, ' ' || b.left_sym || ' ' || b.right_sym || ' ',
                 ' ' || b.left_sym || b.right_sym || ' ') AS seq
  FROM it{i - 1} v, b{i} b
)""")
    selects = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step, left_sym, right_sym, "
        f"left_sym || right_sym AS merged_sym, pair_count FROM b{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    parts.append("\n" + selects)
    return "".join(parts)


BPE_MERGES_SQL = _bpe_sql()


def bpe_tokenized_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table to the corpus and report, per
    document, the whitespace token count, the BPE symbol count, and the
    chars-per-symbol compression — the fertility statistic that decides
    whether a tokenizer is good enough to train with.

    Composition: the merge loop leaves the vocabulary carrying its final
    symbol sequences, so tokenizing the corpus is a broadcast join of
    words against the |vocab|-sized symbol-count table plus one per-doc
    aggregate — the raw text is never re-scanned per merge. The oracle
    replays the same six merge CTEs and the same join.
    """
    docs = read_testdata(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(_norm_tokens(F.col("text"))).alias("word"),
    ).where(F.col("word") != "")
    merges = bpe_merges(spark, sf_dir).orderBy("step").collect()
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", _char_seq(F.col("word")).alias("seq"))
    )
    for m in merges:
        vocab = vocab.select(
            "word",
            F.replace(
                F.col("seq"),
                F.lit(f" {m.left_sym} {m.right_sym} "),
                F.lit(f" {m.left_sym}{m.right_sym} "),
            ).alias("seq"),
        )
    sym_counts = vocab.select(
        "word",
        F.size(F.split(F.trim(F.col("seq")), " ")).cast("long").alias("n_syms"),
        F.length("word").cast("long").alias("n_chars"),
    )
    return (
        words.join(F.broadcast(sym_counts), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ws_tokens"),
            F.sum("n_syms").alias("n_bpe_symbols"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_ws_tokens",
            "n_bpe_symbols",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_bpe_symbols"), 6
            ).alias("chars_per_symbol"),
        )
    )


def _bpe_tokenized_sql() -> str:
    base = _bpe_sql().rsplit("\nSELECT 1::BIGINT", 1)[0]
    # base ends with the it{K} CTE; reuse it for the tokenization join.
    return f"""{base},
doc_words AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
           AS word
  FROM documents
), dw AS (
  SELECT doc_id, word FROM doc_words WHERE word <> ''
), syms AS (
  SELECT word,
         len(string_split(trim(seq), ' '))::BIGINT AS n_syms,
         length(word)::BIGINT AS n_chars
  FROM it{BPE_MERGES}
)
SELECT d.doc_id,
       count(*)::BIGINT AS n_ws_tokens,
       sum(s.n_syms)::BIGINT AS n_bpe_symbols,
       sum(s.n_chars)::BIGINT AS n_chars,
       round(sum(s.n_chars)::DOUBLE / sum(s.n_syms), 6) AS chars_per_symbol
FROM dw d JOIN syms s USING (word)
GROUP BY d.doc_id
"""


BPE_TOKENIZED_LENGTHS_SQL = _bpe_tokenized_sql()
