"""Text quality scoring, language-ID heuristic, and fingerprints over the
documents table — the remaining text-analysis surface of a training-data
pipeline. Pure built-in expressions; every query oracle-checked.

Ratios are exact-integer divisions evaluated in the same order on both
engines and rounded to 6 places, so results are comparable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.functions.text import tokens
from de_final_project_spark.sources.readers import read_testdata

# Small fixed stopword lists per language for the hit-count heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "con"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "avec", "pour"],
}

_ROLL_MULT = 1000003
_ROLL_MOD = 2**32


def _hits(toks: Column, words: list[str]) -> Column:
    # Literal MAP, not array_contains: element_at on a map is a hash
    # probe, so the filter is O(tokens) instead of O(tokens x stopwords)
    # — measured 2x on the doc_quality scorer at sf0.1 (the array form
    # was slow enough that the Arrow pandas twin beat the JVM).
    # dict.fromkeys dedupes first: under Spark's default
    # mapKeyDedupPolicy=EXCEPTION a duplicate ever added to a stopword
    # list would otherwise turn into a runtime analysis error (ADVICE r5).
    sw = F.create_map(
        *[x for w in dict.fromkeys(words) for x in (F.lit(w), F.lit(1))]
    )
    return F.size(
        F.filter(toks, lambda t: F.element_at(sw, F.lower(t)).isNotNull())
    ).cast("long")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language scoring: hit counts per language plus an
    argmax prediction (ties resolved in fixed en<de<es<fr order, fallback
    'und' when nothing hits)."""
    docs = read_testdata(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    hit_cols = {lang: _hits(toks, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*[hit_cols[lang] for lang in LANG_STOPWORDS])
    predicted = F.when(best == 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # first max wins -> fixed priority order
        predicted = predicted.when(hit_cols[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        "lang",
        *[hit_cols[lang].alias(f"{lang}_hits") for lang in LANG_STOPWORDS],
        predicted.alias("predicted_lang"),
    )


_HITS_SQL = {
    lang: (
        "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{w}'" for w in words)
        + "], lower(t))))"
    )
    for lang, words in LANG_STOPWORDS.items()
}

LANG_ID_SQL = f"""
SELECT doc_id, lang,
       {', '.join(f"{lang}_hits" for lang in LANG_STOPWORDS)},
       CASE WHEN greatest({', '.join(f'{l}_hits' for l in LANG_STOPWORDS)}) = 0 THEN 'und'
            {' '.join(f"WHEN {l}_hits = greatest({', '.join(f'{m}_hits' for m in LANG_STOPWORDS)}) THEN '{l}'" for l in LANG_STOPWORDS)}
       END AS predicted_lang
FROM (
  SELECT doc_id, lang,
         {', '.join(f"{expr} AS {lang}_hits" for lang, expr in _HITS_SQL.items())}
  FROM (
    SELECT doc_id, lang,
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\\s+') END AS toks
    FROM documents
  )
)
"""


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: stopword ratio, mean token length,
    punctuation/digit ratios, and a composite score — the standard cheap
    quality filter of a corpus pipeline. Narrow projection, no shuffle."""
    # Tokenize ONCE into a materialized column: five stat columns each
    # referencing tokens(text) directly would re-split the text five
    # times (Catalyst does not CSE higher-order-function subtrees across
    # project columns) — measured ~2x on the whole scorer at sf0.1.
    docs = read_testdata(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens(F.col("text")).alias("_toks")
    )
    toks = F.col("_toks")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    stop_hits = _hits(toks, LANG_STOPWORDS["en"])
    token_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    stop_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        stop_hits.cast("double") / n_tokens.cast("double")
    )
    mean_tok = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        token_chars.cast("double") / n_tokens.cast("double")
    )
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    digits = n_chars - F.length(F.regexp_replace("text", r"[0-9]", ""))
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / n_chars.cast("double")
    )
    digit_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        digits.cast("double") / n_chars.cast("double")
    )
    score = (
        stop_ratio * 0.5 + F.least(mean_tok, F.lit(10.0)) / 20.0
        + (F.lit(1.0) - punct_ratio)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


DOC_QUALITY_SQL = f"""
SELECT doc_id,
       n_tokens,
       round(stop_ratio, 6) AS stopword_ratio,
       round(mean_tok, 6)   AS mean_token_len,
       round(punct_ratio, 6) AS punct_ratio,
       round(digit_ratio, 6) AS digit_ratio,
       round(stop_ratio * 0.5 + least(mean_tok, 10.0) / 20.0 + (1.0 - punct_ratio),
             6) AS quality_score
FROM (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE {_HITS_SQL['en']}::DOUBLE / len(toks)::DOUBLE END AS stop_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, t -> length(t)))::DOUBLE
                   / len(toks)::DOUBLE END AS mean_tok,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
                   / length(text)::DOUBLE END AS punct_ratio,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                   / length(text)::DOUBLE END AS digit_ratio
  FROM (
    SELECT doc_id, text,
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\\s+') END AS toks
    FROM documents
  )
)
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic document fingerprints: md5 of normalized text and
    a polynomial rolling hash over token hashes (mod 2^32) — the cheap
    shift-resistant fingerprint used for fast bucket comparisons."""
    from de_final_project_spark.functions.text import fingerprint
    from de_final_project_spark.operators.neardup import _token_hash

    docs = read_testdata(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    rolling = F.aggregate(
        F.transform(toks, _token_hash),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * _ROLL_MULT + h) % F.lit(_ROLL_MOD).cast("long"),
    )
    return docs.select(
        "doc_id",
        fingerprint("text").alias("md5_fp"),
        rolling.alias("rolling_fp"),
    )


DOC_FINGERPRINTS_SQL = f"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_fp,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END,
             t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
         (acc, h) -> (acc * {_ROLL_MULT} + h) % {_ROLL_MOD}) AS rolling_fp
FROM documents
"""


TOP_TERMS_K = 50


def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequency, top-K by count (the canonical
    explode-then-aggregate wordcount). explode is a narrow op; the
    aggregate does map-side partial counting, so the shuffle carries one
    row per (partition, distinct term) — vocabulary-sized, not
    token-count-sized. The top-K is a TakeOrdered over the aggregate,
    never a global sort of the vocabulary."""
    docs = read_testdata(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(TOP_TERMS_K)
    )


TOP_TERMS_SQL = f"""
SELECT term, count(*) AS n
FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
)
WHERE term <> ''
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT {TOP_TERMS_K}
"""


TFIDF_TOP_N = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N terms per document by TF-IDF — the classic relevance
    weighting, DataFrame-native end to end: explode -> (doc,term) counts
    -> document-frequency aggregate joined back (vocabulary-sized, so it
    broadcasts) -> windowed top-N per doc. Two hash shuffles total
    (term counts, doc window); the corpus-sized explode never leaves the
    executors. Scores round to 6 places before ranking so ordering is
    identical across engines' libm (ln) implementations."""
    from pyspark.sql import Window

    docs = read_testdata(spark, sf_dir, "documents")
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(df_counts), "term")
        .select("doc_id", "term", "tf", "df", score.alias("tfidf"))
        .withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= TFIDF_TOP_N)
        .select("doc_id", "term_rank", "term", "tf", "df", "tfidf")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2
), dfc AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term_rank, term, tf, df, tfidf
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df), 6) DESC,
                    tf.term ASC) AS term_rank
  FROM tf JOIN dfc USING (term) CROSS JOIN n
)
WHERE term_rank <= {TFIDF_TOP_N}
"""


def repetition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (the Gopher-family repetition
    filters): duplicate-2-gram and duplicate-3-gram fractions and the
    most-frequent-token share. High values mark boilerplate/spam docs a
    training corpus should drop.

    Shape: the n-gram fractions are pure narrow expressions (sequence +
    slice + array_distinct — no shuffle; guarded so short docs yield
    empty gram arrays, since ``F.sequence`` DESCENDS when start > stop).
    The top-token share needs per-(doc, token) counts, which no
    per-row expression gives without an O(distinct×n) interpreted HOF
    scan — so it is the codegen explode → two hash aggregates path, then
    one join back on doc_id. Two shuffles total, both map-side partial."""
    docs = read_testdata(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", toks.alias("_toks"), F.size(toks).cast("long").alias("n_tokens")
    )

    def grams(k: int) -> Column:
        return F.when(
            F.col("n_tokens") < k, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), (F.col("n_tokens") - (k - 1)).cast("int")),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, k)),
            )
        )

    def dup_frac(g: Column) -> Column:
        total = F.size(g)
        return F.when(total <= 0, F.lit(0.0)).otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct(g)).cast("double") / total.cast("double")
        )

    narrow = base.select(
        "doc_id",
        "n_tokens",
        F.round(dup_frac(grams(2)), 6).alias("dup_2gram_frac"),
        F.round(dup_frac(grams(3)), 6).alias("dup_3gram_frac"),
    )
    top = (
        base.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(F.max("_c").alias("_top"))
    )
    return (
        narrow.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_2gram_frac",
            "dup_3gram_frac",
            F.round(
                F.when(F.col("n_tokens") <= 0, F.lit(0.0)).otherwise(
                    F.coalesce(F.col("_top"), F.lit(0)).cast("double")
                    / F.col("n_tokens").cast("double")
                ),
                6,
            ).alias("top_token_frac"),
        )
    )


REPETITION_REPORT_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens,
         list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                        i -> array_to_string(toks[i:i+1], ' ')) AS g2,
         list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                        i -> array_to_string(toks[i:i+2], ' ')) AS g3
  FROM t
), top AS (
  SELECT doc_id, max(c) AS top FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
    GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT g.doc_id, g.n_tokens,
       round(CASE WHEN len(g2) <= 0 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
             END, 6) AS dup_2gram_frac,
       round(CASE WHEN len(g3) <= 0 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
             END, 6) AS dup_3gram_frac,
       round(CASE WHEN g.n_tokens <= 0 THEN 0.0
                  ELSE CAST(coalesce(top.top, 0) AS DOUBLE) / g.n_tokens
             END, 6) AS top_token_frac
FROM g LEFT JOIN top USING (doc_id)
"""


# Gate thresholds, set against the corpus distributions so each rule
# flags a real tail (roughly the worst ~5%) rather than nothing.
GATE_MIN_TOKENS = 20
GATE_MAX_DUP3 = 0.01
GATE_MAX_TOP_TOKEN = 0.16


def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision of a corpus pipeline: composes the quality
    and repetition signals into a boolean plus a deterministic
    reasons CSV (fixed rule order; concat_ws drops the NULLs of rules
    that pass).

    Shape: one join on doc_id between the narrow quality projection and
    the repetition aggregate — the repetition branch already needs its
    explode/agg shuffle, so the gate adds no new wide stage beyond the
    join itself."""
    rep = repetition_report(spark, sf_dir).select(
        "doc_id", "n_tokens", "dup_3gram_frac", "top_token_frac"
    )
    q = doc_quality(spark, sf_dir).select("doc_id", "stopword_ratio")
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_tokens") < GATE_MIN_TOKENS, F.lit("too_short")),
        F.when(F.col("dup_3gram_frac") > GATE_MAX_DUP3, F.lit("high_repetition")),
        F.when(
            F.col("top_token_frac") > GATE_MAX_TOP_TOKEN, F.lit("dominant_token")
        ),
        F.when(F.col("stopword_ratio") == 0.0, F.lit("no_stopwords")),
    )
    return (
        rep.join(q, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            reasons.alias("drop_reasons"),
        )
        .withColumn("keep", F.col("drop_reasons") == "")
    )


def _quality_gate_sql() -> str:
    return f"""
WITH rep AS ({REPETITION_REPORT_SQL}),
q AS ({DOC_QUALITY_SQL})
SELECT rep.doc_id, rep.n_tokens,
       concat_ws(',',
         CASE WHEN rep.n_tokens < {GATE_MIN_TOKENS} THEN 'too_short' END,
         CASE WHEN rep.dup_3gram_frac > {GATE_MAX_DUP3} THEN 'high_repetition' END,
         CASE WHEN rep.top_token_frac > {GATE_MAX_TOP_TOKEN} THEN 'dominant_token' END,
         CASE WHEN q.stopword_ratio = 0.0 THEN 'no_stopwords' END
       ) AS drop_reasons,
       concat_ws(',',
         CASE WHEN rep.n_tokens < {GATE_MIN_TOKENS} THEN 'too_short' END,
         CASE WHEN rep.dup_3gram_frac > {GATE_MAX_DUP3} THEN 'high_repetition' END,
         CASE WHEN rep.top_token_frac > {GATE_MAX_TOP_TOKEN} THEN 'dominant_token' END,
         CASE WHEN q.stopword_ratio = 0.0 THEN 'no_stopwords' END
       ) = '' AS keep
FROM rep JOIN q USING (doc_id)
"""


QUALITY_GATE_SQL = _quality_gate_sql()


def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document — the perplexity-proxy
    filter of a corpus pipeline (improbable-token documents score high).

    Cross-engine float stability is the design constraint here: a plain
    avg(-ln p) sums doubles in partition order, which is not associative
    — so each token's -ln p is rounded to 6 places FIRST (deterministic
    per token), summed in exact DECIMAL (associative, any partitioning),
    and only the final mean rounds again. Shape: one vocabulary count
    aggregate (vocabulary-sized → broadcast), one explode-join-agg over
    the corpus; both aggregates map-side partial."""
    docs = read_testdata(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_c"))
    total = terms.count()
    neglogp = F.round(
        -F.log(F.col("_c").cast("double") / F.lit(float(total))), 6
    ).cast("decimal(18,6)")
    return (
        terms.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(neglogp).alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("_s").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("cross_entropy"),
        )
    )


UNIGRAM_LOGPROB_SCORES_SQL = """
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), t AS (
  SELECT doc_id, term FROM terms WHERE term <> ''
), vocab AS (
  SELECT term, count(*) AS c FROM t GROUP BY 1
), n AS (SELECT count(*) AS total FROM t)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       round(CAST(sum(CAST(round(-ln(vocab.c::DOUBLE / n.total), 6)
                           AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS cross_entropy
FROM t JOIN vocab USING (term) CROSS JOIN n
GROUP BY doc_id
"""


PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def top_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K adjacent-token bigrams by pointwise mutual information —
    the phrase-detection statistic (word2vec-style preprocessing).
    PMI = ln((c_ab/N_bigrams) / ((c_a/N_uni)(c_b/N_uni))), low-count
    bigrams excluded. All inputs to ln are ratios of exact integer
    counts, so the score is deterministic on any engine; scores round to
    6 places before ranking.

    Shape: bigrams come from one narrow transform+explode (no
    self-join); unigram counts broadcast twice into the bigram relation;
    the top-K is a global sort of the already-aggregated bigram table."""
    docs = read_testdata(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select(toks.alias("_toks"), F.size(toks).alias("_n"))
    bigrams = base.where(F.col("_n") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.col("_n") - 1).cast("int")),
                lambda i: F.struct(
                    F.element_at("_toks", i).alias("w1"),
                    F.element_at("_toks", i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2").where((F.col("w1") != "") & (F.col("w2") != ""))
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c")).collect()[0][0]
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    n_bg = bg.agg(F.sum("c_ab")).collect()[0][0]
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c_a"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") / F.lit(float(n_bg)))
            / (
                (F.col("c_a").cast("double") / F.lit(float(n_uni)))
                * (F.col("c_b").cast("double") / F.lit(float(n_uni)))
            )
        ),
        6,
    )
    return (
        bg.where(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            F.col("c_ab").alias("bigram_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOP_K)
    )


TOP_PMI_BIGRAMS_SQL = f"""
WITH t AS (
  SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS toks
  FROM documents
), uni AS (
  SELECT term, count(*) AS c
  FROM (SELECT unnest(toks) AS term FROM t) WHERE term <> '' GROUP BY 1
), bg AS (
  SELECT w1, w2, count(*) AS c_ab
  FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM (SELECT toks, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
          FROM t WHERE len(toks) >= 2)
  )
  WHERE w1 <> '' AND w2 <> ''
  GROUP BY 1, 2
), nu AS (SELECT sum(c)::DOUBLE AS n FROM uni),
nb AS (SELECT sum(c_ab)::DOUBLE AS n FROM bg)
SELECT w1, w2, c_ab::BIGINT AS bigram_count,
       round(ln((c_ab / nb.n) / ((a.c / nu.n) * (b.c / nu.n))), 6) AS pmi
FROM bg
JOIN uni a ON bg.w1 = a.term
JOIN uni b ON bg.w2 = b.term
CROSS JOIN nu CROSS JOIN nb
WHERE c_ab >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOP_K}
"""


def doc_quality_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas twin of ``doc_quality`` — NOT the production
    path. It exists to MEASURE the expression-vs-Python gap instead of
    asserting it: bench.py times both on identical input and
    tests pin value parity. Vectorized pandas string ops throughout
    (the best case for the Python path — row-at-a-time UDFs would only
    widen the gap); the JVM expression version stays the engine's
    default because it keeps the whole plan in codegen and off the
    Arrow transfer boundary.
    """
    import pandas as pd

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    stop = {w.lower() for w in LANG_STOPWORDS["en"]}

    schema = (
        "doc_id long, n_tokens long, stopword_ratio double, "
        "mean_token_len double, punct_ratio double, digit_ratio double, "
        "quality_score double"
    )

    from decimal import ROUND_HALF_UP, Decimal

    def _round6(series):
        # Spark ROUND(double, 6) is BigDecimal HALF_UP on the double's
        # SHORTEST decimal form (BigDecimal.valueOf -> Double.toString);
        # Python repr() produces the same shortest round-trip string.
        # pandas .round is half-even on the binary value — both wrong.
        q = Decimal("0.000001")
        return series.apply(
            lambda v: float(
                Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP)
            )
        )

    def score(batches):
        for pdf in batches:
            s = pdf["text"].fillna("")
            toks = s.str.strip().str.split()
            toks = toks.apply(lambda l: l if isinstance(l, list) else [])
            n_tokens = toks.str.len().astype("int64")
            token_chars = toks.apply(lambda l: sum(len(t) for t in l))
            stop_hits = toks.apply(
                lambda l: sum(1 for t in l if t.lower() in stop)
            )
            n_chars = s.str.len().astype("int64")
            punct = s.str.count(r"[.,;:!?]")
            digits = s.str.count(r"[0-9]")
            nt = n_tokens.where(n_tokens > 0)
            nc = n_chars.where(n_chars > 0)
            stop_ratio = (stop_hits / nt).fillna(0.0)
            mean_tok = (token_chars / nt).fillna(0.0)
            punct_ratio = (punct / nc).fillna(0.0)
            digit_ratio = (digits / nc).fillna(0.0)
            score_col = (
                stop_ratio * 0.5
                + mean_tok.clip(upper=10.0) / 20.0
                + (1.0 - punct_ratio)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": n_tokens,
                    "stopword_ratio": _round6(stop_ratio),
                    "mean_token_len": _round6(mean_tok),
                    "punct_ratio": _round6(punct_ratio),
                    "digit_ratio": _round6(digit_ratio),
                    "quality_score": _round6(score_col),
                }
            )

    return docs.mapInPandas(score, schema)
