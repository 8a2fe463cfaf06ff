"""Invariants for BPE merge training (the oracle twin pins exact
values; these pin the algorithm's shape)."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_final_project_spark.operators.bpe import BPE_MERGES, bpe_merges

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_merge_table_shape(spark):
    rows = bpe_merges(spark, SF_DIR).orderBy("step").collect()
    assert len(rows) == BPE_MERGES
    assert [r.step for r in rows] == list(range(1, BPE_MERGES + 1))
    for r in rows:
        assert r.merged_sym == r.left_sym + r.right_sym
        assert r.left_sym and r.right_sym
        assert r.pair_count > 0


def test_bpe_counts_non_increasing(spark):
    """Merging the max pair can only shrink or preserve every other
    pair's count, and pairs born of the merge inherit counts bounded by
    pre-merge pairs — so the selected max is non-increasing."""
    rows = bpe_merges(spark, SF_DIR).orderBy("step").collect()
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bpe_first_merge_is_true_max_pair(spark):
    """Step 1's pair equals a direct weighted adjacent-bigram count
    over the raw character sequences."""
    from de_final_project_spark.operators.neardup import _norm_tokens
    from de_final_project_spark.sources.readers import read_testdata

    docs = read_testdata(spark, SF_DIR, "documents")
    words = docs.select(
        F.explode(_norm_tokens(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    chars = F.split(F.col("word"), "")
    ex = words.select(
        chars.alias("c"),
        F.explode(F.sequence(F.lit(1), F.size(chars) - 1)).alias("i"),
    ).where(F.size("c") >= 2)
    best = (
        ex.select(
            F.element_at("c", F.col("i")).alias("l"),
            F.element_at("c", F.col("i") + 1).alias("r"),
        )
        .where((F.col("l") != "") & (F.col("r") != ""))
        .groupBy("l", "r")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
        .first()
    )
    got = bpe_merges(spark, SF_DIR).where(F.col("step") == 1).first()
    assert (got.left_sym, got.right_sym, got.pair_count) == (
        best.l,
        best.r,
        best.n,
    )


def test_bpe_empty_pair_guard(spark):
    """A corpus whose vocabulary is all single characters has NO adjacent
    pairs: bpe_merges must stop cleanly with fewer rows, matching the
    SQL twin (whose empty b-CTE empties later iterations), not raise
    IndexError (ADVICE r5)."""
    import de_final_project_spark.operators.bpe as bpe_mod

    one_char = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "a b")], "doc_id string, text string"
    )
    orig = bpe_mod.read_testdata
    bpe_mod.read_testdata = lambda s, sf, name: one_char
    try:
        rows = bpe_merges(spark, SF_DIR).collect()
    finally:
        bpe_mod.read_testdata = orig
    assert rows == []


# The merge rewrite's semantics on OVERLAPPING occurrences (e.g. the
# word "abab", seq ' a b a b ': the first ' a b ' consumes the shared
# delimiter space, so the second occurrence no longer matches) must be
# the SAME left-to-right non-overlapping scan in Spark, DuckDB, and
# Python's str.replace — that three-way agreement is what lets the
# iteration-exact generated-CTE oracle sign the merge loop. This
# property test pins it so a refactor (e.g. to regexp_replace, whose
# semantics differ) can't silently diverge (VERDICT r5 item 8).
@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map("".join),
)
def test_bpe_merge_replace_overlap_semantics(spark, word):
    seq = " " + " ".join(word) + " " if word else " "
    expected = seq.replace(" a b ", " ab ")
    got_spark = (
        spark.range(1)
        .select(F.replace(F.lit(seq), F.lit(" a b "), F.lit(" ab ")).alias("s"))
        .first()["s"]
    )
    got_duck = duckdb.execute(
        "SELECT replace(?, ' a b ', ' ab ')", [seq]
    ).fetchone()[0]
    assert got_spark == expected
    assert got_duck == expected


def test_bpe_tokenized_lengths_bounds(spark):
    """Per doc: BPE symbols never exceed characters, never undercut
    whitespace tokens (merges only fuse within words), and the ratio
    column restates the two sums."""
    from de_final_project_spark.operators.bpe import bpe_tokenized_lengths

    rep = bpe_tokenized_lengths(spark, SF_DIR).cache()
    assert rep.count() > 0
    bad = rep.where(
        (F.col("n_bpe_symbols") > F.col("n_chars"))
        | (F.col("n_bpe_symbols") < F.col("n_ws_tokens"))
        | (
            F.col("chars_per_symbol")
            != F.round(F.col("n_chars") / F.col("n_bpe_symbols"), 6)
        )
    )
    assert bad.count() == 0
    # Compression actually happened: corpus-wide symbols < chars.
    tot = rep.agg(F.sum("n_bpe_symbols"), F.sum("n_chars")).first()
    assert tot[0] < tot[1]
    rep.unpersist()
