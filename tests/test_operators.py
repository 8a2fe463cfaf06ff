"""Unit tests for the core operators: keep-latest dedup semantics
(tie-breaking, null ordering) and sequence keys — the semantic traps
called out in SURVEY.md §5/§7.4."""

import os

import pyspark.sql.functions as F
import pytest

from de_final_project_spark.operators.dedup import keep_latest
from de_final_project_spark.operators.surrogate import (
    add_sequence_key,
    add_sequence_key_distributed,
    zip_with_index_key,
)


def test_keep_latest_picks_max_order(spark):
    df = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "only", 5)], "k long, v string, ver long"
    )
    out = {r.k: r.v for r in keep_latest(df, "k", "ver").collect()}
    assert out == {1: "new", 2: "only"}


def test_keep_latest_tie_breaks_deterministically(spark):
    # Same version -> tie broken by remaining columns descending.
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 1)], "k long, v string, ver long"
    )
    out = keep_latest(df, "k", "ver").collect()
    assert len(out) == 1 and out[0].v == "b"


def test_keep_latest_nulls_lose(spark):
    # A NULL version must lose to any non-NULL version.
    df = spark.createDataFrame(
        [(1, "versioned", 7), (1, "unversioned", None)], "k long, v string, ver long"
    )
    assert keep_latest(df, "k", "ver").collect()[0].v == "versioned"


def test_keep_latest_multi_order_cols(spark):
    # Secondary order column (batch id) decides when primary ties — the
    # engine's replacement for pandas positional keep='last'.
    df = spark.createDataFrame(
        [(1, "batch1", 1, "2024-01-01"), (1, "batch2", 1, "2024-01-02")],
        "k long, v string, ver long, _batch_ts string",
    )
    assert keep_latest(df, "k", ["ver", "_batch_ts"]).collect()[0].v == "batch2"


def test_add_sequence_key_dense_ordered(spark):
    df = spark.createDataFrame([(30,), (10,), (20,)], "x long")
    out = add_sequence_key(df, "id", "x").orderBy("id").collect()
    assert [(r.id, r.x) for r in out] == [(1, 10), (2, 20), (3, 30)]
    assert out[0].__fields__[0] == "id"  # key is first column


def test_add_sequence_key_distributed_matches_single_window(spark):
    # 5000 rows with heavy duplication on the sort key: the distributed
    # range-partitioned ranking must produce the same (key, x) multiset
    # as the global-window version.
    df = spark.range(5000).select(
        (F.col("id") % 977).alias("x"), (F.col("id") % 7).alias("y")
    ).repartition(13)
    a = sorted(
        tuple(r) for r in add_sequence_key(df, "sk", ["x", "y"]).collect()
    )
    b = sorted(
        tuple(r)
        for r in add_sequence_key_distributed(df, "sk", ["x", "y"]).collect()
    )
    assert a == b
    assert [r[0] for r in b] == list(range(1, 5001))


def test_zip_with_index_key_dense_unique(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x long").repartition(7)
    out = zip_with_index_key(df, "id").collect()
    ids = sorted(r.id for r in out)
    assert ids == list(range(1, 101))
    assert {r.x for r in out} == set(range(100))


def test_keep_latest_is_distributed(spark):
    # 1000 rows, 10 keys, shuffled over partitions — result independent of
    # physical layout.
    df = (
        spark.range(1000)
        .select(
            (F.col("id") % 10).alias("k"),
            F.col("id").alias("ver"),
            (F.col("id") * 2).alias("v"),
        )
        .repartition(13)
    )
    out = {r.k: r.ver for r in keep_latest(df, "k", "ver").collect()}
    assert out == {k: 990 + k for k in range(10)}


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    from de_final_project_spark.operators.merge import merge_upsert

    path = str(tmp_path / "gold_t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, s string, v double"
    )
    merge_upsert(spark, path, base, ["id"])
    delta = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "id long, s string, v double"
    )
    merge_upsert(spark, path, delta, ["id"])
    got = {r["id"]: (r["s"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_partitioned_updates_inserts_and_prunes(spark, tmp_path):
    """Partitioned merge: same upsert semantics as merge_upsert, and the
    untouched partition's files are not rewritten (pruning is physical,
    not just logical)."""
    from de_final_project_spark.operators.merge import merge_upsert_partitioned

    path = str(tmp_path / "gold_p")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 1)],
        "id long, s string, pb int",
    )
    merge_upsert_partitioned(spark, path, base, ["id"], "pb")
    before = set(os.listdir(os.path.join(path, "pb=1")))
    delta = spark.createDataFrame(
        [(2, "B", 0), (5, "e", 0)], "id long, s string, pb int"
    )
    merge_upsert_partitioned(spark, path, delta, ["id"], "pb")
    got = {r["id"]: r["s"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d", 5: "e"}
    # pb=1 was untouched by the delta: identical file listing.
    assert set(os.listdir(os.path.join(path, "pb=1"))) == before
    assert not [
        d for d in os.listdir(str(tmp_path)) if "__staging" in d or "__old" in d
    ]


def test_merge_partitioned_crash_before_swap_preserves_table(spark, tmp_path):
    """Kill between staging write and swap: the live table must still
    read the OLD snapshot byte-for-byte; recover_merge then just
    garbage-collects the staging dir (VERDICT r5 item 5)."""
    from de_final_project_spark.operators.merge import (
        merge_upsert_partitioned,
        recover_merge,
    )

    path = str(tmp_path / "gold_c1")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "id long, s string, pb int"
    )
    merge_upsert_partitioned(spark, path, base, ["id"], "pb")

    class Crash(RuntimeError):
        pass

    def boom():
        raise Crash

    delta = spark.createDataFrame([(1, "A", 0)], "id long, s string, pb int")
    with pytest.raises(Crash):
        merge_upsert_partitioned(
            spark, path, delta, ["id"], "pb", _crash_after_stage=boom
        )
    got = {r["id"]: r["s"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b"}  # old snapshot intact
    recover_merge(path)
    assert {r["id"]: r["s"] for r in spark.read.parquet(path).collect()} == got
    assert not [
        d for d in os.listdir(str(tmp_path)) if "__staging" in d or "__old" in d
    ]
    # Re-running the merge after recovery completes normally.
    merge_upsert_partitioned(spark, path, delta, ["id"], "pb")
    assert {r["id"]: r["s"] for r in spark.read.parquet(path).collect()} == {
        1: "A",
        2: "b",
    }


def test_merge_partitioned_crash_mid_swap_recovers(spark, tmp_path):
    """Kill after the first partition swapped: every partition must read
    as fully-old or fully-new, and recover_merge restores any partition
    caught between its two renames."""
    from de_final_project_spark.operators.merge import (
        merge_upsert_partitioned,
        recover_merge,
    )

    path = str(tmp_path / "gold_c2")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 2)], "id long, s string, pb int"
    )
    merge_upsert_partitioned(spark, path, base, ["id"], "pb")

    class Crash(RuntimeError):
        pass

    def boom():
        raise Crash

    delta = spark.createDataFrame(
        [(1, "A", 0), (2, "B", 1)], "id long, s string, pb int"
    )
    with pytest.raises(Crash):
        merge_upsert_partitioned(
            spark, path, delta, ["id"], "pb", _crash_mid_swap=boom
        )
    recover_merge(path)
    got = {r["id"]: r["s"] for r in spark.read.parquet(path).collect()}
    # pb=0 swapped (new), pb=1 rolled back by recovery (old), pb=2 untouched.
    assert got == {1: "A", 2: "b", 3: "c"}
    assert not [
        d for d in os.listdir(str(tmp_path)) if "__staging" in d or "__old" in d
    ]


def test_read_csv_robust_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructType

    from de_final_project_spark.sources.readers import read_csv_robust

    p = tmp_path / "data.csv"
    p.write_text("id,name\n1,alice\nnot_a_number,bob\n3,carol\n")
    schema = (
        StructType().add("id", LongType(), True).add("name", StringType(), True)
    )
    clean, corrupt = read_csv_robust(spark, str(p), schema)
    assert sorted((r["id"], r["name"]) for r in clean.collect()) == [
        (1, "alice"),
        (3, "carol"),
    ]
    bad = corrupt.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0][0]


def test_merged_user_snapshot_delta_wins(spark):
    """One row per user; from_delta true exactly for users with any
    event in the delta half; every from_delta row's event_id is past
    the cut."""
    from de_final_project_spark.operators.merge import merged_user_snapshot
    from de_final_project_spark.sources.readers import read_testdata

    sf = "/root/testdata/sf0.001"
    snap = merged_user_snapshot(spark, sf).cache()
    ev = read_testdata(spark, sf, "events")
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    cut = (lo + hi) // 2
    assert snap.count() == ev.select("user_id").distinct().count()
    delta_users = {
        r.user_id
        for r in ev.where(F.col("event_id") > cut).select("user_id").distinct().collect()
    }
    for r in snap.collect():
        assert r.from_delta == (r.user_id in delta_users)
        if r.from_delta:
            assert r.event_id > cut
    snap.unpersist()


# ------------------------------------------------------ quantile sketch
def test_hq_sketch_merges_by_addition(spark):
    """Two shards sketched under the SAME boundaries merge by summing
    counts — map-side combine is the merge."""
    import pyspark.sql.functions as F

    from de_final_project_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 201)], "x double"
    )
    qmin = 1 * sk.HQ_SCALE
    span = 200 * sk.HQ_SCALE - qmin + 1
    whole = {
        r["bucket"]: r["cnt"]
        for r in sk.hq_counts(df, "x", qmin, span).collect()
    }
    a = sk.hq_counts(df.where("x <= 87"), "x", qmin, span).collect()
    b = sk.hq_counts(df.where("x > 87"), "x", qmin, span).collect()
    merged: dict = {}
    for r in list(a) + list(b):
        merged[r["bucket"]] = merged.get(r["bucket"], 0) + r["cnt"]
    assert merged == whole


def test_hq_quantile_estimates_within_one_bucket(spark):
    """Estimates are monotone in phi, land inside their bucket, and sit
    within one bucket width of the exact percentile."""
    from de_final_project_spark.operators import sketches as sk

    sf = "/root/testdata/sf0.001"
    rows = {r["phi"]: r for r in sk.value_quantile_sketch(spark, sf).collect()}
    assert set(rows) == set(sk.HQ_PHIS)
    from de_final_project_spark.sources.readers import read_testdata

    vals = sorted(
        r[0]
        for r in read_testdata(spark, sf, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    prev = None
    for phi in sorted(rows):
        r = rows[phi]
        assert r["bucket_lo"] <= r["est"] <= r["bucket_hi"]
        if prev is not None:
            assert r["est"] >= prev
        prev = r["est"]
        exact = vals[r["rank"] - 1]
        width = r["bucket_hi"] - r["bucket_lo"]
        assert abs(r["est"] - exact) <= width
