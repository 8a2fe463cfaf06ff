"""Pins for functions/pairs.py — the Arrow/NumPy pair scorers.

The r13 one-pass update scorer (pair_dots_update) must be BIT-equal to
the two pair_dots_between calls it replaced: the oracle compares
stringified doubles, so "close" is not a pass. Vectors are synthetic
doubles with enough digits that any reordering of the IEEE fold would
show.
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from de_final_project_spark.functions.pairs import (
    pair_dots_between,
    pair_dots_update,
    pair_dots_within,
)


def _vec_rows(seed: int, ids, n_clusters: int = 3, dim: int = 8):
    rng = random.Random(seed)
    return [
        (
            int(i),
            int(i) % n_clusters,
            [rng.uniform(-1.0, 1.0) for _ in range(dim)],
        )
        for i in ids
    ]


_SCHEMA = "vec_id long, cluster long, u array<double>"


def _pairs(df):
    return {
        (r["a_id"], r["b_id"]): r["_dot"]
        for r in df.select("a_id", "b_id", "_dot").collect()
    }


def test_pair_dots_update_equals_two_between_calls(spark):
    """One-pass update scorer == (stored∪new)×new ∪ new×stored, pair
    sets AND dot values bit-identical, b_new splits the directions."""
    stored = spark.createDataFrame(
        _vec_rows(1, [0, 2, 4, 6, 8, 10, 12]), _SCHEMA
    )
    # out-of-order arrivals: some new ids are SMALLER than stored ids,
    # so the reverse (flip) direction genuinely fires
    new = spark.createDataFrame(_vec_rows(2, [1, 3, 5, 7, 9, 11]), _SCHEMA)
    both = stored.unionByName(new)

    old_dir1 = _pairs(pair_dots_between(both, new, ["cluster"]))
    old_dir2 = _pairs(pair_dots_between(new, stored, ["cluster"]))
    assert not (set(old_dir1) & set(old_dir2))  # disjoint by design

    upd = pair_dots_update(stored, new, ["cluster"]).collect()
    got = {(r["a_id"], r["b_id"]): (r["_dot"], r["b_new"]) for r in upd}
    assert len(got) == len(upd)  # no duplicate pairs emitted

    want = {k: (v, True) for k, v in old_dir1.items()}
    want.update({k: (v, False) for k, v in old_dir2.items()})
    assert set(got) == set(want)
    for k, (dot, b_new) in want.items():
        gdot, gb = got[k]
        # bit-exact: the oracle hashes stringified doubles
        assert math.copysign(1, gdot) == math.copysign(1, dot) and gdot == dot, k
        assert gb == b_new, k


def test_pair_dots_update_empty_stored_side(spark):
    """A cluster with only NEW rows still judges its within-batch
    pairs (cogroup delivers an empty stored pdf)."""
    stored = spark.createDataFrame([], _SCHEMA)
    new = spark.createDataFrame(_vec_rows(3, [1, 2, 3, 4]), _SCHEMA)
    got = _pairs(pair_dots_update(stored, new, ["cluster"]))
    want = _pairs(pair_dots_within(new, ["cluster"]))
    assert got == want


def test_gram_both_orientation_matches_fold(spark):
    """both=True reverse dots equal the explicit reverse-call dots —
    IEEE multiply commutes, accumulation order unchanged."""
    import numpy as np

    from de_final_project_spark.functions.pairs import (
        _fold_dots,
        _gram_pairs,
    )

    rng = np.random.default_rng(7)
    S = rng.uniform(-1, 1, (5, 6))
    N = rng.uniform(-1, 1, (4, 6))
    ids_s = np.array([10, 1, 20, 3, 30])
    ids_n = np.array([2, 15, 4, 25])
    ia, jb, d, ra, rb, rd = _gram_pairs(S, N, ids_s, ids_n, 6, both=True)
    # forward: stored earlier — fold order A=S, B=N
    np.testing.assert_array_equal(d, _fold_dots(S, N, ia, jb, 6))
    # reverse: new earlier — the per-pair fold the old call used ran
    # A=new, B=stored; the shared Gram cell must equal it bit-for-bit
    np.testing.assert_array_equal(rd, _fold_dots(N, S, rb, ra, 6))


def test_mismatched_key_dtypes_do_not_split_groups(spark):
    """sf1 regression (r13): a cogroup does NOT coerce key types across
    sides — an int key (a partition column read back from hive dirs)
    vs a bigint key silently lands the same value in two disjoint
    groups and one side's pdf arrives empty. The scorers must align
    key dtypes before cogrouping."""
    from pyspark.sql import functions as F

    stored = spark.createDataFrame(
        _vec_rows(5, [0, 2, 4, 6, 8]), _SCHEMA
    ).withColumn("cluster", F.col("cluster").cast("int"))
    new = spark.createDataFrame(_vec_rows(6, [1, 3, 5, 7, 9]), _SCHEMA)
    both = stored.withColumn(
        "cluster", F.col("cluster").cast("long")
    ).unionByName(new)
    want1 = _pairs(pair_dots_between(both, new, ["cluster"]))
    want2 = _pairs(pair_dots_between(new, stored, ["cluster"]))
    got = {
        (r["a_id"], r["b_id"]): (r["_dot"], r["b_new"])
        for r in pair_dots_update(stored, new, ["cluster"]).collect()
    }
    want = {k: (v, True) for k, v in want1.items()}
    want.update({k: (v, False) for k, v in want2.items()})
    assert got == want and len(got) > 0
    # and the between-form itself must survive an int-vs-bigint pair
    got2 = _pairs(pair_dots_between(new, stored, ["cluster"]))
    assert got2 == want2
